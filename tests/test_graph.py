"""Weighted PageRank: hand-checked values, mass conservation-ish
behavior, determinism across partitionings."""

from __future__ import annotations

from meteor_spark.operators.graph import pagerank


def _round_half_up(x: float, nd: int) -> float:
    """Spark/DuckDB round() is HALF_UP (away from zero); Python's
    built-in round is banker's — mirror the engines, not Python."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
        )
    )


def _py_pagerank(edges, d=0.85, iters=5):
    """Independent reference implementation mirroring the rounding."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    wout = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0.0) + w
    pr = {v: _round_half_up(1.0 / n, 8) for v in nodes}
    for _ in range(iters):
        s = {v: 0.0 for v in nodes}
        for u, v, w in edges:
            s[v] += pr[u] * (w / wout[u])
        pr = {v: _round_half_up((1 - d) / n + d * s[v], 8) for v in nodes}
    return {v: _round_half_up(p, 6) for v, p in pr.items()}


def test_pagerank_matches_reference_on_weighted_graph(spark):
    edges = [
        ("a", "b", 3.0), ("b", "a", 3.0),
        ("a", "c", 1.0), ("c", "a", 1.0),
        ("b", "c", 1.0), ("c", "b", 1.0),
        ("d", "a", 2.0), ("a", "d", 2.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r.node: r.pagerank for r in pagerank(df).collect()}
    assert got == _py_pagerank(edges)
    # a has the heaviest incoming mass -> top rank
    assert max(got, key=got.get) == "a"


def test_pagerank_symmetric_two_nodes(spark):
    df = spark.createDataFrame(
        [("x", "y", 5.0), ("y", "x", 5.0)], "src string, dst string, w double"
    )
    got = {r.node: r.pagerank for r in pagerank(df).collect()}
    assert got == {"x": 0.5, "y": 0.5}


def test_pagerank_partitioning_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 11}", float(1 + i % 4)) for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    a = sorted(map(tuple, pagerank(df).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(13)).collect()))
    assert a == b
