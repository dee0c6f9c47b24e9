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


def test_triangle_counts_known_graph(spark):
    from meteor_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus pendant 5-1
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b] + [(5, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_direction_and_dup_invariant(spark):
    from meteor_spark.operators.graph import triangle_counts

    tri = [(1, 2), (2, 3), (3, 1)]
    fwd = spark.createDataFrame(tri, "src int, dst int")
    # reversed + duplicated edges must not change the count
    noisy = spark.createDataFrame(tri + [(b, a) for a, b in tri] + tri, "src int, dst int")
    assert (
        sorted(map(tuple, triangle_counts(fwd).collect()))
        == sorted(map(tuple, triangle_counts(noisy).collect()))
        == [(1, 1), (2, 1), (3, 1)]
    )
