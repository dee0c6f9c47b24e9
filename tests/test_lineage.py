"""Lineage graph: edge extraction + transitive closure."""

from __future__ import annotations

from meteor_spark.operators.lineage import edges, transitive_upstreams
from meteor_spark.sources.base import assets_df


def _asset(urn, ups=None, downs=None):
    def res(u):
        return {"urn": u, "name": u, "service": "s", "type": "table", "url": None, "description": None}

    return {
        "resource": res(urn),
        "asset_type": "Table",
        "lineage": {
            "upstreams": [res(u) for u in ups] if ups else None,
            "downstreams": [res(d) for d in downs] if downs else None,
        },
    }


def test_edges_from_facets(spark):
    assets = assets_df(
        spark,
        [
            _asset("c", ups=["a", "b"]),
            _asset("d", ups=["c"], downs=["e"]),
        ],
    )
    e = {(r["src_urn"], r["dst_urn"]) for r in edges(assets).collect()}
    assert e == {("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")}


def test_transitive_upstreams(spark):
    assets = assets_df(spark, [_asset("c", ups=["a", "b"]), _asset("d", ups=["c"])])
    closure = {
        (r["urn"], r["ancestor_urn"]): r["depth"]
        for r in transitive_upstreams(edges(assets)).collect()
    }
    assert closure[("c", "a")] == 1
    assert closure[("d", "c")] == 1
    assert closure[("d", "a")] == 2
    assert closure[("d", "b")] == 2
    assert ("c", "d") not in closure  # direction respected


def test_transitive_upstreams_cycle_safe(spark):
    from pyspark.sql import Row

    e = spark.createDataFrame([Row(src_urn="a", dst_urn="b"), Row(src_urn="b", dst_urn="a")])
    out = transitive_upstreams(e, max_depth=6).collect()
    # terminates; each node sees the other and itself (via the 2-cycle)
    pairs = {(r["urn"], r["ancestor_urn"]) for r in out}
    assert ("a", "b") in pairs and ("b", "a") in pairs
    assert len(out) <= 4


def test_transitive_upstreams_diamond_no_duplicates(spark):
    # regression: two equal-length paths (a->b->d, a->c->d) produced the
    # (d, a, 2) row twice — within-level dedup, not just prior-level
    # anti-join, is required or duplicates compound per path
    assets = assets_df(
        spark, [_asset("b", ups=["a"]), _asset("c", ups=["a"]), _asset("d", ups=["b", "c"])]
    )
    rows = transitive_upstreams(edges(assets)).collect()
    pairs = [(r["urn"], r["ancestor_urn"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # no duplicate closure rows
    assert (("d", "a")) in pairs
