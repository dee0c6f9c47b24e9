"""As-of join + salted aggregation operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from meteor_spark.operators.asof import asof_join
from meteor_spark.operators.skew import salted_agg


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00")), (2, "u1", _ts("2024-01-01T12:00")),
         (3, "u2", _ts("2024-01-01T09:00"))],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:30"), 100.0), ("u1", _ts("2024-01-01T11:00"), 200.0),
         ("u2", _ts("2024-01-01T09:30"), 300.0)],
        "user string, ts timestamp, price double",
    )
    out = {r["id"]: r["price_asof"] for r in
           asof_join(left, right, ts_col="ts", by_col="user", value_cols=["price"]).collect()}
    assert out[1] == 100.0   # 09:30 is latest <= 10:00
    assert out[2] == 200.0   # 11:00 is latest <= 12:00
    assert out[3] is None    # no right row at or before 09:00


def test_asof_join_exact_tie(spark):
    # a right row at exactly left.ts must match (<= semantics)
    left = spark.createDataFrame([(1, "u", _ts("2024-01-01T10:00"))], "id long, user string, ts timestamp")
    right = spark.createDataFrame([("u", _ts("2024-01-01T10:00"), 7.0)], "user string, ts timestamp, v double")
    row = asof_join(left, right, "ts", "user", ["v"]).first()
    assert row["v_asof"] == 7.0


def test_salted_agg_equals_plain(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r["o_orderstatus"]: (r["n"], round(r["s"], 2))
        for r in e.groupBy("o_orderstatus").agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s")).collect()
    }
    salted = salted_agg(
        e,
        keys=["o_orderstatus"],
        aggs={"n": ("sum", F.count("*")), "s": ("sum", F.sum("o_totalprice"))},
        salt_on="o_orderkey",
        salt_buckets=8,
    )
    got = {r["o_orderstatus"]: (r["n"], round(r["s"], 2)) for r in salted.collect()}
    assert got == plain


def test_salted_agg_spreads_hot_key(spark):
    # a single hot key lands in multiple salt buckets in phase 1
    df = spark.range(1000).select(F.lit("hot").alias("k"), F.col("id"))
    salted = df.withColumn("__salt", F.pmod(F.xxhash64("id"), F.lit(8)))
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8


def test_asof_right_ties_pick_largest_value_deterministically(spark):
    # regression: right rows sharing (by, ts) had no tertiary sort key,
    # so the attached value depended on partition order
    from meteor_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    for parts in (1, 7):
        right = spark.createDataFrame(
            [(1, 10, "v1"), (1, 10, "v9"), (1, 10, "v5")], "k int, ts int, val string"
        ).repartition(parts)
        out = asof_join(left, right, "ts", "k", ["val"]).collect()
        assert out[0]["val_asof"] == "v9"  # largest value struct wins, any partitioning
