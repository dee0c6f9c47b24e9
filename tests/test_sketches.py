"""Mergeable HLL distinct sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteor_spark.io import read_parquet_table
from meteor_spark.operators import sketches


def test_merge_of_daily_equals_sketch_of_whole(spark, sf_dir):
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    daily = sketches.distinct_sketches(
        events.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.merge_distinct(daily, ["event_type"]).collect()
    }
    whole = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.merge_distinct(
            sketches.distinct_sketches(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    # HLL merge is register-wise max: union-of-daily == sketch-of-whole, exactly
    assert merged == whole


def test_estimate_close_to_exact(spark, sf_dir):
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    est = sketches.merge_distinct(
        sketches.distinct_sketches(events, ["event_type"], "user_id"), ["event_type"]
    )
    exact = events.groupBy("event_type").agg(F.count_distinct("user_id").alias("exact"))
    for r in est.join(exact, "event_type").collect():
        assert abs(r["approx_distinct"] - r["exact"]) / r["exact"] < 0.05


def test_estimate_is_partitioning_invariant(spark, sf_dir):
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    a = sketches.merge_distinct(
        sketches.distinct_sketches(events, ["event_type"], "user_id"), ["event_type"]
    ).collect()
    b = sketches.merge_distinct(
        sketches.distinct_sketches(events.repartition(17), ["event_type"], "user_id"),
        ["event_type"],
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
