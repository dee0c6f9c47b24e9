"""Deterministic sampling, equi-width histogram, bucketed time-range join."""

import datetime

from pyspark.sql import functions as F

from meteor_spark.operators.profile import histogram
from meteor_spark.operators.rangejoin import time_range_join
from meteor_spark.operators.sampling import deterministic_sample, stratified_sample


def test_deterministic_sample_stable_and_proportional(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s1 = sorted(r.k for r in deterministic_sample(df, "k", 0.25).collect())
    s2 = sorted(r.k for r in deterministic_sample(df, "k", 0.25).collect())
    assert s1 == s2  # same rows, not just same count
    assert 0.18 < len(s1) / 2000 < 0.32


def test_deterministic_sample_is_nested(spark):
    # consistent hashing: a 10% sample is a subset of the 30% sample
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    small = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    big = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    assert small <= big


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = stratified_sample(df, "k", "lang", {"en": 1.0, "fr": 0.0}).collect()
    assert {r.lang for r in out} == {"en"}
    assert len(out) == 1000


def test_histogram_bins_cover_all_rows(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    h = {r.bin: r for r in histogram(df, "x", bins=10).collect()}
    assert sum(r.n for r in h.values()) == 100
    assert h[0].n == 10 and h[9].n == 10  # max value folded into last bin
    assert abs(h[0].bin_lo - 0.0) < 1e-9 and abs(h[9].bin_hi - 99.0) < 1e-9


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_time_range_join_window_edges(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], ["lid", "l_ts"])
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00")),  # exactly lower edge -> included
            (11, _ts("2024-01-01 09:30:00")),  # inside
            (12, _ts("2024-01-01 10:00:00")),  # upper edge -> excluded (half-open)
            (13, _ts("2024-01-01 08:59:59")),  # before window
        ],
        ["rid", "r_ts"],
    )
    out = sorted(r.rid for r in time_range_join(left, right, "l_ts", "r_ts", -3600, 0).collect())
    assert out == [10, 11]


def test_time_range_join_respects_keys_and_subseconds(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00.500000"), "u1")], ["lid", "l_ts", "user"])
    right = spark.createDataFrame(
        [
            (20, _ts("2024-01-01 10:00:00.499999"), "u1"),  # in window (by 1 microsecond)
            (21, _ts("2024-01-01 10:00:00.500000"), "u1"),  # at upper edge -> excluded
            (22, _ts("2024-01-01 10:00:00.100000"), "u2"),  # wrong key
        ],
        ["rid", "r_ts", "user"],
    )
    out = [r.rid for r in time_range_join(left, right, "l_ts", "r_ts", -3600, 0, keys=["user"]).collect()]
    assert out == [20]


def test_time_range_join_plan_is_equi_join(spark):
    # the point of the bucketing: no BroadcastNestedLoopJoin in the plan
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], ["lid", "l_ts"])
    right = spark.createDataFrame([(10, _ts("2024-01-01 09:30:00"))], ["rid", "r_ts"])
    plan = time_range_join(left, right, "l_ts", "r_ts", -3600, 0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
