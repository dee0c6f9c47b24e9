"""Bucketed time-range join.

Beyond-reference operator (BASELINE.json north star): joins of the form
"right rows whose timestamp falls in [left.ts + lower, left.ts + upper)"
(attribution windows, sensor alignment, sessions-to-events).

Naive Spark turns a pure range predicate into BroadcastNestedLoopJoin
(O(|L|x|R|)) and a range-plus-equi predicate into a sort-merge join that
still scans every right row per key. The scalable formulation buckets
time into `bucket_seconds` cells: the right side gets one bucket key,
the left side explodes into the (few) buckets its window overlaps, and
the join becomes an EQUI-join on (keys..., bucket) followed by the exact
range filter. Shuffle volume is |L| * ceil(window/bucket) + |R|, and the
bucket key spreads hot time ranges across the cluster.

Pick bucket_seconds ≈ the window length: the left side then explodes
into at most 2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.functions import unix_us


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    keys: list[str] | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Inner join: right.ts in [left.ts + lower, left.ts + upper).

    Columns from both sides survive (right's join-key columns are
    dropped as duplicates). `keys` are additional equi-join columns.
    """
    window = upper_seconds - lower_seconds
    if bucket_seconds is None:
        bucket_seconds = max(window, 1)
    keys = keys or []

    # microsecond precision: unix_timestamp() truncates to seconds, which
    # silently moves the window edges for sub-second timestamps
    lo_us, up_us, bucket_us = lower_seconds * 1_000_000, upper_seconds * 1_000_000, bucket_seconds * 1_000_000
    l_unix = unix_us(left_ts)
    r_unix = unix_us(right_ts)

    lo_bucket = F.floor((l_unix + lo_us) / bucket_us)
    hi_bucket = F.floor((l_unix + up_us) / bucket_us)
    l = left.withColumn("__bucket", F.explode(F.sequence(lo_bucket, hi_bucket)))
    r = right.withColumn("__bucket", F.floor(r_unix / bucket_us))

    cond = [l["__bucket"] == r["__bucket"]] + [l[k] == r[k] for k in keys]
    joined = l.join(r, cond).drop(r["__bucket"])
    for k in keys:
        joined = joined.drop(r[k])
    # SIDE-QUALIFIED refs, not name re-resolution: when both sides call
    # their event-time column the same thing (both 'ts' — the common
    # case for sensor alignment), an unqualified F.col would be
    # AMBIGUOUS after the join
    lj, rj = unix_us(l[left_ts]), unix_us(r[right_ts])
    return joined.filter((rj >= lj + lo_us) & (rj < lj + up_us)).drop("__bucket")
