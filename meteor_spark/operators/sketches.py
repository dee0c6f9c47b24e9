"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 3.5+ as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB pattern this enables: compute per-partition (e.g. per-day)
sketches ONCE, persist the few-KB binary sketches, and answer any
coarser rollup (weekly, monthly, all-time, any key subset) by merging
sketches — never rescanning the raw data. An exact count_distinct
cannot do this: distinct counts don't add, but HLL registers merge
losslessly (max per register), so union-of-daily equals
sketch-of-whole EXACTLY, not just approximately.

This extends the reference's approximate profile family
(APPROX_COUNT_DISTINCT, plugins/extractors/bigquery/bigquery.go:392)
with the re-aggregatable form a warehouse-scale catalog needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch of distinct `value_col` values:
    (keys..., sketch binary, n_rows). One map-side-combined groupBy; the
    shuffle carries (keys, 2^lg_k-register) partials, never values.
    These frames are the persistable incremental state."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def merge_distinct(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Roll partial sketches up to coarser keys:
    (keys..., approx_distinct, n_rows). Register-wise max merge — the
    result is identical to sketching the raw union, so rollups computed
    from persisted daily sketches are exactly as good as a full rescan."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
