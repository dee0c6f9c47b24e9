"""IO helpers: fixture-tolerant parquet reading, plus the two write-side
levers that matter at 100 TB — bucketing (shuffle-free co-located joins)
and partitioned layout (partition pruning at the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_table(spark: SparkSession, path: str, ts_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns (Spark has no
    nanos type): enable spark.sql.legacy.parquet.nanosAsLong, then
    truncate nanos-long columns back to microsecond timestamps — the
    same truncation DuckDB applies reading the identical file."""
    try:
        # proactive: avoids a failed-then-retried job when the footer has
        # nanos columns (PARQUET_TYPE_ILLEGAL); harmless for normal files
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf may be restricted; fall through
        pass
    df = spark.read.parquet(path)
    for c in ts_cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # the conf may have been pre-set, so detect nanos-long here
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def write_bucketed(df: DataFrame, table: str, bucket_col: str, n_buckets: int = 32, sort: bool = True) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Two tables bucketed the same way join WITHOUT an exchange — the
    pre-shuffle is paid once at write time and amortized over every
    later join/aggregate on that key. This is the 100 TB answer to
    repeated fact-fact joins; see tests/test_scale_io.py for the
    plan-level assertion (no Exchange on either side).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Persist a table hive-partitioned by low-cardinality columns so
    predicate-bearing scans prune whole directories (PartitionFilters in
    the scan node, zero IO for excluded partitions)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
