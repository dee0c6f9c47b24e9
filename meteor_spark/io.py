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


def zorder_value(cols: list, bits: int = 16) -> F.Column:
    """Z-order (Morton) curve value from numeric columns: each column is
    rank-normalized to `bits` bits by the caller (see write_zordered) and
    the bits are interleaved JVM-side — pure shifts/ors, no UDF."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def write_zordered(df: DataFrame, path: str, zorder_cols: list[str], bits: int = 16, n_files: int | None = None) -> None:
    """Persist a table clustered along a Z-order curve of the given
    columns — multi-dimensional data skipping without a table format.

    Each z-column is first rank-normalized to [0, 2^bits) with a
    percent_rank window (robust to arbitrary value distributions), the
    Morton interleave of the normalized values is computed JVM-side, and
    the frame is range-repartitioned + sorted by that value. Rows close
    in ALL z-dimensions land in the same parquet files, so per-file
    min/max stats tighten on every z-column at once: a scan filtering on
    ANY of the dimensions skips most files (parquet row-group stats do
    the skipping — no Delta/Iceberg needed, though the same layout slots
    under either). This is the write-side lever for 100 TB tables with
    two or three common filter columns where hive partitioning is too
    coarse (high-cardinality numerics) and single-column sorting only
    helps one predicate.
    """
    from pyspark.sql import Window

    scale = (1 << bits) - 1
    norm_cols = []
    tmp = df
    for c in zorder_cols:
        w = Window.orderBy(F.col(c))  # rank window: one pass per column at write time
        tmp = tmp.withColumn(f"__n_{c}", (F.percent_rank().over(w) * scale).cast("long"))
        norm_cols.append(F.col(f"__n_{c}"))
    tmp = tmp.withColumn("__z", zorder_value(norm_cols, bits))
    n = n_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        tmp.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__n_{c}" for c in zorder_cols])
        .write.mode("overwrite")
        .parquet(path)
    )
