"""IO helpers: fixture-tolerant parquet reading, plus the two write-side
levers that matter at 100 TB — bucketing (shuffle-free co-located joins)
and partitioned layout (partition pruning at the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# When True (always, outside plan tests), finish_and_release
# materializes operator results so per-call persisted intermediates can
# be unpersisted before returning. Plan tests flip it off to inspect
# the full physical plan of the lazy result.
EAGER_CACHE_RELEASE = True


def finish_and_release(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Materialize a SMALL result frame (localCheckpoint) and unpersist
    the persisted intermediates that fed it. Operators whose return
    value is lazy cannot unpersist a cache the caller's collect still
    needs — but a bare persist outlives the call and accumulates
    executor storage across long parity/bench sessions (r8 advisory).
    Eagerly checkpointing the result (always group/pair/report-sized at
    the call sites) releases the big cache at a bounded storage cost.
    """
    if not EAGER_CACHE_RELEASE:
        return result
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for c in caches:
            c.unpersist()


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


def list_data_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> list[tuple[str, int]]:
    """(path, bytes) for every data file under `path`, via the Hadoop
    FileSystem API — works on any supported filesystem (local/HDFS/S3),
    not just local paths."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(suffix):
            out.append((p, st.getLen()))
    return out


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
    shuffle: bool = False,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(total_bytes / target_bytes) files (the Delta OPTIMIZE /
    bin-packing story without a table format).

    The small-file problem IS a 100 TB problem: a streaming or
    per-partition writer leaves thousands of KB-sized files, and every
    downstream scan pays a task + open + footer read per file. One
    bounded rewrite amortizes that forever.

    `shuffle=False` (default) uses coalesce — no exchange, input files
    are bin-packed into output tasks; sizes are approximate but the
    rewrite moves no rows between executors. `shuffle=True` pays one
    round-robin exchange for evenly-sized output files.

    Returns (n_files_before, n_files_after).
    """
    import math

    files = list_data_files(spark, in_path)
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(in_path)
    df = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    df.write.mode("overwrite").parquet(out_path)
    return len(files), len(list_data_files(spark, out_path))


def zorder_value(cols: list, bits: int = 16) -> F.Column:
    """Z-order (Morton) curve value from numeric columns: each column is
    rank-normalized to `bits` bits by the caller (see write_zordered) and
    the bits are interleaved JVM-side — pure shifts/ors, no UDF."""
    if bits * len(cols) > 63:
        # bit position bits*cols-1 would reach the int64 sign bit (or
        # wrap: Java shift amounts are mod 64), silently breaking the
        # ordering for ~half the rows — refuse instead
        raise ValueError(
            f"zorder: {bits} bits x {len(cols)} cols exceeds the 63 usable "
            f"bits of a long; use bits <= {63 // len(cols)}"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def _bucket_search_expr(col_sql: str, bounds: list[float]) -> F.Column:
    """count(bounds <= col) as a BALANCED BINARY-SEARCH CASE tree —
    log2(n) codegen'd comparisons per row. The HOF fold this replaced
    (aggregate over a literal bounds array) runs the lambda INTERPRETED,
    one step per boundary per row: at 255 boundaries x 2 columns it was
    ~500 interpreted steps/row and dominated the whole z-order write
    (measured 36s vs ~3s for everything else at sf0.1). NULL input
    lands in bucket 0 (NULL comparisons fall through to the low branch),
    matching the old coalesce(fold, 0) contract.

    Built as ONE SQL string handed to F.expr, not as nested F.when
    Columns: the 2·n-node tree costs ~1000 py4j round-trips per column
    the Column way — measured 2.6-3.0s of pure DRIVER time per
    invocation at 255 bounds x 2 columns vs 0.3s for a single parsed
    string (same analyzed tree, bit-identical buckets). `col_sql` is
    the column as a SQL fragment; it is repeated once per CASE level,
    so keep it a simple cast/column reference."""
    def rec(lo: int, hi: int) -> str:
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        # col >= bounds[mid] -> answer in [mid+1, hi]
        return (
            f"(CASE WHEN {col_sql} >= {float(bounds[mid])!r} "
            f"THEN {rec(mid + 1, hi)} ELSE {rec(lo, mid)} END)"
        )

    return F.expr(rec(0, len(bounds)))


def write_zordered(df: DataFrame, path: str, zorder_cols: list[str], bits: int = 16, n_files: int | None = None) -> None:
    """Persist a table clustered along a Z-order curve of the given
    columns — multi-dimensional data skipping without a table format.

    Each z-column is first rank-normalized to [0, 2^bits_eff) by
    QUANTILE BUCKETING: one distributed approxQuantile pass per column
    yields 2^bits_eff - 1 boundaries, broadcast as a literal array; a
    row's bucket is the count of boundaries <= its value (a HOF fold —
    no shuffle, no window). The percent_rank window this replaced had no
    partitionBy, so the ENTIRE table funnelled through one task per
    column — unusable at the very scale this helper targets. Quantile
    buckets also align magnitudes across dimensions (every dim spans the
    full [0, 2^bits_eff) whatever its cardinality), which raw rank
    values would not. The Morton interleave of the bucket ids is
    computed JVM-side, and the frame is range-repartitioned + sorted by
    that value. Rows close in ALL z-dimensions land in the same parquet
    files, so per-file min/max stats tighten on every z-column at once:
    a scan filtering on ANY of the dimensions skips most files (parquet
    row-group stats do the skipping — no Delta/Iceberg needed, though
    the same layout slots under either). This is the write-side lever
    for 100 TB tables with two or three common filter columns where
    hive partitioning is too coarse (high-cardinality numerics) and
    single-column sorting only helps one predicate.

    bits is capped so the interleave fits in 63 bits AND at 8 per
    dimension (256 quantile buckets per column — file-level skipping
    resolution; finer buckets only inflate the per-row boundary fold).
    """
    (
        zordered_frame(df, zorder_cols, bits=bits, n_files=n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def zordered_frame(
    df: DataFrame, zorder_cols: list[str], bits: int = 16, n_files: int | None = None
) -> DataFrame:
    """The distributed plan behind write_zordered, exposed so tests can
    pin its physical shape (no single-partition Exchange, no Window —
    the exact failure mode the quantile-bucket normalization replaced).
    Returns the range-repartitioned, z-sorted frame ready to write."""
    bits = min(bits, 63 // len(zorder_cols), 8)
    n_bounds = (1 << bits) - 1
    probs = [i / (1 << bits) for i in range(1, n_bounds + 1)]
    # every column's boundaries in ONE pass (the multi-column
    # approxQuantile overload) — per-column calls would issue one extra
    # full-table scan per z-dimension at the 100 TB scale this targets
    all_bounds = df.select(
        *[F.col(c).cast("double").alias(f"__v_{i}") for i, c in enumerate(zorder_cols)]
    ).approxQuantile([f"__v_{i}" for i in range(len(zorder_cols))], probs, 0.001)
    tmp = df
    for c, bounds in zip(zorder_cols, all_bounds):
        bucket = _bucket_search_expr(f"CAST(`{c}` AS DOUBLE)", bounds)
        tmp = tmp.withColumn(f"__n_{c}", bucket.cast("long"))
    tmp = tmp.withColumn(
        "__z", zorder_value([F.col(f"__n_{c}") for c in zorder_cols], bits)
    )
    n = n_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    return (
        tmp.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__n_{c}" for c in zorder_cols])
    )
