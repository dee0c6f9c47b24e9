"""Physical-layout optimization: Z-order (Morton) clustering and its
measurable data-skipping payoff.

At 100 TB the scan you AVOID is the cheapest scan there is: columnar
readers skip a file (or row group) whenever its min/max footer range
misses the predicate. Sorting by one key gives perfect skipping on that
key and none on any other; interleaving the BITS of two keys (the
Z-order / Morton curve) makes file ranges tight on BOTH dimensions at
once, so two-dimensional box predicates prune most files. Delta's
OPTIMIZE ZORDER BY and Iceberg's sort orders are this exact move; here
it is expressed engine-agnostically: the z-value is pure integer
arithmetic (an unrolled interleave of div/mod bits — no bit builtins,
so Spark SQL and DuckDB evaluate it identically), the "files" are
ntile() chunks of the sorted order, and the skipping report counts how
many chunk min/max boxes a query rectangle intersects under each
layout. Write-side cost at scale: ONE range-partitioned sort
(repartitionByRange on z + sortWithinPartitions), the same shuffle a
single-key sort-write already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def z_value_expr(x: str, y: str, bits: int = 10, div: str = "div") -> str:
    """Engine-portable Morton interleave of the low `bits` of two
    non-negative integer expressions: bit i of x lands at position 2i,
    bit i of y at 2i+1. Pure div/mod/multiply arithmetic — no engine
    bit builtins; `div` is the integer-division token ("div" Spark,
    "//" DuckDB — operands are non-negative so truncate == floor and
    the engines agree, the ppm_expr convention). Everything stays far
    inside int64 (2*bits <= 62).

    CALLER CONTRACT: inputs must already lie in [0, 2^bits) — values
    past that silently WRAP (the % drops high bits), scrambling the
    interleave order. Rank-normalize first (zorder_skipping_report's
    ntile buckets, write_zordered's quantile buckets) rather than
    raising bits: normalized dimensions also span comparable magnitudes,
    which raw keys of different cardinalities never do."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) % {1 << (i + 1)}) {div} {1 << i}) * {1 << (2 * i)}")
        terms.append(f"((({y}) % {1 << (i + 1)}) {div} {1 << i}) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def write_zorder_files(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    order_col: str,
    n_files: int = 16,
    bits: int = 15,
    zorder: bool = True,
) -> None:
    """Materialize the zorder_skipping_report chunking as REAL parquet
    files: the same exact ntile rank-normalization + Morton interleave
    (or the single-key order when zorder=False), chunked into `n_files`
    by ntile over the sort order, written one file per chunk
    (partitionBy on the chunk id after repartitioning by it — each
    chunk's rows land in exactly one task, so exactly one file). The
    written files carry REAL footer min/max stats, which is what
    zorder_footer_skipping certifies against the synthetic report's
    pruning rule. Exact ntile (not write_zordered's approxQuantile
    buckets) so the layout is bit-deterministic for the oracle."""
    from pyspark.sql import Window

    base = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.col(order_col).cast("long").alias("k"),
    )
    if zorder:
        nb = 1 << bits
        wx = Window.orderBy(F.col("x"), F.col("k"))
        wy = Window.orderBy(F.col("y"), F.col("k"))
        base = (
            base.withColumn("xb", (F.ntile(nb).over(wx) - 1).cast("long"))
            .withColumn("yb", (F.ntile(nb).over(wy) - 1).cast("long"))
            .withColumn("z", F.expr(z_value_expr("xb", "yb", bits)).cast("long"))
        )
        w = Window.orderBy(F.col("z"), F.col("k"))
    else:
        w = Window.orderBy(F.col("k"))
    (
        base.withColumn("file_id", F.ntile(n_files).over(w))
        .select("x", "y", "k", "file_id")
        .repartition(n_files, "file_id")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .parquet(path)
    )


def footer_box_hits(
    spark,
    path: str,
    box: tuple[int, int, int, int],
    glob_pattern: str = "file_id=*/part-*.parquet",
) -> tuple[int, int]:
    """(n_files, n_read) under min/max footer pruning for a box
    predicate, from the REAL parquet footers of a write_zorder_files
    layout — pyarrow metadata only, zero data pages (the independent
    twin of the oracle's duckdb parquet_metadata() read). Driver-side
    loop: one footer (KB) per file, n_files bounded."""
    import glob as _glob

    import pyarrow.parquet as pq

    x_lo, x_hi, y_lo, y_hi = box
    n_files = n_read = 0
    for f in sorted(_glob.glob(f"{path}/{glob_pattern}")):
        md = pq.read_metadata(f)
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        stats_rgs: dict[str, int] = {"x": 0, "y": 0}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if col.path_in_schema in ("x", "y") and st is not None and st.has_min_max:
                    name = col.path_in_schema
                    stats_rgs[name] += 1
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
        n_files += 1
        if md.num_row_groups == 0 or any(
            stats_rgs[c] < md.num_row_groups for c in ("x", "y")
        ):
            # A zero-row-group file has no stats to prune on (mins/maxs
            # empty) — count it as read rather than index empty dicts.
            # min/max pruning rule: a file can only be skipped when
            # EVERY row group carries stats on both predicate columns —
            # a partially-statted file's aggregated min/max says nothing
            # about the statless row group, so it counts as read (the
            # r10 advice: the old file-level `c in mins` check wrongly
            # skipped mixed files). Stats can be absent when a writer
            # disables them or a column is all-null.
            n_read += 1
        elif (
            maxs["x"] >= x_lo
            and mins["x"] <= x_hi
            and maxs["y"] >= y_lo
            and mins["y"] <= y_hi
        ):
            n_read += 1
    return n_files, n_read


def zorder_skipping_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: str,
    box: tuple[int, int, int, int],
    n_chunks: int = 16,
    bits: int = 10,
) -> DataFrame:
    """Data-skipping effectiveness of Z-order vs single-key layout.

    Chunks the table into `n_chunks` equal "files" two ways — sorted by
    the Morton z-value of (x, y), and sorted by the natural single key
    `order_col` — records each chunk's (min, max) footer range per
    dimension, and counts how many chunks a box predicate
    [x_lo..x_hi] x [y_lo..y_hi] would have to read under each layout
    (a chunk is read iff its ranges INTERSECT the box — exactly the
    min/max pruning rule of parquet/ORC readers).

    Returns one row per layout: (layout, n_chunks, n_read, read_ppm).
    All-integer; ntile ties are broken by a total ordering key so the
    chunking is deterministic on any engine.

    Each dimension is RANK-NORMALIZED into 2^bits equal-frequency
    buckets (ntile, ties broken by the total key) before interleaving:
    z_value_expr wraps silently past 2^bits, so raw keys above that
    (l_partkey reaches ~2e6 on the 100x fixtures) would interleave
    scrambled high bits and quietly destroy the x-clustering the report
    claims to measure. Normalized buckets also give both dimensions
    equal weight in the curve whatever their raw cardinality — the
    same move write_zordered makes with quantile buckets, expressed
    here with exact ntile so DuckDB reproduces it bit-for-bit. The
    min/max footer ranges and the box test stay in ORIGINAL
    coordinates; only the sort key is normalized.

    Scale: four global sorts of (x, y, key) projections (two ntile
    ranks + two layout orderings) — at write time this is the
    range-partitioned-sort class of work a sorted layout costs anyway;
    the report itself aggregates chunk-count-sized rows."""
    from pyspark.sql import Window

    from meteor_spark.functions.exactmath import ppm_expr

    x_lo, x_hi, y_lo, y_hi = box
    nb = 1 << bits
    wx = Window.orderBy(F.col("x"), F.col("k"))
    wy = Window.orderBy(F.col("y"), F.col("k"))
    base = (
        df.select(
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
            F.col(order_col).cast("long").alias("k"),
        )
        .withColumn("xb", (F.ntile(nb).over(wx) - 1).cast("long"))
        .withColumn("yb", (F.ntile(nb).over(wy) - 1).cast("long"))
        .withColumn("z", F.expr(z_value_expr("xb", "yb", bits)).cast("long"))
    )

    def chunks(order_cols: list, layout: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        return (
            base.withColumn("__chunk", F.ntile(n_chunks).over(w))
            .groupBy("__chunk")
            .agg(
                F.min("x").alias("x_min"),
                F.max("x").alias("x_max"),
                F.min("y").alias("y_min"),
                F.max("y").alias("y_max"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "__chunk",
                "x_min",
                "x_max",
                "y_min",
                "y_max",
            )
        )

    both = chunks([F.col("z"), F.col("k")], "zorder").unionByName(
        chunks([F.col("k")], "rowkey")
    )
    hit = (
        (F.col("x_max") >= F.lit(x_lo))
        & (F.col("x_min") <= F.lit(x_hi))
        & (F.col("y_max") >= F.lit(y_lo))
        & (F.col("y_min") <= F.lit(y_hi))
    )
    agg = both.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_read"),
    )
    return agg.select(
        "layout",
        "n_chunks",
        "n_read",
        F.expr(ppm_expr("n_read", "n_chunks", "div")).cast("long").alias("read_ppm"),
    )
