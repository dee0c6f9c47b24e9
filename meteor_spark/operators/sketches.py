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


def hll64_partials(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 10
) -> DataFrame:
    """ENGINE-PORTABLE HLL partials: (keys..., reg, rho, n_rows-ish via
    caller) — the replayable twin of distinct_sketches, whose
    Datasketches registers are opaque to any other engine.

    Hash family: md5(value) split into two 32-bit halves (the same
    one-md5 discipline as the minhash family). register = h1 mod m,
    rho = leading-zero count of the 32-bit h2 plus one, computed as
    33 − bit_length(h2) via the length of bin(h2) — INTEGER string
    arithmetic, no float log2 whose boundary ulps could differ across
    engines. The (keys, reg) → max(rho) frame is the whole sketch
    state: ≤ m rows per key, merges losslessly by max, and any engine
    that can md5 rebuilds it bit-for-bit (the DuckDB oracle does).

    One map-side-combined groupBy; the shuffle carries register
    partials, never values — the same 100 TB rollup-without-rescan
    contract as the built-in sketch path."""
    if not 4 <= lg_k <= 12:
        # > 12 overflows the int64 harmonic sum in merge_hll64 (the
        # empty-register term (m - v)·2^50 passes 2^63); fail fast
        # instead of letting Spark's non-ANSI sum wrap negative
        raise ValueError(f"lg_k must be in [4, 12], got {lg_k}")
    m = 1 << lg_k
    h = F.md5(F.col(value_col).cast("string"))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rho = F.when(h2 == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(h2)))
    return df.groupBy(*keys, (h1 % m).alias("reg")).agg(
        F.max(rho).cast("int").alias("rho"), F.count("*").alias("n_rows")
    )


def merge_hll64(
    partials: DataFrame, keys: list[str], lg_k: int = 10, flag_col: str | None = None
) -> DataFrame:
    """Roll portable-HLL partials up to coarser keys and read off the
    estimate: (keys..., approx_distinct, n_rows).

    The harmonic sum is EXACT integer arithmetic: registers carry
    2^(50 − rho) (rho ≤ 33, so no overflow at any m ≤ 2^12), absent
    registers contribute 2^50 each, and the raw estimate is one
    multiply + one divide of exactly-representable doubles — the PSI
    lesson applied to HLL. Small-range branch (raw ≤ 2.5m with empty
    registers) switches to linear counting m·ln(m/V), the standard HLL
    correction; its single ln of a small rational rounded to 4 decimals
    is engine-stable in a way the PSI sum-of-logs was not (one value,
    not a sum, nowhere near rounding boundaries — parity-gated to keep
    that true). Large-range correction is omitted: it matters only past
    2^32/30 ≈ 1.4e8 distinct, where a 64-bit-hash redesign (lg_k and
    the full h2 width) is the real fix."""
    if not 4 <= lg_k <= 12:
        raise ValueError(f"lg_k must be in [4, 12], got {lg_k}")
    m = 1 << lg_k
    alpha = 0.7213 / (1 + 1.079 / m)
    # flag_col: optional boolean rider max-merged alongside the
    # registers (sliding_hll64 marks each window's OWN period with it —
    # keeps "observed window" a by-product of the merge instead of a
    # self-join, which also trips Spark's memory-sink self-join
    # resolution on streaming state readouts)
    agg1 = [F.max("rho").alias("rho"), F.sum("n_rows").alias("nr")]
    if flag_col:
        agg1.append(F.max(flag_col).alias(flag_col))
    merged = partials.groupBy(*keys, "reg").agg(*agg1)
    # count("rho"), not count("*"): NULL values hash to a NULL register
    # (md5(NULL) is NULL) whose rho is NULL — count_distinct semantics
    # ignore NULLs, so that row must not occupy a register slot (it
    # still counts toward n_rows). sum() skips the NULL rho on its own.
    per_key = merged.groupBy(*keys).agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - rho)"))
            + (F.lit(m) - F.count("rho")) * F.shiftleft(F.lit(1).cast("long"), 50)
        ).alias("s"),
        (F.lit(m) - F.count("rho")).alias("v"),
        F.sum("nr").alias("n_rows"),
        *([F.max(flag_col).alias(flag_col)] if flag_col else []),
    )
    raw = F.lit(alpha * m * m * float(1 << 50)) / F.col("s")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v"))
    est = F.round(F.when((raw <= 2.5 * m) & (F.col("v") > 0), lc).otherwise(raw), 4)
    out_cols = [*keys, est.alias("approx_distinct"), F.col("n_rows")]
    if flag_col:
        out_cols.append(F.col(flag_col))
    return per_key.select(*out_cols)


def quantile_bin_partials(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Mergeable QUANTILE sketch partials: fixed-bin counts per key over
    a fixed [lo, hi] domain — the quantile sibling of distinct_sketches.
    Integer bin counts merge by plain sum (associative, EXACT — unlike
    approx_percentile's opaque internal state, which Spark doesn't
    expose for re-aggregation), so per-day partials persisted once
    answer any coarser-key quantile later without rescanning raw data.
    One map-side-combined groupBy; the shuffle carries (keys, bin)
    partial counts, never values."""
    w = (hi - lo) / bins
    bin_col = F.greatest(
        F.least(F.floor((F.col(value_col) - lo) / w).cast("int"), F.lit(bins - 1)),
        F.lit(0),
    )
    # NULLs are not observations: least(NULL, bins-1) skips the null
    # and would count every NULL row as a top-bin value, inflating
    # p95/p99; cnt therefore counts NON-NULL observations
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bin_col.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def merge_quantile_bins(
    partials: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    bins: int = 64,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    round_to: int = 4,
) -> DataFrame:
    """Roll quantile-sketch partials up to coarser keys and read off
    quantile estimates: q-th estimate = lower edge of the first bin
    whose cumulative count reaches q·total (deterministic integer
    logic — no interpolation, identical on any engine; error bounded
    by one bin width). Merge is one sum-groupBy + one per-key window
    over ≤ `bins` rows."""
    from pyspark.sql import Window

    w = (hi - lo) / bins
    merged = partials.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))
    win = Window.partitionBy(*keys).orderBy("bin")
    cum = merged.select(
        *keys,
        "bin",
        "cnt",
        F.sum("cnt").over(win).alias("c"),
        F.sum("cnt").over(Window.partitionBy(*keys)).alias("total"),
    )
    aggs = [F.max("total").cast("long").alias("n_rows")]
    for q in quantiles:
        b = F.min(F.when(F.col("c") >= q * F.col("total"), F.col("bin")))
        aggs.append(
            F.round(F.lit(lo) + b * w, round_to).alias(f"p{int(q * 100)}")
        )
    return cum.groupBy(*keys).agg(*aggs)


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries: ≤ k (key,
    lower-bound-count) rows per partition, merged by key-sum.

    The bounded-memory half of the classic two-pass exact heavy-hitter
    pattern: MG with k counters retains every item whose LOCAL frequency
    exceeds n_p/(k+1), and by pigeonhole any item with GLOBAL frequency
    > N/k exceeds n_p/(k+1) in at least one partition — so the union of
    per-partition candidate sets is a guaranteed superset of the true
    heavy hitters, at O(k) memory per partition no matter how large the
    key domain is. (Summed MG counters are lower bounds, not exact
    counts; heavy_hitters_exact adds the verification scan.)

    Arrow-batched mapInPandas; the dict state persists across batches of
    one partition, so each partition emits one summary regardless of
    batch count. The shuffle that follows carries ≤ k·partitions rows.
    """
    import pandas as pd

    schema = df.select(key_col).schema
    out_schema = f"{key_col} {schema[key_col].dataType.simpleString()}, mg_count long"

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for key in pdf[key_col]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame(
            {key_col: list(counters), "mg_count": list(counters.values())}
        )

    partials = df.select(key_col).mapInPandas(mg, out_schema)
    return partials.groupBy(key_col).agg(F.sum("mg_count").alias("mg_count"))


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int, out_count: str = "n_occurrences"
) -> DataFrame:
    """EXACT keys with frequency > N/k via MG candidates + verification.

    Pass 1 (misra_gries_candidates) shrinks the unbounded key domain to
    ≤ k·partitions candidates without a full-domain shuffle; pass 2
    broadcast-semi-joins the candidates back and counts them exactly,
    so the output is precisely `SELECT key HAVING count(*) > N/k` — the
    sketch bounds memory, the verify pass removes its error. The only
    groupBy over raw keys is restricted to candidate rows.
    """
    cands = misra_gries_candidates(df, key_col, k).select(key_col)
    total = df.groupBy().agg(F.count("*").alias("__total"))
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias(out_count))
        .crossJoin(F.broadcast(total))
        .filter(F.col(out_count) > F.col("__total") / k)
        .drop("__total")
    )


def count_min_partials(
    df: DataFrame, keys: list[str], item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Mergeable COUNT-MIN sketch partials: per key group, a d×w grid of
    cell counts — the frequency sibling of distinct_sketches. Every row
    increments one column per hash row (column = md5(item|r) bucket, the
    same engine-portable md5 family as sampling.hash_bucket), so integer
    cell counts merge by plain sum and per-day partials persisted once
    answer any coarser-key frequency estimate later without rescanning
    raw data. The grid is d*w cells per key group regardless of item
    cardinality — heavy-hitter queries over unbounded key domains at a
    fixed memory budget.

    One explode(depth) + map-side-combined groupBy; the shuffle carries
    (keys, r, c) partial counts, never items.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat_ws("|", F.col(item_col), F.lit(str(r)))), 1, 8
                            ),
                            16,
                            10,
                        ).cast("long")
                        % width
                    ).alias("c"),
                )
                for r in range(depth)
            ]
        )
    )
    return (
        df.select(*keys, cells.alias("rc"))
        .groupBy(*keys, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    partials: DataFrame, items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-frequency estimates from merged count-min partials: for each
    candidate item, min over hash rows of its cell count (the classic
    one-sided CMS bound — never under the true count). `partials` may be
    at any key granularity; they are merged to a single global grid here
    (sum per cell — lossless). The candidate side is tiny (heavy-hitter
    candidates), so its hash positions broadcast-join against the d×w
    grid: no shuffle of the grid.
    """
    grid = partials.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    pos = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat_ws("|", F.col(item_col), F.lit(str(r)))), 1, 8
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(item_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        grid.join(F.broadcast(pos), ["r", "c"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cm_estimate"))
    )


def sliding_hll64(
    partials: DataFrame,
    keys: list[str],
    time_col: str,
    window: int,
    lg_k: int = 10,
) -> DataFrame:
    """Trailing-window distinct counts from mergeable register partials
    WITHOUT rescanning raw data: each per-period partial row (keys...,
    time, reg, rho) serves every window that covers its period, so a
    `window`-period trailing rollup is one constant-width explode
    (period t -> windows t .. t+window-1) followed by the same max-merge
    groupBy as merge_hll64. The classic sliding-distinct problem needs
    either a rescan per window or this: sketch state linear in
    (periods x m), merge cost independent of raw N — the 100-TB shape
    for "distinct users over the trailing 3 hours, every hour".

    Windows are labeled by their LAST period and only windows whose
    label is an observed period are kept (no phantom trailing windows
    past the data's end) — tracked by an "own period" flag max-merged
    WITH the registers, not by a self-join back onto the partials (one
    less shuffle, and streaming memory-sink state cannot self-join).
    """
    structs = F.array(
        *[
            F.struct(
                (F.col(time_col) + i).alias("win_end"),
                F.lit(i == 0).alias("__own"),
            )
            for i in range(window)
        ]
    )
    expanded = partials.select(
        *keys, F.explode(structs).alias("w"), "reg", "rho", "n_rows"
    ).select(*keys, "w.win_end", "w.__own", "reg", "rho", "n_rows")
    merged = merge_hll64(expanded, [*keys, "win_end"], lg_k=lg_k, flag_col="__own")
    return merged.filter(F.col("__own")).drop("__own")


def hll_pairwise_overlap(
    partials: DataFrame, key_col: str, lg_k: int = 10, round_to: int = 4
) -> DataFrame:
    """Pairwise set-overlap ESTIMATES from portable-HLL register
    partials by inclusion-exclusion: |A ∩ B| ≈ est(A) + est(B) −
    est(A ∪ B), where the union estimate costs one max-merge of the
    two key's registers — never a re-scan, never an exact intersect.
    THE way to ask "how much do these corpora overlap" at 100 TB:
    exact pairwise intersection is a quadratic-fanout token shuffle
    (the exact twin source_overlap_matrix pays it and caps pairs);
    register state is m rows per key, the pair grid is |keys|^2-sized,
    and everything merges losslessly.

    Publish discipline: the three estimates are each the established
    merge_hll64 readout (exact-integer harmonic sum, one divide,
    round 4); the overlap combines the three identical doubles with
    one +/− chain and publishes via floor(x*1e4 + 0.5)/1e4 — the
    bit-stable rounding from the q2 lesson.

    Returns (src_a, src_b, est_a, est_b, est_union, overlap_est)
    for every unordered key pair, a < b."""
    keys = partials.select(F.col(key_col)).distinct()
    pairs = (
        keys.select(F.col(key_col).alias("src_a"))
        .join(keys.select(F.col(key_col).alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    singles = merge_hll64(partials, [key_col], lg_k=lg_k)
    pa = pairs.join(
        partials.withColumnRenamed(key_col, "src_a"), "src_a"
    ).select("src_a", "src_b", "reg", "rho", "n_rows")
    pb = pairs.join(
        partials.withColumnRenamed(key_col, "src_b"), "src_b"
    ).select("src_a", "src_b", "reg", "rho", "n_rows")
    union_est = merge_hll64(
        pa.unionByName(pb), ["src_a", "src_b"], lg_k=lg_k
    ).select("src_a", "src_b", F.col("approx_distinct").alias("est_union"))
    sa = singles.select(
        F.col(key_col).alias("src_a"), F.col("approx_distinct").alias("est_a")
    )
    sb = singles.select(
        F.col(key_col).alias("src_b"), F.col("approx_distinct").alias("est_b")
    )
    out = (
        union_est.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
    )
    ov = F.col("est_a") + F.col("est_b") - F.col("est_union")
    scale = float(10 ** round_to)
    return out.select(
        "src_a",
        "src_b",
        "est_a",
        "est_b",
        "est_union",
        (F.floor(ov * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).alias("overlap_est"),
    )
