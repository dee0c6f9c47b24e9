"""Distribution-drift monitoring for large-scale pipelines.

A 100 TB training-data pipeline re-ingests sources continuously; the
question "did this week's data shift under me?" is answered per feature
with the Population Stability Index — the standard drift score over a
binned distribution:

    PSI = sum_bins (p_actual - p_expected) * ln(p_actual / p_expected)

(<0.1 stable, 0.1-0.25 moderate shift, >0.25 action needed.)

Scale shape: ONE map-side-combined groupBy over the fact table produces
(group, bin) counts for both populations at once — the shuffle carries
bins x groups rows, never data rows. Bounds are a tiny per-group
aggregate broadcast back; everything downstream operates on the count
frame. No reference analogue (odpf/meteor profiles single snapshots,
SURVEY.md §2.6); this extends the profile family across time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str],
) -> DataFrame:
    """Change detection between two snapshots of the same entity set
    (catalog runs, profile sweeps, any keyed frame): full outer join on
    `keys`, null-safe comparison of `compare` columns.

    Returns (keys..., status, {c}_old, {c}_new ...) with status in
    {added, removed, changed, unchanged}. Presence flags — not null
    checks on data columns — decide added/removed, so legitimately-NULL
    attribute values never masquerade as membership changes.

    Scale: snapshots are catalog-sized (one row per asset — thousands
    to millions of rows, KBs..GBs against the 100 TB the assets
    describe); the one shuffle is the outer join on the key, and AQE
    broadcasts a small side. This is the meteor re-run story: the
    reference re-extracts and re-sinks everything each run with no
    notion of what changed (agent/agent.go:116-192); diffing two asset
    snapshots makes incremental sinks possible.
    """
    from functools import reduce
    from operator import or_

    o = old.select(
        *keys, F.lit(True).alias("__in_old"), *[F.col(c).alias(f"{c}_old") for c in compare]
    )
    n = new.select(
        *keys, F.lit(True).alias("__in_new"), *[F.col(c).alias(f"{c}_new") for c in compare]
    )
    j = o.join(n, keys, "full_outer")
    changed = reduce(or_, [~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")) for c in compare])
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out_cols = [f"{c}_{side}" for c in compare for side in ("old", "new")]
    return j.select(*keys, status.alias("status"), *out_cols)


def psi_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    is_actual: Column,
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 4,
) -> DataFrame:
    """PSI per group between the expected (is_actual=false) and actual
    (is_actual=true) populations of `value_col`.

    Bins are equi-width over the COMBINED per-group [min, max] (both
    populations see identical bin edges — the PSI contract); the max
    value folds into the last bin; a degenerate range (min == max) puts
    everything in bin 0. Zero-count bins are floored at `eps` so the log
    is finite; bins empty on both sides contribute exactly 0.

    Bit-stability: the published psi must hash-match a DuckDB oracle,
    but ln() differs by ulps across JVM/libm and float sums are
    order-dependent, so round(sum(term), 4) can land on either side of
    a half-up boundary per engine. Each per-bin term is therefore
    quantized to fixed-point int64 (round(term * 1e8)) and summed as
    integers — exact and order-independent — then divided back and
    rounded. Identical integers -> identical IEEE division -> identical
    half-up rounding on both engines.

    Returns (group, n_expected, n_actual, psi).
    """
    v = F.col(value_col).cast("double")
    # NULL values carry no distribution information and must not be
    # binned: least(NULL, bins-1) would otherwise SKIP the null and
    # drop every NULL row into the top bin, fabricating drift there
    df = df.filter(v.isNotNull())
    bounds = df.groupBy(group_col).agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / bins
    bin_id = (
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(F.least(F.floor((v - F.col("__lo")) / width), F.lit(bins - 1)))
        .cast("int")
    )
    counts = (
        df.join(F.broadcast(bounds), group_col)
        .select(F.col(group_col), bin_id.alias("__bin"), is_actual.alias("__act"))
        .groupBy(group_col, "__bin")
        .agg(
            F.sum(F.when(~F.col("__act"), 1).otherwise(0)).alias("cnt_e"),
            F.sum(F.when(F.col("__act"), 1).otherwise(0)).alias("cnt_a"),
        )
    )
    return _psi_from_bin_counts(counts, group_col, eps, round_to)


def _psi_from_bin_counts(
    counts: DataFrame, group_col: str, eps: float, round_to: int
) -> DataFrame:
    """PSI readout over a (group, __bin, cnt_e, cnt_a) frame — factored
    so the STREAMING twin can feed binned state through the identical
    fixed-point publish (the ks_from_counts / cusum_from_hourly
    pattern)."""
    w = Window.partitionBy(group_col)
    p = counts.select(
        F.col(group_col),
        "cnt_e",
        "cnt_a",
        F.greatest(F.col("cnt_e") / F.sum("cnt_e").over(w), F.lit(eps)).alias("__pe"),
        F.greatest(F.col("cnt_a") / F.sum("cnt_a").over(w), F.lit(eps)).alias("__pa"),
    )
    term = (F.col("__pa") - F.col("__pe")) * F.log(F.col("__pa") / F.col("__pe"))
    term_fixed = F.round(term * F.lit(1e8)).cast("long")
    return p.groupBy(group_col).agg(
        F.sum("cnt_e").alias("n_expected"),
        F.sum("cnt_a").alias("n_actual"),
        F.round(F.sum(term_fixed) / F.lit(1e8), round_to).alias("psi"),
    )


def psi_from_value_counts(
    g: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 4,
) -> DataFrame:
    """PSI readout over a finished VALUE-GRID count frame — (group,
    value, cnt_e, cnt_a) with value already non-null — the state shape
    a stream maintains (mergeable counts, bounded by the grid, not N).
    Binning a value once and weighting by its count is arithmetically
    IDENTICAL to binning each raw row (same double -> same bin), so
    this equals psi_drift on the raw frame bit-for-bit, and therefore
    the batch gate's oracle."""
    v = F.col(value_col).cast("double")
    # bounds via partition-only windows, NOT groupBy + broadcast
    # self-join: the frame is GRID-sized so the window is cheap, and a
    # self-join on memory-sink lineage trips Spark 4.1's
    # conflicting-reference resolution (the cusum_from_hourly lesson)
    w = Window.partitionBy(group_col)
    b = g.select(
        F.col(group_col),
        v.alias("__v"),
        "cnt_e",
        "cnt_a",
        F.min(v).over(w).alias("__lo"),
        F.max(v).over(w).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / bins
    bin_id = (
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(F.floor((F.col("__v") - F.col("__lo")) / width), F.lit(bins - 1))
        )
        .cast("int")
    )
    counts = (
        b.select(F.col(group_col), bin_id.alias("__bin"), "cnt_e", "cnt_a")
        .groupBy(group_col, "__bin")
        .agg(F.sum("cnt_e").alias("cnt_e"), F.sum("cnt_a").alias("cnt_a"))
    )
    return _psi_from_bin_counts(counts, group_col, eps, round_to)


def seasonality_residuals(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 4,
) -> DataFrame:
    """Hour-of-day seasonal profile + per-hour residual z-scores:
    (event_type, hour, n, expected, resid_z) for every concrete
    (type, wall-clock hour) bucket.

    The time-series anomaly screen next to the distributional PSI gate:
    expected load for an hour is the mean count over all same
    hour-of-day buckets of that type, and resid_z = (n - expected) / sd
    flags hours that break their own seasonal pattern. Two passes over
    the hourly rollup (which is itself one map-side-combined groupBy of
    the stream): the (type, hod) profile is a tiny broadcast.
    """
    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col).cast("timestamp")).alias("hour"),
            F.hour(F.col(ts_col).cast("timestamp")).alias("hod"),
        )
        .groupBy("event_type", "hour", "hod")
        .agg(F.count("*").alias("n"))
    )
    prof = hourly.groupBy("event_type", "hod").agg(
        F.avg("n").alias("mu"),
        F.coalesce(F.stddev_pop("n"), F.lit(0.0)).alias("sd"),
    )
    return hourly.join(F.broadcast(prof), ["event_type", "hod"]).select(
        "event_type",
        F.col("hour").cast("string").alias("hour"),
        F.col("n").cast("long").alias("n"),
        F.round("mu", round_to).alias("expected"),
        (
            F.round(
                F.when(F.col("sd") > 0, (F.col("n") - F.col("mu")) / F.col("sd")).otherwise(0.0),
                round_to,
            )
            # + 0.0 folds IEEE -0.0 (tiny negative z rounds to -0.0 in
            # sign-preserving engines, 0.0 here)
            + F.lit(0.0)
        ).alias("resid_z"),
    )


def hourly_autocorrelation(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 4,
) -> DataFrame:
    """Lag-1 autocorrelation of the hourly count series per key:
    (event_type, n_hours, lag1_autocorr). High positive values mean
    load momentum (bursty traffic), near-zero means memoryless arrivals
    — the temporal-structure probe beside seasonality_residuals' level
    anomalies. One hourly rollup (map-side combined), a lag window over
    the per-type hour series (bounded by hours, not events), and a
    corr aggregate."""
    from pyspark.sql import Window

    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col).cast("timestamp")).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = hourly.withColumn("prev", F.lag("n").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        (F.round(F.corr("n", "prev"), round_to) + F.lit(0.0)).alias("lag1_autocorr"),
    )


def ks_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per key, EXACT-integer: the
    value distribution of the EARLY half of the time range vs the LATE
    half (split at the integer midpoint of [min, max] of `time_col` —
    a deterministic corpus property, not a sampled one). KS is the max
    CDF gap; PSI (psi_drift) needs binning and misses shape changes
    inside a bin — KS is the binning-free complement.

        D = max_v |F_early(v) - F_late(v)|
          = max_v |cum1(v)·n2 - cum2(v)·n1| / (n1·n2)

    The arithmetic is pure int64. The binding bound is the PUBLISH
    step, not the numerator: fixed_div_expr needs 10·(n1·n2) ≤ 9.2e18,
    i.e. n1·n2 ≤ 9.2e17 — ~9.6e8 rows per balanced side (the numerator
    alone, |cum·n|, would tolerate ~3e9). Shard counts past that.
    Built from one (key, value) groupBy and one ordered cumulative
    window per key; the published ks_ppm divides the exact integers
    digit-wise (fixed_div_expr), so both engines agree to the last
    ppm. Ordering ties are a non-issue: cumulative counts are per
    DISTINCT value, and both engines order identical doubles
    identically. NULL values are not observations (matching
    psi_drift): they are filtered before counting — otherwise Spark
    (NULLS FIRST) and DuckDB (NULLS LAST) would place the NULL group
    at opposite ends of the CDF."""
    b = df.agg(
        F.min(time_col).cast("long").alias("mn"),
        F.max(time_col).cast("long").alias("mx"),
    )
    early = F.col(time_col).cast("long") <= F.expr("(mn + mx) div 2")
    g = (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(b))
        .groupBy(key_col, value_col)
        .agg(
            F.sum(early.cast("long")).alias("c1"),
            F.sum((~early).cast("long")).alias("c2"),
        )
    )
    return ks_from_counts(g, key_col, value_col)


def ks_from_counts(g: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """The KS readout given per-(key, value) early/late counts
    (columns c1, c2) — the state shape a STREAMING monitor maintains
    (counts are mergeable; the distinct-value grid, not N, bounds the
    state). Shared by ks_drift (batch, computes the split itself) and
    the streaming twin (reference boundary known a priori, counts
    accumulated in stream state)."""
    from meteor_spark.functions.exactmath import fixed_div_expr

    w = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy(key_col)
    d = g.select(
        key_col,
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(wk).alias("n1"),
        F.sum("c2").over(wk).alias("n2"),
    )
    per_key = d.groupBy(key_col).agg(
        F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))).alias(
            "d_num"
        ),
        F.first("n1").alias("n_early"),
        F.first("n2").alias("n_late"),
    )
    ks = F.expr(fixed_div_expr("d_num", "n_early * n_late", 6, "div")).cast("long")
    return per_key.select(
        key_col, "n_early", "n_late", ks.alias("ks_ppm")
    )


def cusum_changepoint(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """CUSUM changepoint detection per key over the hourly count
    series — the classic sequential statistic for "WHEN did the rate
    shift", complementing this module's what-changed family (PSI/KS:
    value distributions; MAD: outlier census; seasonality: repeating
    pattern residuals). EXACT-integer throughout: with H observed
    hours and T total events, the mean-centered deviation of hour t is

        dev_t   = x_t * H - T          (integer; Σ dev_t = 0)
        cusum_t = Σ_{s<=t} dev_s       (integer partial sums)

    and the changepoint is the FIRST hour attaining max |cusum| — the
    split point a level-shift model would choose. Published: the
    changepoint hour, the sign there (+1 = counts ran ABOVE the mean
    before the peak, i.e. a drop follows; -1 the reverse; 0 = flat),
    and peak_ppm = floor(1e6 * peak / (T * H)) via ppm_expr
    (|cusum| <= T*H, so the ratio is a true fraction; T*H <= 9.2e15
    bounds the divisor — shard hour ranges past ~9e7 events x 1e8
    hours, far beyond any real window).

    Scale: one (key, hour) groupBy, one ordered cumulative window and
    one max window per key over HOUR-count-sized rows (time-range
    property, not N), one tiny final agg. Observed-hours semantics
    (missing hours are absent, matching hourly_autocorrelation)."""
    hourly = (
        events.select(
            F.col(type_col).alias("k"),
            F.expr(f"CAST(unix_timestamp({ts_col}) AS BIGINT) div 3600").alias("hr"),
        )
        .groupBy("k", "hr")
        .agg(F.count("*").alias("x"))
    )
    return cusum_from_hourly(hourly, type_col)


def cusum_from_hourly(hourly: DataFrame, type_col: str = "event_type") -> DataFrame:
    """CUSUM readout over a finished (k, hr, x) hourly-count frame —
    factored out of cusum_changepoint (same pattern as ks_from_counts)
    so the STREAMING twin can accumulate the counts as mergeable state
    and feed the identical exact-integer readout: bounded stream ==
    batch == the batch gate's bit-exact oracle."""
    from meteor_spark.functions.exactmath import ppm_expr

    wk = Window.partitionBy("k")
    d = hourly.select(
        "k",
        "hr",
        (F.col("x") * F.count("*").over(wk) - F.sum("x").over(wk))
        .cast("long")
        .alias("dev"),
        F.count("*").over(wk).cast("long").alias("n_hours"),
        F.sum("x").over(wk).cast("long").alias("total"),
    )
    wcum = (
        Window.partitionBy("k")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select(
        "k", "hr", "n_hours", "total", F.sum("dev").over(wcum).alias("cusum")
    )
    # peak via a partition-only window, NOT a groupBy + self-join: one
    # fewer exchange, and a self-join on a memory-sink-derived frame
    # (the streaming twin's finished state) trips Spark 4.1's
    # conflicting-reference resolution with an INTERNAL_ERROR
    at_peak = (
        c.withColumn("peak", F.max(F.abs("cusum")).over(wk))
        .filter(F.abs(F.col("cusum")) == F.col("peak"))
        .groupBy("k", "n_hours", "total", "peak")
        .agg(
            F.min("hr").alias("changepoint_hr"),
            F.min_by(F.signum("cusum").cast("long"), "hr").alias("direction"),
        )
    )
    peak_ppm = F.expr(
        ppm_expr("peak", "greatest(total * n_hours, 1)", "div")
    ).cast("long")
    return at_peak.select(
        F.col("k").alias(type_col),
        "n_hours",
        "total",
        F.col("changepoint_hr").cast("long").alias("changepoint_hr"),
        "direction",
        peak_ppm.alias("peak_ppm"),
    )


def holt_smoothing(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact-integer simple exponential smoothing per key over the
    hourly count series — the FORECASTING sibling of this module's
    monitoring family (PSI/KS: what distribution changed; MAD: which
    values; CUSUM: which moment; seasonality: which recurring hours;
    this: what level the rate is tracking toward, hour by hour, and
    how surprising each hour was against it). Alpha is fixed at 1/4
    through integer floor division so the whole series is bit-stable
    across engines:

        level_1 = 1000 * x_1                     (milli-units)
        res_t   = 1000 * x_t - level_{t-1}
        level_t = level_{t-1} + (res_t + 4*S) // 4 - S    (S = 2^40)

    The 4*S shift keeps the floor-division numerator NON-NEGATIVE —
    engines genuinely disagree on negative integer division (Python //
    floors, DuckDB // truncates toward zero; measured: -250 gave -63
    vs -62), and shifting is the same bit-stable-playbook move
    mw_domain_reweight uses. Valid while res_t >= -4*S, i.e. hourly
    levels below ~4.4e12 milli-events — shard the key past 4e9
    events/hour.

    ROW-PRESERVING publish — (key, hr, x, level_milli, residual_milli)
    for every observed hour — so the oracle value-hashes the entire
    recursion, not a summary of it.

    Scale: one (key, hour) groupBy, then ONE applyInPandas fold per
    key. The fold is inherently sequential per key, but each group is
    HOUR-COUNT-sized (a time-range property — ~720 rows per key per
    month, N-independent), keys fold in parallel, and the raw rows
    never reach Python — only the hourly aggregate does."""
    hourly = (
        events.select(
            F.col(type_col).alias("k"),
            F.expr(f"CAST(unix_timestamp({ts_col}) AS BIGINT) div 3600").alias("hr"),
        )
        .groupBy("k", "hr")
        .agg(F.count("*").alias("x"))
    )
    return holt_from_hourly(hourly, type_col)


def holt_from_hourly(hourly: DataFrame, type_col: str = "event_type") -> DataFrame:
    """Holt readout over a finished (k, hr, x) hourly-count frame —
    factored out of holt_smoothing (the ks_from_counts /
    cusum_from_hourly pattern) so the streaming twin can accumulate
    counts as mergeable state and feed the identical shifted-floor-div
    fold: bounded stream == batch == the RECURSIVE-CTE oracle."""
    import pandas as pd

    S = 1 << 40

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hr").reset_index(drop=True)
        levels, residuals = [], []
        level = 0
        for i, x in enumerate(pdf["x"]):
            xm = int(x) * 1000
            if i == 0:
                level, res = xm, 0
            else:
                res = xm - level
                level = level + (res + 4 * S) // 4 - S
            levels.append(level)
            residuals.append(res)
        pdf["level_milli"] = levels
        pdf["residual_milli"] = residuals
        return pdf

    out_schema = "k string, hr long, x long, level_milli long, residual_milli long"
    return (
        hourly.groupBy("k")
        .applyInPandas(fold, schema=out_schema)
        .select(
            F.col("k").alias(type_col),
            "hr",
            "x",
            "level_milli",
            "residual_milli",
        )
    )
