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


def test_quantile_bins_merge_equals_whole(spark):
    """Sum-merge of per-day partials must equal sketching the whole
    table directly — the mergeability property, checked exactly."""
    from pyspark.sql import functions as F

    from meteor_spark.operators.sketches import merge_quantile_bins, quantile_bin_partials

    rows = [(i % 3, f"d{i % 5}", float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "k int, day string, v double")
    lo, hi = 0.0, 299.0
    daily = quantile_bin_partials(df, ["k", "day"], "v", lo, hi, bins=32)
    whole = quantile_bin_partials(df, ["k"], "v", lo, hi, bins=32)
    a = sorted(map(tuple, merge_quantile_bins(daily, ["k"], lo, hi, bins=32).collect()))
    b = sorted(map(tuple, merge_quantile_bins(whole, ["k"], lo, hi, bins=32).collect()))
    assert a == b
    # estimates live within one bin width of the true quantile
    w = (hi - lo) / 32
    vals = sorted(r[2] for r in rows if r[0] == 0)
    # the q-th value by the sketch's own rule: first index where the
    # cumulative count reaches ceil(q*n) -> vals[ceil(0.5*n) - 1]
    true_p50 = vals[-(-len(vals) // 2) - 1]
    got = {r.k: r for r in merge_quantile_bins(daily, ["k"], lo, hi, bins=32).collect()}
    # estimate is the lower edge of the bin holding that value: error < w
    assert abs(got[0].p50 - true_p50) <= w + 1e-9


def test_quantile_bins_partitioning_invariant(spark):
    from meteor_spark.operators.sketches import merge_quantile_bins, quantile_bin_partials

    rows = [(1, float(i * 7 % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v double")
    a = sorted(map(tuple, merge_quantile_bins(
        quantile_bin_partials(df, ["k"], "v", 0.0, 101.0), ["k"], 0.0, 101.0).collect()))
    b = sorted(map(tuple, merge_quantile_bins(
        quantile_bin_partials(df.repartition(11), ["k"], "v", 0.0, 101.0), ["k"], 0.0, 101.0).collect()))
    assert a == b


def test_count_min_overestimates_and_partials_merge(spark):
    from meteor_spark.operators.sketches import count_min_estimate, count_min_partials
    from pyspark.sql import functions as F

    rows = [(i, f"t{i % 7}", i % 3) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, item string, grp int")
    exact = {r["item"]: r["n"] for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()}
    items = df.select("item").distinct()

    partials = count_min_partials(df, ["grp"], "item", depth=4, width=64)
    est = {
        r["item"]: r["cm_estimate"]
        for r in count_min_estimate(partials, items, "item", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    # CMS one-sided bound: estimate never below the true count
    assert all(est[k] >= exact[k] for k in exact)
    # partials merge losslessly: grouped-by-grp grids == single global grid
    global_partials = count_min_partials(df, [], "item", depth=4, width=64)
    merged = {
        (r["r"], r["c"]): r["cnt"]
        for r in partials.groupBy("r", "c").agg(F.sum("cnt").alias("cnt")).collect()
    }
    whole = {(r["r"], r["c"]): r["cnt"] for r in global_partials.collect()}
    assert merged == whole


# -- Misra-Gries heavy hitters ---------------------------------------------


def test_mg_candidates_superset_of_true_heavy_hitters(spark):
    # skewed stream: 'a' x 60, 'b' x 25, 40 singletons -> N=125
    rows = [("a",)] * 60 + [("b",)] * 25 + [(f"x{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    k = 5
    cands = {r["k"] for r in sketches.misra_gries_candidates(df, "k", k).collect()}
    n = df.count()
    true_heavy = {
        r["k"]
        for r in df.groupBy("k").count().filter(F.col("count") > n / k).collect()
    }
    assert true_heavy <= cands  # guaranteed superset
    # per-partition summaries are bounded: <= k entries per partition
    assert len(cands) <= k * df.rdd.getNumPartitions()


def test_heavy_hitters_exact_matches_group_by(spark):
    # N=130, k=5 -> threshold 26: 'a' (60) and 'b' (30) qualify strictly
    rows = [("a",)] * 60 + [("b",)] * 30 + [(f"x{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    k = 5
    got = {
        (r["k"], r["n_occurrences"])
        for r in sketches.heavy_hitters_exact(df, "k", k).collect()
    }
    n = df.count()
    want = {
        (r["k"], r["count"])
        for r in df.groupBy("k").count().filter(F.col("count") > n / k).collect()
    }
    assert got == want == {("a", 60), ("b", 30)}


def test_heavy_hitters_partitioning_invariant(spark):
    rows = [("a",)] * 60 + [(f"x{i}",) for i in range(60)]
    base = spark.createDataFrame(rows, "k string")
    outs = []
    for parts in (1, 3, 8):
        df = base.repartition(parts)
        outs.append(
            sorted(
                (r["k"], r["n_occurrences"])
                for r in sketches.heavy_hitters_exact(df, "k", 4).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2] == [("a", 60)]


def test_hll64_merge_of_daily_equals_sketch_of_whole(spark, sf_dir):
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    daily = sketches.hll64_partials(
        events.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    merged = {
        r["event_type"]: (r["approx_distinct"], r["n_rows"])
        for r in sketches.merge_hll64(daily, ["event_type"]).collect()
    }
    whole = {
        r["event_type"]: (r["approx_distinct"], r["n_rows"])
        for r in sketches.merge_hll64(
            sketches.hll64_partials(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    # register-wise max merge: union-of-daily == sketch-of-whole, exactly
    assert merged == whole


def test_hll64_estimate_close_to_exact(spark, sf_dir):
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    est = sketches.merge_hll64(
        sketches.hll64_partials(events, ["event_type"], "user_id"), ["event_type"]
    )
    exact = events.groupBy("event_type").agg(F.count_distinct("user_id").alias("exact"))
    # ~1.04/sqrt(1024) ≈ 3.3% std err (linear counting below 2.5m)
    for r in est.join(exact, "event_type").collect():
        assert abs(r["approx_distinct"] - r["exact"]) / r["exact"] < 0.12


def test_hll64_partitioning_invariant(spark, sf_dir):
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    a = sketches.merge_hll64(
        sketches.hll64_partials(events.repartition(3), ["event_type"], "user_id"),
        ["event_type"],
    ).collect()
    b = sketches.merge_hll64(
        sketches.hll64_partials(events.repartition(17, "user_id"), ["event_type"], "user_id"),
        ["event_type"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll64_register_spec_hand_checked(spark):
    # one known value: md5('7') = 8f14e45fceea167a5a36dedd4bea2543
    # h1 = 0x8f14e45f -> reg = h1 % 1024; h2 = 0xceea167a -> rho = 33 - bit_length
    df = spark.createDataFrame([(7,)], "user_id long").withColumn("k", F.lit("x"))
    row = sketches.hll64_partials(df, ["k"], "user_id").collect()[0]
    h1 = 0x8F14E45F
    h2 = 0xCEEA167A
    assert row["reg"] == h1 % 1024
    assert row["rho"] == 33 - h2.bit_length()
    assert row["n_rows"] == 1


def test_hll64_raw_regime_accuracy(spark):
    # 50k distinct >> 2.5m (2560): exercises the harmonic-mean branch,
    # not linear counting
    df = spark.range(50_000).select(F.col("id").alias("user_id"), F.lit("g").alias("k"))
    row = sketches.merge_hll64(sketches.hll64_partials(df, ["k"], "user_id"), ["k"]).collect()[0]
    assert abs(row["approx_distinct"] - 50_000) / 50_000 < 0.12
    assert row["n_rows"] == 50_000


def test_hll64_null_values_dont_occupy_registers(spark):
    # count_distinct ignores NULLs; the sketch must too — a NULL value
    # hashes to a NULL register and must not shrink the empty-register
    # count v (it still counts toward n_rows)
    with_nulls = spark.createDataFrame(
        [(i,) for i in range(20)] + [(None,)] * 5, "user_id long"
    ).withColumn("k", F.lit("g"))
    without = spark.createDataFrame([(i,) for i in range(20)], "user_id long").withColumn(
        "k", F.lit("g")
    )
    a = sketches.merge_hll64(sketches.hll64_partials(with_nulls, ["k"], "user_id"), ["k"]).collect()[0]
    b = sketches.merge_hll64(sketches.hll64_partials(without, ["k"], "user_id"), ["k"]).collect()[0]
    assert a["approx_distinct"] == b["approx_distinct"]
    assert a["n_rows"] == 25 and b["n_rows"] == 20


def test_rows_only_gate_tracks_portable_twin(spark, sf_dir):
    # the Datasketches rollup (register state is engine-internal) must
    # agree with its EXACT-GATED twin (events_portable_hll_rollup,
    # bit-exact DuckDB oracle) and with the exact count. Since r11 the
    # gate publishes the checked contract (exact_distinct +
    # estimate_within_tol) instead of the raw estimate, so the estimate
    # itself is rebuilt here from the same sketch pipeline, and the
    # gate's contract booleans are asserted all-true.
    from meteor_spark.operators import sketches
    from meteor_spark.queries import QUERIES

    gate = QUERIES["events_distinct_sketch_rollup"](spark, sf_dir).collect()
    assert all(r["estimate_within_tol"] for r in gate)
    ev = read_parquet_table(spark, f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts"))
    ds = {r["event_type"]: r["approx_distinct"]
          for r in sketches.merge_distinct(
              sketches.distinct_sketches(ev, ["event_type", "day"], "user_id"),
              ["event_type"]).collect()}
    port = {r["event_type"]: r["approx_distinct"]
            for r in QUERIES["events_portable_hll_rollup"](spark, sf_dir).collect()}
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    exact = {r["event_type"]: r["exact"]
             for r in events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("exact")).collect()}
    assert set(ds) == set(port) == set(exact)
    for et, ex in exact.items():
        assert abs(ds[et] - ex) / ex < 0.08, (et, ds[et], ex)
        assert abs(port[et] - ex) / ex < 0.08, (et, port[et], ex)
        assert abs(ds[et] - port[et]) / ex < 0.12, (et, ds[et], port[et])


def test_datasketches_register_state_vs_md5_twin(spark, sf_dir):
    """The strongest REGISTER-level cross-twin assertions that can hold,
    plus the documented reason full register equality cannot:

    The Datasketches sketch (hll_sketch_agg) hashes values with
    xxhash64; the portable twin (hll64_partials) hashes with md5 —
    different hash families map the same value to DIFFERENT (register,
    rho) cells BY DESIGN (the portable twin exists precisely because
    Datasketches register state is engine-internal and not
    reconstructible in SQL). So register-content equality between the
    two is impossible; what IS pinned here, at the register level:

    1. the serialized sketch really is Apache DataSketches HLL state
       (public preamble: serVer=1, familyId=7 (HLL), lgK as configured)
       — the gate can't silently degrade to some other aggregate;
    2. Datasketches register state is merge-DETERMINISTIC: rolling the
       same rows up through different partitionings/groupings yields
       byte-identical estimates (max-merge has no order dependence),
       the same invariance the md5 twin proves bit-exactly in SQL;
    3. both sketches agree with each other and the exact count
       (test_rows_only_gate_tracks_portable_twin pins the tolerance).
    """
    events = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    lg_k = 12
    sk = sketches.distinct_sketches(events, ["event_type"], "user_id", lg_k=lg_k)
    buf = bytes(sk.limit(1).collect()[0]["sketch"])
    assert buf[1] == 1, "Datasketches HLL serialization version"
    assert buf[2] == 7, "Datasketches family id: HLL"
    assert buf[3] == lg_k, "configured lgK survives into the register state"

    # merge determinism at the register level, observed through the
    # estimate: daily partials max-merged vs direct, across an odd
    # repartitioning — identical doubles, not approximately equal
    daily = sketches.distinct_sketches(
        events.withColumn("day", F.to_date("ts")).repartition(13),
        ["event_type", "day"], "user_id", lg_k=lg_k,
    )
    via_daily = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.merge_distinct(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.merge_distinct(sk, ["event_type"]).collect()
    }
    assert via_daily == direct


def test_sliding_hll64_equals_direct_merge_of_covered_hours(spark):
    # window estimate == direct hll64 over the union of its hours
    # (register max-merge), and only observed periods label windows
    rows = []
    for hr, users in [(100, range(0, 50)), (101, range(25, 80)), (103, range(0, 10))]:
        rows += [(hr, u) for u in users]
    df = spark.createDataFrame(rows, "hr long, user_id long").withColumn(
        "k", F.lit("x")
    )
    p = sketches.hll64_partials(df, ["k", "hr"], "user_id")
    out = {
        r["win_end"]: r
        for r in sketches.sliding_hll64(p, ["k"], "hr", window=3).collect()
    }
    assert set(out) == {100, 101, 103}  # 102 unobserved -> no phantom window
    # window 101 covers hours 99..101 -> users 0..79; compare to direct
    direct = sketches.merge_hll64(
        sketches.hll64_partials(
            df.filter(F.col("hr").isin(100, 101)), ["k"], "user_id"
        ),
        ["k"],
    ).collect()[0]
    assert out[101]["approx_distinct"] == direct["approx_distinct"]
    assert out[101]["n_rows"] == 105  # 50 + 55 events
    # window 103 covers 101..103: hour 102 absent, union of 101 and 103
    assert out[103]["n_rows"] == 65


def test_hll_pairwise_overlap_tracks_truth(spark):
    from pyspark.sql import functions as F

    from meteor_spark.operators.sketches import hll64_partials, hll_pairwise_overlap

    # two sources sharing exactly 600 of 1000/800 distinct tokens
    a = spark.range(1000).selectExpr("'a' AS src", "CAST(id AS STRING) AS w")
    b = spark.range(400, 1200).selectExpr("'b' AS src", "CAST(id AS STRING) AS w")
    partials = hll64_partials(a.union(b), ["src"], "w", lg_k=10)
    out = hll_pairwise_overlap(partials, "src", lg_k=10).collect()
    assert len(out) == 1
    r = out[0]
    # HLL at lg_k=10 has ~3% relative error; inclusion-exclusion
    # roughly triples it — accept a wide-but-meaningful band
    assert abs(r["est_a"] - 1000) / 1000 < 0.15
    assert abs(r["est_b"] - 800) / 800 < 0.15
    assert abs(r["overlap_est"] - 600) / 600 < 0.35
