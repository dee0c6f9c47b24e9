"""Distribution-drift (PSI) operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteor_spark.operators import drift


def _frame(spark, expected_vals, actual_vals, group="g"):
    rows = [(group, float(v), False) for v in expected_vals] + [
        (group, float(v), True) for v in actual_vals
    ]
    return spark.createDataFrame(rows, "g string, value double, act boolean")


def test_identical_distributions_score_zero(spark):
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] * 3
    df = _frame(spark, vals, vals)
    row = drift.psi_drift(df, "value", "g", F.col("act")).first()
    assert row["psi"] == 0.0
    assert row["n_expected"] == 30 and row["n_actual"] == 30


def test_shifted_distribution_scores_high(spark):
    df = _frame(spark, [1, 2, 3, 4, 5] * 6, [6, 7, 8, 9, 10] * 6)
    assert drift.psi_drift(df, "value", "g", F.col("act")).first()["psi"] > 0.25


def test_degenerate_range_single_bin(spark):
    # min == max: everything lands in bin 0, identical on both sides
    df = _frame(spark, [5, 5, 5], [5, 5])
    assert drift.psi_drift(df, "value", "g", F.col("act")).first()["psi"] == 0.0


def test_groups_are_independent(spark):
    stable = [(("a"), float(v), b) for v in (1, 2, 3, 4, 5) for b in (False, True)]
    drifted = [("b", 1.0, False)] * 10 + [("b", 100.0, True)] * 10
    df = spark.createDataFrame(stable + drifted, "g string, value double, act boolean")
    rows = {r["g"]: r["psi"] for r in drift.psi_drift(df, "value", "g", F.col("act")).collect()}
    assert rows["a"] == 0.0 and rows["b"] > 1.0


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20), ("c", 3, 30)], "k string, x int, y int"
    )
    new = spark.createDataFrame(
        [("b", 2, 20), ("c", 3, 99), ("d", 4, 40)], "k string, x int, y int"
    )
    rows = {
        r["k"]: r
        for r in drift.snapshot_diff(old, new, ["k"], ["x", "y"]).collect()
    }
    assert rows["a"]["status"] == "removed" and rows["a"]["x_new"] is None
    assert rows["b"]["status"] == "unchanged"
    assert rows["c"]["status"] == "changed" and (rows["c"]["y_old"], rows["c"]["y_new"]) == (30, 99)
    assert rows["d"]["status"] == "added" and rows["d"]["x_old"] is None


def test_snapshot_diff_null_values_are_not_membership(spark):
    # a NULL attribute on both sides is 'unchanged', not added/removed;
    # NULL -> value is 'changed'
    old = spark.createDataFrame([("a", None), ("b", None)], "k string, x int")
    new = spark.createDataFrame([("a", None), ("b", 5)], "k string, x int")
    rows = {r["k"]: r["status"] for r in drift.snapshot_diff(old, new, ["k"], ["x"]).collect()}
    assert rows == {"a": "unchanged", "b": "changed"}


def test_seasonality_residuals_flags_broken_hour(spark):
    import datetime as dt

    from meteor_spark.operators.drift import seasonality_residuals

    # type 'a': 5 events at 09:00 on days 1-4, but 50 on day 5 -> day-5
    # bucket must carry a large positive residual z-score
    rows = []
    eid = 0
    for day in range(1, 6):
        n = 50 if day == 5 else 5
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 3, day, 9, i % 60), 1, "a", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["hour"]: r for r in seasonality_residuals(df).collect()}
    assert len(out) == 5
    spike = out["2024-03-05 09:00:00"]
    normal = out["2024-03-01 09:00:00"]
    assert spike["resid_z"] > 1.5
    assert normal["resid_z"] < 0
    assert spike["expected"] == normal["expected"] == 14.0  # (4*5+50)/5


def test_seasonality_residuals_constant_load_is_zero(spark):
    import datetime as dt

    from meteor_spark.operators.drift import seasonality_residuals

    rows = [
        (i, dt.datetime(2024, 3, 1 + i % 3, 12, 0), 1, "b", 1.0) for i in range(9)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    for r in seasonality_residuals(df).collect():
        assert r["resid_z"] == 0.0 and r["n"] == 3


def test_hourly_autocorr_alternating_vs_trending(spark):
    import datetime as dt

    from meteor_spark.operators.drift import hourly_autocorrelation

    rows = []
    eid = 0
    for h in range(24):
        # 'alt': alternating 2/8 counts -> strong negative lag-1 autocorr
        for _ in range(8 if h % 2 else 2):
            rows.append((eid, dt.datetime(2024, 5, 1, h), 1, "alt", 0.0)); eid += 1
        # 'ramp': monotonically rising counts -> strong positive autocorr
        for _ in range(h + 1):
            rows.append((eid, dt.datetime(2024, 5, 1, h), 1, "ramp", 0.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["event_type"]: r for r in hourly_autocorrelation(df).collect()}
    assert out["alt"]["lag1_autocorr"] < -0.9
    assert out["ramp"]["lag1_autocorr"] > 0.9
    assert out["alt"]["n_hours"] == 23


def test_psi_ignores_null_values(spark):
    # regression: least(NULL, bins-1) skipped the null and every NULL row
    # landed in the top bin, fabricating drift there
    from meteor_spark.operators.drift import psi_drift
    from pyspark.sql import functions as F

    base = [("g", float(i % 10), i >= 50) for i in range(100)]
    clean = spark.createDataFrame(base, "g string, v double, act boolean")
    nulled = clean.union(
        spark.createDataFrame([("g", None, True)] * 30, "g string, v double, act boolean")
    )
    a = psi_drift(clean, "v", "g", F.col("act")).collect()[0]
    b = psi_drift(nulled, "v", "g", F.col("act")).collect()[0]
    assert a["psi"] == b["psi"]
    assert b["n_actual"] == a["n_actual"]  # NULL rows are not observations


def test_ks_drift_hand_checked(spark):
    from meteor_spark.operators.drift import ks_drift

    # early half (t<=5): values {1,2,3,4}; late half: values {3,4,5,6}
    rows = [("a", float(v), t) for t, v in [(1, 1), (2, 2), (3, 3), (4, 4)]]
    rows += [("a", float(v), t) for t, v in [(7, 3), (8, 4), (9, 5), (10, 6)]]
    df = spark.createDataFrame(rows, "k string, value double, t long")
    out = ks_drift(df, "k", "value", "t").collect()[0]
    assert out["n_early"] == 4 and out["n_late"] == 4
    # F_early(2)=0.5, F_late(2)=0 -> D = 0.5 exactly
    assert out["ks_ppm"] == 500_000
    # identical halves -> D = 0
    same = spark.createDataFrame(
        [("b", 1.0, 1), ("b", 2.0, 2), ("b", 1.0, 9), ("b", 2.0, 10)],
        "k string, value double, t long",
    )
    assert ks_drift(same, "k", "value", "t").collect()[0]["ks_ppm"] == 0


def test_ks_drift_ignores_null_values(spark):
    """NULL values are not observations (psi_drift semantics); without
    the filter Spark (NULLS FIRST) and DuckDB (NULLS LAST) would place
    the NULL group at opposite CDF ends and diverge."""
    from meteor_spark.operators.drift import ks_drift

    rows = [("a", float(v), t) for t, v in [(1, 1), (2, 2), (7, 3), (8, 4)]]
    clean = spark.createDataFrame(rows, "k string, value double, t long")
    nulled = clean.union(
        spark.createDataFrame(
            [("a", None, 1), ("a", None, 9)], "k string, value double, t long"
        )
    )
    a = ks_drift(clean, "k", "value", "t").collect()[0]
    b = ks_drift(nulled, "k", "value", "t").collect()[0]
    assert (a["ks_ppm"], a["n_early"], a["n_late"]) == (
        b["ks_ppm"],
        b["n_early"],
        b["n_late"],
    )


def test_ks_drift_empty(spark):
    from meteor_spark.operators.drift import ks_drift

    empty = spark.createDataFrame([], "k string, value double, t long")
    assert ks_drift(empty, "k", "value", "t").count() == 0


def test_ks_from_counts_hand_checked(spark):
    """The shared readout on a hand-built count state: early {1,2,3,4},
    late {3,4,5,6} -> D = 0.5 at v=2 (same frame as the end-to-end
    hand check, fed through the streaming state shape)."""
    from meteor_spark.operators.drift import ks_from_counts

    g = spark.createDataFrame(
        [("a", 1.0, 1, 0), ("a", 2.0, 1, 0), ("a", 3.0, 1, 1),
         ("a", 4.0, 1, 1), ("a", 5.0, 0, 1), ("a", 6.0, 0, 1)],
        "k string, value double, c1 long, c2 long",
    )
    out = ks_from_counts(g, "k", "value").collect()[0]
    assert (out["n_early"], out["n_late"], out["ks_ppm"]) == (4, 4, 500_000)


def test_ks_from_counts_empty(spark):
    from meteor_spark.operators.drift import ks_from_counts

    empty = spark.createDataFrame([], "k string, value double, c1 long, c2 long")
    assert ks_from_counts(empty, "k", "value").count() == 0


def test_cusum_changepoint_level_shift(spark):
    """Rate 2/hour for hours 0-9, then 8/hour for hours 10-19: CUSUM
    bottoms out exactly at the shift boundary (hour 9), negative sign
    (counts ran BELOW the mean before the jump)."""
    import datetime as dt

    from meteor_spark.operators.drift import cusum_changepoint

    rows, eid = [], 0
    for h in range(20):
        for _ in range(2 if h < 10 else 8):
            rows.append((eid, dt.datetime(2024, 1, 1, h), 1, "a", 0.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = cusum_changepoint(df).collect()[0]
    assert (out["n_hours"], out["total"]) == (20, 100)
    base_hr = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    # dev = x*20 - 100: -60/hour before the shift, +60 after; |cusum|
    # peaks at 600 on the last pre-shift hour (hour 9)
    assert out["changepoint_hr"] - base_hr in (9, 9 - 24)  # tz-robust: hour index 9
    assert out["direction"] == -1
    assert out["peak_ppm"] == 1_000_000 * 600 // (100 * 20)


def test_cusum_changepoint_constant_rate_is_flat(spark):
    import datetime as dt

    from meteor_spark.operators.drift import cusum_changepoint

    rows = [(i, dt.datetime(2024, 1, 1, i % 10), 1, "b", 0.0) for i in range(50)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = cusum_changepoint(df).collect()[0]
    assert (out["peak_ppm"], out["direction"]) == (0, 0)


def test_cusum_changepoint_empty(spark):
    from meteor_spark.operators.drift import cusum_changepoint

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    assert cusum_changepoint(empty).count() == 0


def test_holt_smoothing_recursion_exact(spark):
    from meteor_spark.operators.drift import holt_smoothing
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    xs = [4, 8, 2, 2, 100]
    for h, n in enumerate(xs):
        for i in range(n):
            rows.append((len(rows), base + dt.timedelta(hours=h), "a"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["hr"]: r for r in holt_smoothing(df).collect()}
    assert len(out) == 5
    # replay the shifted-floor-div recursion in plain python
    S = 1 << 40
    level, want = None, {}
    hrs = sorted(out)
    for i, hr in enumerate(hrs):
        xm = xs[i] * 1000
        if i == 0:
            level, res = xm, 0
        else:
            res = xm - level
            level = level + (res + 4 * S) // 4 - S
        want[hr] = (level, res)
    for hr in hrs:
        assert (out[hr]["level_milli"], out[hr]["residual_milli"]) == want[hr]
    # negative residual hour (8 -> 2) must floor, not truncate
    neg = [r for r in out.values() if r["residual_milli"] < 0]
    assert neg, "expected at least one negative residual"
