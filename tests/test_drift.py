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
