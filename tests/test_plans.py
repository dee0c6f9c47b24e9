"""Physical-plan assertions for headline queries: the properties that
matter at 100 TB, checked at the plan level so a regression (lost
pushdown, broadcast turning into shuffle, range join degrading to BNLJ)
fails loudly long before it costs cluster-hours.
"""

import pytest

from meteor_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection needs 7 of 11 lineitem columns; the scan must not read text-heavy extras
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]


def test_q3_broadcasts_customer_dim(spark):
    plan = _plan(spark, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_q5_star_join_all_dims_broadcast(spark):
    plan = _plan(spark, "q5_nation_revenue")
    # supplier, nation, region all broadcast: at least 3 broadcast joins
    assert plan.count("BroadcastHashJoin") >= 3


def test_top_docs_per_lang_uses_window_group_limit(spark):
    plan = _plan(spark, "top_docs_per_lang")
    assert "WindowGroupLimit" in plan  # rank pushdown below the exchange


def test_range_join_is_not_nested_loop(spark):
    plan = _plan(spark, "purchase_click_attribution")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semi_and_anti_joins_planned_as_such(spark):
    assert "LeftSemi" in _plan(spark, "orders_with_returns")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")


def test_stratified_sample_is_shuffle_free(spark):
    plan = _plan(spark, "stratified_sample")
    assert "Exchange" not in plan  # pure filter above the scan


def test_winnowing_is_shuffle_free(spark):
    plan = _plan(spark, "winnowing_fingerprints")
    # the fingerprint derivation itself adds no exchange; the only
    # exchanges come from the summary aggregation (and the fixture
    # repartition), never a window sort
    assert "Window" not in plan
    assert "Sort" not in plan


def test_minhash_band_join_is_equi_join(spark):
    plan = _plan(spark, "minhash_near_duplicates")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_late_ships_semi_join_pushes_date_filter(spark):
    plan = _plan(spark, "order_priority_late_ships")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # date range reaches the scan
    # lineitem build side reads only its two join columns
    tail = plan.split("lineitem.parquet")[-1]
    assert "l_orderkey" in tail and "l_extendedprice" not in tail


def test_pivot_is_single_scan_with_partial_agg(spark):
    plan = _plan(spark, "orders_priority_status_pivot")
    assert plan.count("FileScan") == 1  # pinned pivot values: no distinct-values job
    assert "partial_count" in plan or "partial_pivotfirst" in plan  # map-side combine


def test_q7_dual_role_dims_broadcast_no_fact_broadcast(spark):
    plan = _plan(spark, "q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier + both nation roles
    assert "TakeOrderedAndProject" not in plan  # aggregate, not top-k


def test_q10_top20_is_take_ordered(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan
