"""Catalog-wide plan audit: NO registered query may plan a
CartesianProduct at any scale — the one join strategy that can never be
right at 100 TB. (Broadcast-of-one-row scalar joins plan as
BroadcastNestedLoopJoin with a 1-row build side and are fine; a
CartesianProduct means two real relations crossed.)"""

from __future__ import annotations

import pytest

from meteor_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# streaming queries execute a bounded stream during construction; they
# are covered (plans included) but listed here so a slow state-store
# round doesn't fail the sweep on timeout-ish flakiness grounds.
_ALL = sorted(QUERIES)


@pytest.mark.parametrize("name", _ALL)
def test_no_cartesian_product(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
