"""TPC-H suite parity vs DuckDB oracle at sf0.001 (fast); the driver re-runs
the same pairs at sf0.01."""

from __future__ import annotations

import pytest

from lachesis_spark.plans import tpch
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_oracle(spark, duck, name):
    df = tpch.QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, tpch.ORACLE[name])


def test_q06_plan_pushes_filters(spark):
    """Scale check: Q06's conjunctive predicate must reach the Parquet scan
    and the plan must be a single exchange-free partial/final agg."""
    df = tpch.q06(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan or "PushedFilters" in df._jdf.queryExecution().toString()


def test_q03_broadcasts_customer(spark):
    """The BUILDING-segment customer dim must broadcast, not shuffle."""
    df = tpch.q03(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
