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


def test_q05_lineitem_never_shuffles_before_agg(spark):
    """Scale check for the 6-way star join: every join against lineitem
    builds a broadcast side; the only Exchange is the final group-by."""
    df = tpch.q05(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the n_name agg


def test_q08_prunes_lineitem_columns(spark):
    """The 8-way join must not widen the fact scan: only the 5 join/measure
    columns of lineitem may be read."""
    df = tpch.q08(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "FileScan parquet" in line and "lineitem" in line:
            assert "l_tax" not in line and "l_shipdate" not in line
            break
    else:
        raise AssertionError("no lineitem scan found in plan")


def test_q21_single_fact_shuffle_key(spark):
    """The EXISTS/NOT-EXISTS pair is computed as per-order counts: the fact
    shuffles on l_orderkey only — no correlated self-join explosion."""
    df = tpch.q21(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_orderkey" in plan
    # supplier must broadcast, never sort-merge against the fact
    assert "BroadcastHashJoin" in plan
