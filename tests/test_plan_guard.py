"""Registry-wide plan-quality regression guard.

PLANS.md *records* plan features; this test *enforces* the ones that are
scale bugs if they regress:

- no CartesianProduct anywhere (an accidental cross joins a 100 TB table
  against itself);
- BroadcastNestedLoopJoin only where a side is provably tiny by
  construction (scalar aggregates, bounded literal frames) — allowlisted
  per query;
- every TPC-H query keeps parquet filter pushdown (a lost pushdown reads
  the whole fact table).

Plans are inspected unexecuted (optimizedPlan → executedPlan initial
shape), so the sweep is cheap enough to run per-commit.
"""

from __future__ import annotations

import pytest

from lachesis_spark.registry import QUERIES
from tests.conftest import SF_SMOKE

# queries whose BNLJ side is a bounded scalar/bucket table by construction
BNLJ_OK = {
    "op_percentiles",       # 1-row exact-percentile thresholds
    "tpch_q11",             # 1-row group-total scalar
    "tpch_q22",             # 1-row avg-acctbal scalar
    "lda_em", "lstm_inference",  # k×k / gate-constant matrices
    "la_inverse_identity",  # driver-side dense inverse re-entering as dim×dim
    "text_quality_filter",  # 1-row quantile threshold
    "op_correlated_subquery",  # decorrelated scalar-agg side
    "ann_bruteforce",       # broadcast 1-row query vector
    "ann_ivf",              # broadcast k-row centroid table
    "ff_inference",         # constant-size weight matrices
    # block-pair generation over the block index; all-pairs is the declared
    # test-scale configuration — production composes the LSH prefilter
    # (see llm/dedup.py scale notes)
    "dedup_embedding_cosine",
}

# streaming replays spin up the engine per call; their batch twins (win_*)
# are plan-guarded instead
SKIP = {n for n in QUERIES if n.startswith("stream_")}


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in SKIP))
def test_plan_has_no_scale_antipatterns(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: unexpected BNLJ"
    if name.startswith("tpch_"):
        assert "PushedFilters: [" in plan, f"{name}: lost parquet pushdown"
