"""Iterative workloads: DuckDB-oracle parity plus invariants."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("name", ["pagerank", "kmeans_assign", "ff_inference"])
def test_iterative_oracle(spark, duck, name):
    from lachesis_spark.registry import ORACLE, QUERIES

    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), duck, ORACLE[name])


def test_pagerank_mass_bounded(spark):
    from lachesis_spark.plans.iterative import pagerank

    import pyspark.sql.functions as F

    total = pagerank(spark, SF_SMOKE).agg(F.sum("pr")).collect()[0][0]
    # dangling mass is dropped, so total rank is in (0, 1]
    assert 0.0 < total <= 1.0 + 1e-9


def test_kmeans_uses_k_clusters(spark):
    from lachesis_spark.plans.iterative import KM_K, kmeans_assign

    got = {r["cluster"] for r in kmeans_assign(spark, SF_SMOKE).collect()}
    assert got.issubset(set(range(KM_K))) and len(got) > 1
