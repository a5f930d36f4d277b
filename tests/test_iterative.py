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


def test_lda_em_is_proper_distribution(spark, duck):
    """The LDA variational-EM step's output φ'_t must be a probability
    distribution over the observed vocabulary (Σ_w φ_t(w) = 1 per topic) —
    an invariant of the word-level LDA M-step that the doc-level
    mixture-of-unigrams stand-in shared, plus the oracle gate that pins the
    word-level responsibilities themselves."""
    import pyspark.sql.functions as F

    from lachesis_spark.plans.iterative import LDA_K, lda_em
    from lachesis_spark.registry import ORACLE

    out = lda_em(spark, SF_SMOKE)
    sums = {r["topic"]: r["s"] for r in
            out.groupBy("topic").agg(F.sum("phi").alias("s")).collect()}
    assert set(sums) == set(range(LDA_K))
    for t, s in sums.items():
        assert abs(s - 1.0) < 1e-9, (t, s)
    assert_matches_oracle(out, duck, ORACLE["lda_em"])
