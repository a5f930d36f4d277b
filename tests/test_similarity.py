"""JL random projection (llm.similarity.project_embeddings /
ann_jl_distortion)."""

from __future__ import annotations

import pyspark.sql.functions as F

from lachesis_spark.llm import similarity as S
from tests.conftest import SF_SMOKE


def test_projection_is_map_side_only(spark):
    """The projection is a pure codegen expression — its plan must contain
    no Exchange (shuffle) at all."""
    emb = S._emb(spark, SF_SMOKE)
    plan = project = S.project_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_projection_width_and_determinism(spark):
    out = S.project_embeddings(S._emb(spark, SF_SMOKE)).collect()
    assert all(len(r["proj"]) == S.JL_D_OUT for r in out)
    again = S.project_embeddings(S._emb(spark, SF_SMOKE)).collect()
    assert {r["vec_id"]: tuple(r["proj"]) for r in out} == {
        r["vec_id"]: tuple(r["proj"]) for r in again
    }


def test_jl_distortion_matches_theory(spark):
    """JL with d_out=16: squared-distance ratios concentrate around 1 —
    the mean must be near 1 and the bulk inside +/-50%."""
    row = S.ann_jl_distortion(spark, SF_SMOKE).first()
    assert row["n_pairs"] > 100
    assert 0.85 <= row["mean_ratio"] <= 1.15
    assert row["frac_within_50pct"] >= 0.75
    assert row["min_ratio"] > 0


def test_jl_rerank_recall_vs_exact(spark):
    """The two-tier JL search must recover most of the exact top-k (JL
    with 4x over-fetch on these embeddings): recall@10 >= 0.7, and every
    returned cosine must be exact (full-width re-rank)."""
    exact = {r["vec_id"]: r["cos"] for r in S.ann_bruteforce(spark, SF_SMOKE).collect()}
    jl = {r["vec_id"]: r["cos"] for r in S.ann_jl_rerank(spark, SF_SMOKE).collect()}
    hit = set(exact) & set(jl)
    assert len(hit) >= 6, (sorted(exact), sorted(jl))
    for v in hit:
        assert abs(exact[v] - jl[v]) < 1e-12


def test_sq8_error_small_and_recall_high(spark):
    """SQ8 with 255 levels on 64 dims: per-hit cosine estimate within 0.05
    of exact, and the quantized top-10 recovers most of the exact top-10."""
    rows = S.ann_sq8(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["sq8_err"] <= 0.05, r
        assert r["cos_exact"] == round(r["cos_exact"], 6)
    exact = {r["vec_id"] for r in S.ann_bruteforce(spark, SF_SMOKE).collect()}
    got = {r["vec_id"] for r in rows}
    assert len(exact & got) >= 7, (sorted(exact), sorted(got))
