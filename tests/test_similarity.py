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
