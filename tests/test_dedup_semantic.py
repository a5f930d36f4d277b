"""SemDeDup invariants: cluster pruning is sound (never invents pairs) and
recalls the within-cluster share of the all-pairs ground truth."""

import os

from conftest import SF_SMOKE

from lachesis_spark.llm import dedup as D


def _pairs(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_semantic_pairs_subset_of_all_pairs_gemm(spark):
    sem = _pairs(D.dedup_semantic(spark, SF_SMOKE))
    full = _pairs(D.dedup_embedding_cosine(spark, SF_SMOKE))
    assert sem, "semantic dedup found no pairs on smoke data"
    # pruning to within-cluster can only drop cross-cluster pairs
    assert sem <= full


def test_semantic_blocking_invariant_to_block_size(spark):
    a = _pairs(D.dedup_semantic(spark, SF_SMOKE, block_rows=64))
    b = _pairs(D.dedup_semantic(spark, SF_SMOKE, block_rows=4096))
    assert a == b
