"""Training-pipeline sampling operators: oracle parity + invariants."""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE, assert_matches_oracle

from lachesis_spark.llm import sampling as S


@pytest.mark.parametrize("name", sorted(S.QUERIES))
def test_oracle_parity(spark, duck, name):
    assert_matches_oracle(S.QUERIES[name](spark, SF_SMOKE), duck, S.ORACLE[name])


def test_bernoulli_deterministic_and_stable_under_repartition(spark):
    docs = S._docs(spark, SF_SMOKE)
    a = {r.doc_id for r in S.sample_bernoulli(docs, "doc_id", 0.25, 7).collect()}
    b = {
        r.doc_id
        for r in S.sample_bernoulli(docs.repartition(13), "doc_id", 0.25, 7).collect()
    }
    assert a == b
    n = docs.count()
    # hash-uniformity: rate within ±35% relative at this corpus size
    assert 0.25 * n * 0.65 <= len(a) <= 0.25 * n * 1.35


def test_split_is_partition_of_corpus(spark):
    docs = S._docs(spark, SF_SMOKE)
    tagged = S.assign_split(docs, "doc_id")
    per = {r.split: r.n for r in tagged.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(per) == {"train", "valid", "test"}
    assert sum(per.values()) == docs.count()
    assert per["train"] > per["valid"] and per["train"] > per["test"]


def test_stratified_exact_n_per_group(spark):
    docs = S._docs(spark, SF_SMOKE)
    got = (
        S.sample_stratified(docs, "lang", "doc_id", S.STRAT_N)
        .groupBy("lang")
        .count()
        .collect()
    )
    sizes = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert {r.lang: r["count"] for r in got} == {
        lang: min(S.STRAT_N, n) for lang, n in sizes.items()
    }


def test_packing_conserves_tokens_and_bins_are_contiguous(spark):
    from pyspark.sql import functions as F

    from lachesis_spark.functions import text as TX

    docs = S._docs(spark, SF_SMOKE)
    packed = S.pack_sequences(docs, "doc_id", TX.token_count("text")).cache()
    try:
        total = docs.select(F.sum(TX.token_count("text"))).first()[0]
        assert packed.select(F.sum("n_tok")).first()[0] == total
        # bins are 0..max contiguous within each bucket
        bins = packed.groupBy("bucket").agg(
            F.countDistinct("bin").alias("n"), F.max("bin").alias("mx")
        )
        assert all(r.n == r.mx + 1 for r in bins.collect())
        # chunk rule: a bin's tokens-before-last-doc stay under budget
        per_bin = (
            packed.groupBy("bucket", "bin")
            .agg(F.sum("n_tok").alias("t"), F.max("n_tok").alias("m"))
            .collect()
        )
        assert all(r.t - r.m < S.PACK_BUDGET for r in per_bin)
    finally:
        packed.unpersist()


def test_mixture_drops_unlisted_sources(spark):
    docs = S._docs(spark, SF_SMOKE)
    kept = S.mix_sources(docs, "source", "doc_id", {"src0": 1.0})
    assert kept.select("source").distinct().collect()[0].source == "src0"
    assert kept.count() == docs.where("source = 'src0'").count()


def test_pii_scrub_removes_every_span(spark):
    """After scrubbing, no email/phone pattern survives anywhere."""
    from pyspark.sql import functions as F

    from lachesis_spark.llm import scrub as SC

    docs = SC._docs(spark, SF_SMOKE).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach me: a.b-c_d@mail.example.org or 123-456-7890 ok"),
        ).alias("text"),
    )
    left = docs.select(
        (
            F.regexp_count(SC.scrub_text(F.col("text")), F.lit(SC.EMAIL_RE))
            + F.regexp_count(SC.scrub_text(F.col("text")), F.lit(SC.PHONE_RE))
        ).alias("n")
    )
    assert left.agg(F.sum("n")).first()[0] == 0


def test_decontaminate_oracle_and_eval_split_excluded(spark, duck):
    from lachesis_spark.llm import scrub as SC

    df = SC.decontaminate(spark, SF_SMOKE)
    assert_matches_oracle(df, duck, SC.DECONTAMINATE_SQL)


def test_weighted_sample_is_biased_toward_heavy_docs(spark):
    """The E-S sample over-represents high-weight rows: the sampled mean
    n_chars must exceed the corpus mean, and the draw is deterministic."""
    from pyspark.sql import functions as F

    docs = S._docs(spark, SF_SMOKE)
    a = S.sample_weighted(docs, "doc_id", F.col("n_chars"), 50, 7)
    b = S.sample_weighted(docs.repartition(9), "doc_id", F.col("n_chars"), 50, 7)
    ids = {r.doc_id for r in a.collect()}
    assert ids == {r.doc_id for r in b.collect()}
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_sample = a.agg(F.avg("n_chars")).first()[0]
    assert mean_sample > mean_all


def test_domain_cap_bounds_every_source_and_is_repartition_stable(spark):
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    capped = S.cap_per_domain(docs, "doc_id", "source", cap=7)
    per_src = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per_src)
    # sources with >= 7 docs are capped exactly at 7 (uniform keep, not drop-all)
    big = {
        r["source"]
        for r in docs.groupBy("source").count().collect()
        if r["count"] >= 7
    }
    assert all(r["count"] == 7 for r in per_src if r["source"] in big)
    # membership is a function of (key, domain) alone — stable under layout
    again = S.cap_per_domain(docs.repartition(13), "doc_id", "source", cap=7)
    assert sorted(r["doc_id"] for r in capped.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )


def test_dsir_selection_enriches_target_language(spark):
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    picked = S.sample_dsir(spark, SF_SMOKE)
    frac_target_corpus = (
        docs.where(F.col("lang") == S.DSIR_TARGET_LANG).count() / docs.count()
    )
    frac_target_picked = (
        picked.where(F.col("lang") == S.DSIR_TARGET_LANG).count() / picked.count()
    )
    # importance selection against an 'en' target must enrich 'en'
    assert frac_target_picked > frac_target_corpus


def test_pack_manifest_consistent_with_packing(spark):
    from lachesis_spark.llm.sampling import pack_manifest_query, pack_sequences_query
    from tests.conftest import SF_SMOKE

    manifest = {
        (r["bucket"], r["bin"]): r
        for r in pack_manifest_query(spark, SF_SMOKE).collect()
    }
    summary = {
        (r["bucket"], r["bin"]): r
        for r in pack_sequences_query(spark, SF_SMOKE).collect()
    }
    assert set(manifest) == set(summary)
    for k, m in manifest.items():
        s = summary[k]
        entries = [e.split(":") for e in m["doc_list"].split(",")]
        assert len(entries) == m["n_docs"] == s["n_docs"]
        assert sum(int(t) for _, t in entries) == m["bin_tokens"] == s["bin_tokens"]
        # ordered by pack key (doc_id) — the concat order the loader replays
        ids = [int(d) for d, _ in entries]
        assert ids == sorted(ids)


def test_pack_by_trained_tokenizer_counts(spark):
    """Pipeline composition: BPE-trained per-word token counts feed
    pack_sequences' token_count_col — packing by what the model will
    actually see, not whitespace words."""
    import os

    from pyspark.sql import functions as F

    from lachesis_spark.functions import text as TX
    from lachesis_spark.llm.sampling import pack_sequences
    from lachesis_spark.llm.training import bpe_train_n
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    _, syms = bpe_train_n(docs, 4)
    wt = syms.select("w", F.size("syms").alias("n_tok"))
    per_doc = (
        docs.select("doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("w"))
        .join(wt, "w")
        .groupBy("doc_id")
        .agg(F.sum("n_tok").alias("trained_tokens"))
    )
    packed = pack_sequences(
        per_doc, "doc_id", F.col("trained_tokens"), budget=256, n_buckets=4
    )
    assert packed.count() == per_doc.count()
    # bins are contiguous 0..max per bucket (the dense_rank densification)
    per_bucket = (
        packed.groupBy("bucket")
        .agg(F.max("bin").alias("mx"), F.count_distinct("bin").alias("nd"))
        .collect()
    )
    assert all(r["nd"] == r["mx"] + 1 for r in per_bucket)
    # subword counts sit strictly between whitespace-word and character
    # counts, so the composition is exercising real re-weighting
    ws = docs.select(F.sum(F.size(TX.tokens(F.lower(F.col("text")))))).collect()[0][0]
    chars = docs.select(
        F.sum(F.aggregate(TX.tokens(F.lower(F.col("text"))), F.lit(0),
                          lambda a, t: a + F.length(t)))
    ).collect()[0][0]
    tr = per_doc.select(F.sum("trained_tokens")).collect()[0][0]
    assert ws < tr < chars
