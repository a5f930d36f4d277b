"""Round-6 corpus-analysis ops: perplexity curriculum binning and Zipf
diagnostics (semantics beyond the oracle hash check)."""

from __future__ import annotations

from lachesis_spark.llm import textstats as TS
from tests.conftest import SF_SMOKE


def test_ppl_buckets_are_quartiles(spark):
    rows = {r["bucket"]: r for r in TS.text_ppl_buckets(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1, 2, 3}
    counts = [rows[b]["n_docs"] for b in range(4)]
    total = sum(counts)
    # exact quartile thresholds -> each bin holds ~25% (ties can shift a
    # few docs across a boundary, never a skewed split)
    assert all(abs(c - total / 4) <= max(2, total * 0.05) for c in counts), counts
    # buckets are ordered by score: every doc in bucket b scores below
    # every doc in bucket b+1 (min/max ranges must not overlap)
    for b in range(3):
        assert rows[b]["max_lp"] <= rows[b + 1]["min_lp"]


def test_zipf_fit_shape(spark):
    r = TS.text_zipf(spark, SF_SMOKE).first()
    assert r["top_n"] <= TS.ZIPF_TOP
    assert 0 < r["vocab_size"]
    assert r["top_cnt"] <= r["total_tokens"]
    # rank-frequency slope of any natural-ish corpus is negative
    assert r["slope"] < 0
    # the fitted line at rank 1 (ln rank = 0) predicts ~ln(top count):
    # intercept should be within an order of magnitude of it
    import math

    assert abs(r["intercept"] - math.log(r["top_cnt"])) < 3.0


def test_bigram_ppl_bounds(spark):
    from lachesis_spark.llm.textstats import text_bigram_ppl

    df = text_bigram_ppl(spark, "/root/testdata/sf0.001").toPandas()
    assert len(df) > 0
    # perplexity of an add-k bigram LM over V words lies in [1, V + slack]
    assert (df.ppl >= 1.0).all()
    assert (df.mean_lp < 0).all()


def test_langid_ngram_lambda_binding_evaluates_text_once(spark):
    """Round-11 ADVICE regression guard: text_langid_ngram's once-per-row
    evaluation relies on CollapseProject being unable to inline
    projections into lambda bindings (transform over a 1-element array).
    A Spark upgrade that learns to inline lambda-bound expressions would
    silently restore per-trigram re-evaluation of lower(text) /
    char_trigrams with no correctness signal — so pin the optimized
    plan shape: exactly one lower(text#N) occurrence."""
    import re

    from tests.conftest import SF_SMOKE
    from lachesis_spark.llm.textstats import text_langid_ngram

    df = text_langid_ngram(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_lower = len(re.findall(r"lower\(text#\d+\)", plan))
    assert n_lower == 1, (
        f"lower(text) inlined {n_lower}x — lambda-binding barrier defeated:\n"
        + plan[:2000]
    )
