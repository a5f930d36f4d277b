"""Keyword-search family (llm/search.py): BM25, boolean AND, phrase match,
and the persisted bucketed-index path."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lachesis_spark.llm import search as S
from tests.conftest import SF_SMOKE


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_bm25_topk_shape_and_order(spark):
    out = S.search_bm25_topk(spark, SF_SMOKE).collect()
    assert len(out) == 20
    scores = [r["score"] for r in out]
    assert all(s > 0 for s in scores)
    # descending by score, doc_id tiebreak
    assert scores == sorted(scores, reverse=True)
    for a, b in zip(out, out[1:]):
        if a["score"] == b["score"]:
            assert a["doc_id"] < b["doc_id"]


def test_bm25_matches_python_reference(spark):
    """Exact BM25 reference over the raw text, pure Python."""
    import math

    docs = {r["doc_id"]: _py_tokens(r["text"]) for r in
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    scores = {}
    for term in S.BM25_TERMS:
        df = sum(1 for t in docs.values() if term in t)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for d, toks in docs.items():
            tf = toks.count(term)
            if tf:
                dl = len(toks)
                scores[d] = scores.get(d, 0.0) + idf * tf * (S.K1 + 1.0) / (
                    tf + S.K1 * (1 - S.B + S.B * dl / avgdl)
                )
    expect = sorted(
        ((round(s, 6), d) for d, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = [
        (r["score"], r["doc_id"])
        for r in S.search_bm25_topk(spark, SF_SMOKE).collect()
    ]
    assert got == [(s, d) for s, d in expect]


def test_keyword_and_docs_contain_all_terms(spark):
    hits = {r["doc_id"] for r in S.search_keyword_and(spark, SF_SMOKE).collect()}
    assert hits, "AND query should match at least one doc at smoke SF"
    raw = {r["doc_id"]: set(_py_tokens(r["text"])) for r in
           spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()}
    expect = {d for d, toks in raw.items() if all(t in toks for t in S.AND_TERMS)}
    assert hits == expect


def test_phrase_matches_python_reference(spark):
    got = {r["doc_id"]: r["n_occurrences"] for r in
           S.search_phrase(spark, SF_SMOKE).collect()}
    expect = {}
    for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect():
        toks = _py_tokens(r["text"])
        n = sum(
            1 for a, b in zip(toks, toks[1:]) if (a, b) == S.PHRASE
        )
        if n:
            expect[r["doc_id"]] = n
    assert got == expect


def test_persisted_index_equals_inline(spark, tmp_path):
    """index_documents + search_index == the inline one-pass query, and the
    postings set persists with its bucket layout."""
    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    S.index_documents(cat, "idx", docs, n_buckets=4)
    via_index = {
        (r["doc_id"], r["score"])
        for r in S.search_index(cat, "idx", S.BM25_TERMS, k=20).collect()
    }
    inline = {
        (r["doc_id"], r["score"])
        for r in S.search_bm25_topk(spark, SF_SMOKE).collect()
    }
    assert via_index == inline


def test_tfidf_cosine_bounded_and_sorted(spark):
    from lachesis_spark.llm.search import search_tfidf_cosine

    df = search_tfidf_cosine(spark, "/root/testdata/sf0.001").toPandas()
    assert len(df) > 0
    assert ((df.cosine > 0) & (df.cosine <= 1.0 + 1e-9)).all()
    keys = list(zip(-df.cosine, df.doc_id))
    assert keys == sorted(keys)


def test_tfidf_norms_match_manual_vector(spark):
    """One doc's norm recomputed from its raw postings equals the
    index-side norm (locks the log-tf · idf weighting)."""
    import math

    import pyspark.sql.functions as F

    from lachesis_spark.llm.search import _docs, build_postings, tfidf_doc_norms

    sf = "/root/testdata/sf0.001"
    p = build_postings(_docs(spark, sf)).cache()
    try:
        n_docs = p.select("doc_id").distinct().count()
        some_doc = p.agg(F.min("doc_id")).collect()[0][0]
        rows = p.filter(F.col("doc_id") == some_doc).collect()
        dfs = {
            r.term: r.df
            for r in p.groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .join(
                p.filter(F.col("doc_id") == some_doc).select("term"), "term", "semi"
            )
            .collect()
        }
        manual = math.sqrt(
            sum(
                ((1.0 + math.log(r.tf)) * math.log(n_docs / dfs[r.term])) ** 2
                for r in rows
            )
        )
        engine = (
            tfidf_doc_norms(p).filter(F.col("doc_id") == some_doc).collect()[0].dnorm
        )
        assert abs(manual - engine) < 1e-9 * max(1.0, manual)
    finally:
        p.unpersist()
