"""Duplicate-SPAN removal (llm.dedup.dedup_span_removal) — exact-substring
dedup at overlapping n-gram granularity with gaps-and-islands interval
merge (Lee et al. 2022 semantics, all-occurrences variant)."""

from __future__ import annotations

import hashlib

from lachesis_spark.llm import dedup as DD

K = DD.SPAN_K


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(spark, monkeypatch, texts):
    docs = _mkdocs(spark, texts)
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    return {
        r["doc_id"]: r for r in DD.dedup_span_removal(spark, "ignored").collect()
    }


def test_shared_gram_removed_from_both(spark, monkeypatch):
    shared = [f"w{i}" for i in range(K)]
    a_pre, b_post = ["a0", "a1"], ["b0", "b1"]
    out = _run(
        spark,
        monkeypatch,
        [" ".join(a_pre + shared), " ".join(shared + b_post)],
    )
    assert out[0]["n_spans"] == 1 and out[0]["tokens_removed"] == K
    assert out[1]["n_spans"] == 1 and out[1]["tokens_removed"] == K
    # every occurrence goes (order-free variant), survivors keep order
    assert out[0]["cleaned_md5"] == _md5(" ".join(a_pre))
    assert out[1]["cleaned_md5"] == _md5(" ".join(b_post))


def test_overlapping_grams_merge_to_one_span(spark, monkeypatch):
    # a shared (K+1)-token run yields two overlapping K-grams -> ONE
    # merged span covering all K+1 tokens
    run = [f"r{i}" for i in range(K + 1)]
    out = _run(
        spark,
        monkeypatch,
        ["x0 " + " ".join(run), " ".join(run) + " y0"],
    )
    for d, kept in ((0, "x0"), (1, "y0")):
        assert out[d]["n_spans"] == 1
        assert out[d]["tokens_removed"] == K + 1
        assert out[d]["cleaned_md5"] == _md5(kept)


def test_disjoint_spans_stay_separate(spark, monkeypatch):
    # two shared K-grams separated by >1 unique tokens -> two islands
    s1 = [f"p{i}" for i in range(K)]
    s2 = [f"q{i}" for i in range(K)]
    gap = ["u0", "u1", "u2"]
    out = _run(
        spark,
        monkeypatch,
        [" ".join(s1 + gap + s2), " ".join(s1 + ["v0"] + s2)],
    )
    assert out[0]["n_spans"] == 2
    assert out[0]["tokens_removed"] == 2 * K
    assert out[0]["cleaned_md5"] == _md5(" ".join(gap))
    assert out[1]["cleaned_md5"] == _md5("v0")


def test_intra_doc_repetition_counts(spark, monkeypatch):
    # the same K-gram twice within ONE doc is >1 occurrence corpus-wide
    g = [f"g{i}" for i in range(K)]
    out = _run(spark, monkeypatch, [" ".join(g + ["mid"] + g)])
    assert out[0]["tokens_removed"] == 2 * K
    assert out[0]["cleaned_md5"] == _md5("mid")


def test_clean_doc_untouched_and_full_removal(spark, monkeypatch):
    uniq = [f"c{i}" for i in range(K + 2)]
    dup = [f"d{i}" for i in range(K)]
    out = _run(
        spark, monkeypatch, [" ".join(uniq), " ".join(dup), " ".join(dup)]
    )
    assert out[0]["n_spans"] == 0 and out[0]["tokens_removed"] == 0
    assert out[0]["cleaned_md5"] == _md5(" ".join(uniq))
    # docs 1/2 are entirely a duplicated gram -> everything removed
    for d in (1, 2):
        assert out[d]["tokens_kept"] == 0
        assert out[d]["cleaned_md5"] == _md5("")


def test_short_docs_excluded(spark, monkeypatch):
    out = _run(spark, monkeypatch, [" ".join(f"s{i}" for i in range(K - 1))])
    assert out == {}


def test_clean_form_rewrites_and_preserves_columns(spark):
    shared = [f"w{i}" for i in range(K)]
    docs = _mkdocs(
        spark,
        [
            " ".join(["a0"] + shared),
            " ".join(shared + ["b0"]),
            "short doc",  # < K tokens: passes through untouched
        ],
    )
    got = DD.span_removal_clean(docs)
    assert got.columns == docs.columns
    out = {r["doc_id"]: r for r in got.collect()}
    assert out[0]["text"] == "a0" and out[0]["n_chars"] == 2
    assert out[1]["text"] == "b0"
    assert out[2]["text"] == "short doc"
    assert out[2]["n_chars"] == len("short doc")
    assert out[0]["lang"] == "en" and out[0]["source"] == "s"


def test_clean_form_md5_matches_query_form(spark, monkeypatch):
    """Every span-SCANNED doc (>= K tokens) — spanned or untouched, even
    with irregular whitespace — comes out token-normalized and md5-equal
    to the query form's cleaned_md5."""
    shared = [f"z{i}" for i in range(K + 3)]
    texts = [
        " ".join(["p0", "p1"] + shared),
        " ".join(shared + ["q0"]),
        " ".join(f"u{i}" for i in range(K + 1)),
        # untouched doc with DOUBLE spaces: normalized, not passed raw
        "  ".join(f"w{i}" for i in range(K + 2)),
    ]
    docs = _mkdocs(spark, texts)
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    query = {
        r["doc_id"]: r["cleaned_md5"]
        for r in DD.dedup_span_removal(spark, "ignored").collect()
    }
    clean = {
        r["doc_id"]: _md5(r["text"])
        for r in DD.span_removal_clean(docs).collect()
    }
    for d in query:
        assert clean[d] == query[d]


def test_incremental_only_cleans_batch_against_index(spark, monkeypatch):
    # doc below INCR_SPLIT = established corpus (index side, not emitted);
    # docs above = incoming batch
    shared = [f"ix{i}" for i in range(K)]
    b_dup = [f"bd{i}" for i in range(K)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(shared + ["old0"]), "en", "s", 0),
            (DD.INCR_SPLIT + 1, " ".join(["n0"] + shared), "en", "s", 0),
            (DD.INCR_SPLIT + 2, " ".join(b_dup + ["n1"] + b_dup), "en", "s", 0),
            (DD.INCR_SPLIT + 3, " ".join(f"u{i}" for i in range(K)), "en", "s", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    out = {
        r["doc_id"]: r
        for r in DD.dedup_span_incremental(spark, "ignored").collect()
    }
    assert set(out) == {DD.INCR_SPLIT + 1, DD.INCR_SPLIT + 2, DD.INCR_SPLIT + 3}
    # batch gram seen in the index -> removed from the batch doc
    assert out[DD.INCR_SPLIT + 1]["cleaned_md5"] == _md5("n0")
    # batch-internal repetition -> removed even though the index never saw it
    assert out[DD.INCR_SPLIT + 2]["cleaned_md5"] == _md5("n1")
    # unseen unique content untouched
    assert out[DD.INCR_SPLIT + 3]["n_spans"] == 0


def test_incremental_equals_full_recompute_on_batch(spark):
    """The operational invariant: cleaning the batch against the corpus's
    gram index produces byte-identical results to re-running the full
    batch recompute over the union — on the real corpus."""
    from tests.conftest import SF_SMOKE

    full = {
        r["doc_id"]: tuple(r)
        for r in DD.dedup_span_removal(spark, SF_SMOKE).collect()
        if r["doc_id"] >= DD.INCR_SPLIT
    }
    incr = {
        r["doc_id"]: tuple(r)
        for r in DD.dedup_span_incremental(spark, SF_SMOKE).collect()
    }
    assert incr == full
