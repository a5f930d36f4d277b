"""Chunk-level exact substring dedup (llm.dedup.dedup_chunks)."""

from __future__ import annotations

from lachesis_spark.llm import dedup as DD
from tests.conftest import SF_SMOKE


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_shared_chunk_detected(spark, monkeypatch):
    shared = " ".join(f"w{i}" for i in range(DD.CHUNK_W))
    uniq_a = " ".join(f"a{i}" for i in range(DD.CHUNK_W))
    uniq_b = " ".join(f"b{i}" for i in range(DD.CHUNK_W))
    docs = _mkdocs(
        spark,
        [
            # chunks [shared, uniq_a]: shared is in doc 1, uniq_a in doc 2
            # -> both duplicated -> frac 1.0
            (f"{shared} {uniq_a}", "s1"),
            # chunks [shared, uniq_b]: only shared is cross-doc -> frac 0.5
            (f"{shared} {uniq_b}", "s2"),
            # chunks [uniq_a, uniq_a]: uniq_a also in doc 0 -> frac 1.0
            (uniq_a + " " + uniq_a, "s3"),
        ],
    )
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    out = {r["source"]: r for r in DD.dedup_chunks(spark, "ignored").collect()}
    assert out["s1"]["avg_dup_chunk_frac"] == 1.0
    assert out["s2"]["avg_dup_chunk_frac"] == 0.5
    assert out["s3"]["avg_dup_chunk_frac"] == 1.0
    assert out["s2"]["n_heavy_dup"] == 1  # 0.5 >= CHUNK_HEAVY
    assert out["s1"]["n_heavy_dup"] == 1 and out["s3"]["n_heavy_dup"] == 1


def test_short_docs_excluded(spark, monkeypatch):
    docs = _mkdocs(spark, [("too short", "s1")])
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    assert DD.dedup_chunks(spark, "ignored").count() == 0


def test_dedup_recall_metric_invariants(spark):
    row = DD.dedup_recall(spark, SF_SMOKE).collect()[0]
    assert row["n_hit"] <= row["n_truth"]
    assert row["n_hit"] <= row["n_cand"]
    assert 0.0 <= row["recall"] <= 1.0
    assert 0.0 <= row["precision"] <= 1.0
    # the corpus plants exact duplicates, so truth pairs must exist and the
    # 8-band full-minhash LSH must catch jaccard>=0.8 pairs near-perfectly
    assert row["n_truth"] > 0
    assert row["recall"] >= 0.9


def test_fracs_bounded_on_corpus(spark):
    rows = DD.dedup_chunks(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_dup_chunk_frac"] <= 1.0
        assert 0 <= r["n_heavy_dup"] <= r["n_docs"]


def test_soft_dedup_weights_sum_to_effective_copies(spark):
    """SoftDeDup invariant: a content duplicated k times contributes total
    weight k * k^-alpha (= 1 at alpha=1) — duplicated text collapses to
    ~one effective copy, unique text keeps weight 1."""
    rows = [(i, "srcA", "same text", 9) for i in range(5)] + [
        (10, "srcB", "unique one", 10),
        (11, "srcB", "unique two", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    monkey = {"spark": None}

    import unittest.mock as mock

    with mock.patch.object(DD, "_docs", lambda spark, sf_dir, **kw: docs):
        out = {r["source"]: r for r in DD.dedup_soft(spark, "x").collect()}
    assert out["srcA"]["n_docs"] == 5
    assert abs(out["srcA"]["effective_docs"] - 1.0) < 1e-6
    assert abs(out["srcA"]["effective_chars"] - 9.0) < 1e-6
    assert out["srcB"]["n_docs"] == 2
    assert abs(out["srcB"]["effective_docs"] - 2.0) < 1e-6


# -- dedup_paragraphs: the REMOVAL form (CCNet paragraph dedup) -------------
def test_paragraph_removal_strips_shared_units_from_all_docs(spark, monkeypatch):
    import hashlib

    shared = " ".join(f"w{i}" for i in range(DD.CHUNK_W))
    uniq_a = " ".join(f"a{i}" for i in range(DD.CHUNK_W))
    uniq_b = " ".join(f"b{i}" for i in range(DD.CHUNK_W))
    docs = _mkdocs(
        spark,
        [
            (f"{uniq_a} {shared}", "s1"),   # keeps uniq_a, loses shared
            (f"{shared} {uniq_b}", "s2"),   # keeps uniq_b, loses shared
            (shared, "s3"),                 # loses its only unit -> empty
        ],
    )
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    out = {r["doc_id"]: r for r in DD.dedup_paragraphs(spark, "ignored").collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # the shared unit is removed from EVERY document holding it
    assert (out[0]["n_kept"], out[0]["n_removed"]) == (1, 1)
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (1, 1)
    assert (out[2]["n_kept"], out[2]["n_removed"]) == (0, 1)
    # reassembly is byte-exact and ordered
    assert out[0]["cleaned_md5"] == md5(uniq_a)
    assert out[1]["cleaned_md5"] == md5(uniq_b)
    assert out[2]["cleaned_md5"] == md5("")


def test_paragraph_removal_preserves_order(spark, monkeypatch):
    import hashlib

    shared = " ".join(f"w{i}" for i in range(DD.CHUNK_W))
    u = [" ".join(f"u{k}_{i}" for i in range(DD.CHUNK_W)) for k in range(3)]
    docs = _mkdocs(
        spark,
        [
            # kept units must come back in document order u0 u1 u2,
            # with the shared unit excised from the middle
            (f"{u[0]} {shared} {u[1]} {u[2]}", "s1"),
            (shared, "s2"),
        ],
    )
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    out = {r["doc_id"]: r for r in DD.dedup_paragraphs(spark, "ignored").collect()}
    expect = " ".join([u[0], u[1], u[2]])
    assert out[0]["cleaned_md5"] == hashlib.md5(expect.encode()).hexdigest()
    assert out[0]["n_kept"] == 3 and out[0]["n_removed"] == 1


# -- dedup_bloom_probe: Bloom membership pre-filter -------------------------
def test_bloom_probe_never_misses_a_true_duplicate(spark):
    """The Bloom guarantee: every probe unit whose hash IS in the base
    index must be flagged maybe-seen, so n_true_seen (counted only inside
    the maybe subset) equals the exact cross-half overlap computed
    independently."""
    import pyspark.sql.functions as F

    out = DD.dedup_bloom_probe(spark, SF_SMOKE)
    got = out.agg(F.sum("n_true_seen")).first()[0]

    docs = DD._docs(spark, SF_SMOKE)
    from lachesis_spark.functions import hashing as H, text as TX
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("t")).where(
        F.size("t") >= DD.CHUNK_W
    )
    units = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(size(t) / {DD.CHUNK_W} AS INT) - 1),"
                f" i -> array_join(slice(t, i * {DD.CHUNK_W} + 1, {DD.CHUNK_W}), ' '))"
            )
        ).alias("idx", "unit"),
    ).select("doc_id", "idx", H.h60(F.col("unit")).alias("ch"))
    base = units.where(F.col("doc_id") % 2 == 0).select("ch").distinct()
    probe = units.where(F.col("doc_id") % 2 == 1)
    exact = probe.join(base, "ch", "left_semi").count()
    assert got == exact


def test_bloom_probe_flags_shared_chunk(spark, monkeypatch):
    shared = " ".join(f"w{i}" for i in range(DD.CHUNK_W))
    uniq = " ".join(f"u{i}" for i in range(DD.CHUNK_W))
    docs = _mkdocs(
        spark,
        [
            (shared, "s1"),            # doc 0 (even) -> index
            (f"{shared} {uniq}", "s2"),  # doc 1 (odd) -> probe
        ],
    )
    monkeypatch.setattr(DD, "_docs", lambda spark, sf_dir, **kw: docs)
    row = {r["source"]: r for r in DD.dedup_bloom_probe(spark, "ignored").collect()}
    assert row["s2"]["n_units"] == 2
    assert row["s2"]["n_true_seen"] == 1          # the shared unit
    assert row["s2"]["n_maybe_seen"] >= 1         # bloom can only over-flag
    assert row["s2"]["n_false_pos"] == row["s2"]["n_maybe_seen"] - 1


def test_anti_join_bloom_equivalence(spark):
    """anti_join_bloom must be row-identical to the plain left-anti join —
    on the real corpus split, both for the screened helper and the
    use_bloom route through dedup_incremental."""
    plain = {tuple(r) for r in DD.dedup_incremental(spark, SF_SMOKE).collect()}
    bloomed = {
        tuple(r)
        for r in DD.dedup_incremental(spark, SF_SMOKE, use_bloom=True).collect()
    }
    assert plain == bloomed and plain


def test_containment_candidates_path_matches_allpairs_on_lsh_pairs(spark):
    """The production (candidates=) path must agree with the all-pairs form
    wherever they overlap: every candidate pair's containment is identical."""
    import pyspark.sql.functions as F

    from lachesis_spark.llm import dedup

    sf = "/root/testdata/sf0.001"
    cand = dedup.dedup_minhash_lsh(spark, sf)
    prod = dedup.containment_pairs(spark, sf, k=50, candidates=cand)
    full = dedup.containment_pairs(spark, sf, k=10**6)
    joined = prod.alias("p").join(
        full.alias("f"), ["src_id", "dst_id"], "inner"
    ).filter(F.abs(F.col("p.containment") - F.col("f.containment")) > 1e-12)
    assert joined.count() == 0


def test_containment_is_asymmetric_and_bounded(spark):
    from lachesis_spark.llm import dedup

    sf = "/root/testdata/sf0.001"
    df = dedup.containment_pairs(spark, sf, k=40).toPandas()
    assert ((df.containment > 0) & (df.containment <= 1.0)).all()
    # directions are distinct rows
    assert not df.duplicated(subset=["src_id", "dst_id"]).any()


def test_containment_prefix_topk_equals_allpairs_topk(spark):
    """The prefix-filter registry plan is EXACT: its top-k must be row-
    identical (values and order) to the all-pairs inverted-index top-k,
    both at the first-threshold early exit (k=20 terminates at t=0.875
    on this corpus) and through the full threshold descent to the t=0
    backstop (k large enough that no threshold holds k pairs)."""
    from lachesis_spark.llm import dedup

    sf = "/root/testdata/sf0.001"
    for k in (20, 500):
        pref = [tuple(r) for r in dedup.containment_topk_prefix(spark, sf, k=k).collect()]
        full = [tuple(r) for r in dedup.containment_pairs(spark, sf, k=k).collect()]
        assert pref == full and pref


def test_containment_prefix_finds_asymmetric_pair_bands_miss(spark, tmp_path):
    """The reason the prefix plan holds the registry seat: an extreme-
    asymmetry pair (tiny src fully contained in a huge dst) has
    containment 1.0 but near-zero Jaccard, so the MinHash band scheme —
    which recalls by Jaccard — misses it, while the prefix bound (a
    counting argument on the src side alone) cannot."""
    from lachesis_spark.llm import dedup

    small = "alpha bravo charlie delta echo"
    filler = " ".join(f"w{i:04d} w{i:04d}x" for i in range(400))
    big = small + " " + filler
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words here only")],
        "doc_id bigint, text string",
    )
    sf = str(tmp_path / "asym")
    docs.write.parquet(f"{sf}/documents.parquet")

    # the band scheme misses the pair on this (deterministic) corpus ...
    lsh = {tuple(r) for r in dedup.dedup_minhash_lsh(spark, sf).collect()}
    assert (1, 2) not in lsh
    # ... the exact prefix plan finds it, at full containment, first row
    top = dedup.containment_topk_prefix(spark, sf, k=1).collect()
    assert [tuple(r) for r in top] == [(1, 2, 1.0)]


def test_containment_descent_custom_thresholds_always_returns_df(spark):
    """A caller-supplied threshold schedule that omits the t=0.0 backstop
    (e.g. a single t=1.0 pass) used to fall off the descent loop and
    return None when no pass accumulated k pairs; the descent now appends
    the backstop, so every call path yields the exact global top-k."""
    from lachesis_spark.llm import dedup

    sf = "/root/testdata/sf0.001"
    # k=500 exceeds the pairs at every t>0 on this corpus, so a (1.0,)-only
    # schedule reaches the appended backstop; result must equal all-pairs.
    got = dedup.containment_topk_prefix(spark, sf, k=500, thresholds=(1.0,))
    assert got is not None
    pref = [tuple(r) for r in got.collect()]
    full = [tuple(r) for r in dedup.containment_pairs(spark, sf, k=500).collect()]
    assert pref == full and pref


def test_containment_descent_backstop_optout_bounds_cost(spark):
    """backstop=False bounds the descent to the scheduled thresholds
    exactly (ADVICE r10: the silently appended t=0.0 pass turned a
    deliberately bounded schedule into the quadratic all-pairs plan).
    A (1.0,)-only schedule with k larger than the full-containment pair
    count must return ONLY the t>=1.0 pairs — fewer than k, never the
    all-pairs result."""
    from lachesis_spark.llm import dedup

    sf = "/root/testdata/sf0.001"
    got = dedup.containment_topk_prefix(
        spark, sf, k=500, thresholds=(1.0,), backstop=False
    )
    rows = [tuple(r) for r in got.collect()]
    assert rows and len(rows) < 500
    assert all(r[2] >= 1.0 for r in rows)
    # identical to the all-pairs top-k RESTRICTED to full containment
    full = [
        tuple(r)
        for r in dedup.containment_pairs(spark, sf, k=500).collect()
        if r[2] >= 1.0
    ]
    assert rows == full
