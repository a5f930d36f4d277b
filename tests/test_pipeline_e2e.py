"""End-to-end operational-loop test: streaming ingest → incremental
content dedup → corpus + hash-index maintenance.

This is the composed "100 TB/day" pattern the module docs claim
(llm/dedup.py dedup_incremental, streaming/stream.py write_stream_merge,
catalog merge/snapshot): each day's batch streams in exactly-once, is
admitted against the corpus's 16-byte content-hash index (corpus text never
re-read), and the corpus + index advance incrementally.  The test drives
three "days" through the real streaming engine and asserts the corpus
never admits previously-seen content — including a day that is 100%
redelivered duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lachesis_spark.catalog import Catalog
from lachesis_spark.streaming import stream as S


def _batch(spark, rows):
    """rows: list of (doc_id, text)."""
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("content_hash", F.md5("text"))


def _ingest_day(spark, cat, batch_df, tmp_path, day):
    """Stream the day's batch exactly-once into staging, admit new content
    against the index, merge admitted docs into the corpus, update index.
    Returns the number of admitted documents."""
    src_dir = str(tmp_path / f"src_day{day}")
    batch_df.write.mode("overwrite").parquet(src_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(src_dir)
    with S._state_partitions(spark):
        S.write_stream_merge(
            stream_df, cat, "corp", f"staging_d{day}", ["doc_id"],
            str(tmp_path / f"ck_d{day}"),
        )
    staged = cat.read_set("corp", f"staging_d{day}")

    if cat.exists_set("corp", "index"):
        index = cat.read_set("corp", "index")
        admitted = (
            staged.groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"))
            .join(index, "content_hash", "left_anti")
            .join(staged.drop("content_hash"), "doc_id")
        )
    else:
        admitted = staged.groupBy("content_hash").agg(
            F.min("doc_id").alias("doc_id")
        ).join(staged.drop("content_hash"), "doc_id")
    n = admitted.count()
    if n:
        cat.merge_set(admitted, "corp", "corpus", ["content_hash"])
        cat.merge_set(
            admitted.select("content_hash"), "corp", "index", ["content_hash"]
        )
    return n


def test_streaming_ingest_incremental_dedup_loop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_database("corp")

    # day 1: 4 unique docs (one in-batch duplicate pair -> 3 contents)
    d1 = _batch(spark, [(1, "alpha beta"), (2, "gamma delta"),
                        (3, "alpha beta"), (4, "epsilon zeta")])
    assert _ingest_day(spark, cat, d1, tmp_path, 1) == 3
    assert cat.read_set("corp", "corpus").count() == 3
    v1 = cat.snapshot_set("corp", "corpus")

    # day 2: 2 new contents + 1 replay of day-1 content under a NEW doc_id
    d2 = _batch(spark, [(10, "eta theta"), (11, "alpha beta"),
                        (12, "iota kappa")])
    assert _ingest_day(spark, cat, d2, tmp_path, 2) == 2
    assert cat.read_set("corp", "corpus").count() == 5
    assert cat.read_set("corp", "index").count() == 5

    # day 3: full redelivery of days 1-2 (new ids, all duplicate content)
    d3 = _batch(spark, [(20, "alpha beta"), (21, "gamma delta"),
                        (22, "eta theta"), (23, "iota kappa"),
                        (24, "epsilon zeta")])
    assert _ingest_day(spark, cat, d3, tmp_path, 3) == 0
    assert cat.read_set("corp", "corpus").count() == 5

    # the corpus is reproducible: day-1 snapshot still reads 3 docs
    assert cat.read_set("corp", "corpus", version=v1).count() == 3

    # corpus contents are exactly the distinct content set ever ingested
    contents = {
        r["text"] for r in cat.read_set("corp", "corpus").select("text").collect()
    }
    assert contents == {"alpha beta", "gamma delta", "epsilon zeta",
                        "eta theta", "iota kappa"}


def test_near_dup_state_advances_incrementally_through_catalog(spark, tmp_path):
    """Second operational loop: the NEAR-dup state (MinHash signature index
    + component label table) persists in the catalog and advances per
    batch via dedup_incremental_near — after three days the incrementally
    maintained labels equal a full convergent recompute over everything
    ingested."""
    from pyspark.sql import functions as F

    from lachesis_spark.llm import dedup as D

    cat = Catalog(spark, str(tmp_path / "wh2"))
    cat.create_database("near")

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    days = [
        [(1, base), (2, base + " today"), (3, "completely different words about spark shuffles and joins here")],
        [(10, base + " again"), (11, "completely different words about spark shuffles and joins here please")],
        [(20, base), (21, "unrelated fresh content with enough tokens to form many shingles indeed")],
    ]
    all_rows = [r for day in days for r in day]

    def frame(rows):
        return spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    for day, rows in enumerate(days, start=1):
        sig_prev = (
            cat.read_set("near", "sig_index") if cat.exists_set("near", "sig_index") else None
        )
        lab_prev = (
            cat.read_set("near", "labels") if cat.exists_set("near", "labels") else None
        )
        new_sig, labels = D.dedup_incremental_near(sig_prev, lab_prev, frame(rows))
        # labels are eager (cc_converged materializes); persist state for the
        # next day BEFORE overwriting the index the signatures derive from
        rows_lab = labels.collect()
        cat.write_set(
            spark.createDataFrame(rows_lab, labels.schema)
            if rows_lab else labels.limit(0),
            "near", "labels",
        )
        cat.write_set(new_sig, "near", "sig_index", mode="append")

    incr = {
        r["doc_id"]: r["canonical_id"]
        for r in cat.read_set("near", "labels").collect()
    }
    # ground truth: convergent CC over the band-join pairs of EVERYTHING
    sig = D.minhash_signatures_from(D.shingled_from(frame(all_rows)))
    a = sig.select(F.col("doc_id").alias("a_id"), "band", "minhash")
    b = sig.select(F.col("doc_id").alias("b_id"), F.col("band").alias("band2"),
                   F.col("minhash").alias("minhash2"))
    pairs = (
        a.join(b, (F.col("band") == F.col("band2"))
               & (F.col("minhash") == F.col("minhash2")))
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    full = {r["doc_id"]: r["canonical_id"] for r in D.cc_converged(pairs).collect()}
    assert incr == full
    # and the exact-duplicate pair across days landed in one component
    assert incr[20] == incr[1]


def test_span_gram_index_advances_through_catalog(spark, tmp_path):
    """Third operational loop: the duplicate-span GRAM index persists in
    the catalog and advances per batch — each day's batch is cleaned
    against the index via span_incremental_stats, the index is merged
    with the batch's distinct grams, and after three days the merged
    index is gram-identical to a fresh rebuild over everything ingested
    (so the loop never diverges from the batch recompute)."""
    import hashlib

    from lachesis_spark.functions import text as TX
    from lachesis_spark.llm import dedup as D

    k = 3
    cat = Catalog(spark, str(tmp_path / "wh3"))
    cat.create_database("span")
    boiler = "click here to subscribe"
    days = [
        [(1, f"fresh alpha content {boiler}"), (2, "other beta words entirely")],
        [(10, f"{boiler} new gamma text"), (11, "zeta eta theta iota")],
        [(20, f"more delta stuff {boiler}"), (21, "zeta eta theta iota")],
    ]

    def frame(rows):
        return spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def toks(df):
        return df.select(
            "doc_id", TX.tokens(F.col("text")).alias("t")
        ).where(F.size("t") >= k)

    outs = {}
    for day, rows in enumerate(days, start=1):
        bt = toks(frame(rows)).localCheckpoint(eager=False)
        idx = (
            cat.read_set("span", "gram_index")
            if cat.exists_set("span", "gram_index")
            else spark.createDataFrame([], "gh long")
        )
        outs[day] = {
            r["doc_id"]: r
            for r in D.span_incremental_stats(bt, idx, k).collect()
        }
        new_grams = D._gram_stream(bt, k).select("gh").distinct()
        cat.merge_set(new_grams, "span", "gram_index", ["gh"])

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # day 1: empty index, no internal repetition -> everything untouched
    assert outs[1][1]["n_spans"] == 0 and outs[1][2]["n_spans"] == 0
    # day 2: doc 10 leads with day-1 boilerplate -> its two overlapping
    # k-grams merge to ONE 4-token span, the rest survives in order
    assert outs[2][10]["n_spans"] == 1
    assert outs[2][10]["tokens_removed"] == 4
    assert outs[2][10]["cleaned_md5"] == md5("new gamma text")
    assert outs[2][11]["n_spans"] == 0
    # day 3: doc 21 redelivers day-2 content verbatim -> fully excised
    assert outs[3][21]["tokens_kept"] == 0
    assert outs[3][21]["cleaned_md5"] == md5("")
    assert outs[3][20]["cleaned_md5"] == md5("more delta stuff")
    # loop-vs-recompute invariant: the catalog-merged index == a fresh
    # gram rebuild over all three days
    fresh = (
        D._gram_stream(toks(frame([r for d in days for r in d])), k)
        .select("gh")
        .distinct()
    )
    merged = cat.read_set("span", "gram_index")
    assert merged.count() == fresh.count()
    assert merged.join(fresh, "gh", "left_anti").count() == 0
