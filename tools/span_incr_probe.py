"""Per-batch cost of incremental duplicate-span removal as the gram index
grows — the operational claim under test: `dedup_span_incremental`'s batch
cost is governed by the BATCH (its own gram stream, its internal count,
and one membership join against the index), not by re-reading the
historical corpus, so a growing index must cost ~flat per batch (modulo
the membership join's build side, an 8-byte-row equi-join that broadcasts
or buckets at scale).

Protocol (mirrors tools/incr_neardup_probe.py): a FIXED batch (sf0.01
documents, ids shifted to be new) is cleaned against gram indexes built
from corpora of increasing size — sf0.01 (×1), sf0.1 (×10), and the
token-decorated ×10/×100 copies of sf0.1 (×100/×1000) from
tools/scale_probe.py's build.  Per index size we time one full batch step
steady-state (median of 3 after one warm-up) and report the scaling
exponent e = log(t_big/t_small) / log(size_big/size_small); e ≪ 1 = the
flat-batch claim holds.

Each index size is timed TWICE: against a flat checkpointed index (the
membership join broadcasts while the index fits, then falls back to
shuffling the index side every batch) and against a BUCKETED persisted
index (catalog.write_set(bucket_by=(32, [gh])) — the one-time layout the
advisor would choose for a table joined on the same key every day, which
removes the index-side exchange from every subsequent batch).

Usage: python tools/span_incr_probe.py [x10_dir [x100_dir]]
(defaults /tmp/scale_span10 /tmp/scale_span100 — documents-only
decorrelated builds).  Prints a markdown table; paste into SCALE.md.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lachesis_spark.functions import text as TX
from lachesis_spark.llm import dedup as D
from lachesis_spark.session import get_spark


def _toks(docs, k):
    return docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("t")
    ).where(F.size("t") >= k)


def build_index(spark, docs, k):
    """The persisted state: distinct gram hashes of the corpus."""
    return (
        D._gram_stream(_toks(docs, k), k)
        .select("gh")
        .distinct()
        .localCheckpoint(eager=True)
    )


def batch_step(batch_toks, idx, k):
    D.span_incremental_stats(batch_toks, idx, k).write.format("noop").mode(
        "overwrite"
    ).save()


def main() -> None:
    k = D.SPAN_K
    x10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_span10"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_span100"
    spark = get_spark("span_incr_probe")

    corpora = [("x1", "/root/testdata/sf0.01"), ("x10", "/root/testdata/sf0.1")]
    for label, d in (("x100", x10), ("x1000", x100)):
        if os.path.isdir(os.path.join(d, "documents.parquet")):
            corpora.append((label, d))

    batch = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000_000))
    )
    batch_toks = _toks(batch, k).localCheckpoint(eager=True)

    import shutil

    from lachesis_spark.catalog import Catalog

    cat_root = "/tmp/span_idx_cat"
    shutil.rmtree(cat_root, ignore_errors=True)
    cat = Catalog(spark, cat_root)
    cat.create_database("spanidx")

    def timed(idx):
        batch_step(batch_toks, idx, k)  # warm-up
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            batch_step(batch_toks, idx, k)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    rows = []
    for label, d in corpora:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        idx = build_index(spark, docs, k)
        n_idx = idx.count()
        t_flat = timed(idx)
        cat.write_set(idx, "spanidx", f"gh_{label}", bucket_by=(32, ["gh"]))
        idx.unpersist()
        idx_b = cat.read_set("spanidx", f"gh_{label}")
        t_bucketed = timed(idx_b)
        rows.append((label, n_idx, t_flat, t_bucketed))

    print("| index corpus | distinct grams | per-batch s (flat) | per-batch s (bucketed index) |")
    print("|---|---|---|---|")
    for label, n, tf, tb in rows:
        print(f"| {label} | {n} | {tf:.3f} | {tb:.3f} |")
    (l0, n0, t0, b0), (ln, nn, tn, bn) = rows[0], rows[-1]
    ef = math.log(tn / t0) / math.log(nn / n0)
    eb = math.log(bn / b0) / math.log(nn / n0)
    print(
        f"\nexponent {l0} -> {ln}: flat e = {ef:.2f}, bucketed e = {eb:.2f}"
        f" (log t-ratio / log {nn}/{n0})"
    )


if __name__ == "__main__":
    main()
