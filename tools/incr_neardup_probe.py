"""Per-batch cost of the incremental near-dup loop as the signature index
grows — the operational claim under test: `dedup_incremental_near`'s batch
cost is governed by the BATCH (its in-batch self-join + its band join
against the index + label folding whose convergence depth is bounded by the
NEW chains), not by re-walking the historical corpus, so a growing index
must cost ~flat per batch (modulo the batch×index band join's probe side
growing with index size — an equi-join probe, linear and shuffle-free on
the broadcast/bucketed side at scale).

Protocol: a FIXED batch (sf0.01 documents, ids shifted to be new) folds
into indexes built from corpora of increasing size (sf0.01, sf0.1, and a
×10 token-decorated copy of sf0.1 = ×100 the smallest).  Per index size we
time one full batch step — signatures, candidate pairs, incremental CC,
action on the returned label table — steady-state (median of 3 after one
warm-up).  Report cost vs index size and the scaling exponent
e = log(t_big/t_small) / log(size_big/size_small); e ≪ 1 = the flat-batch
claim holds.

Usage: python tools/incr_neardup_probe.py [x10_dir]
(x10_dir defaults to /tmp/docs_x10 — build with the token-prefix
decoration from tools/scale_probe.py so LSH pair counts don't grow N² by
construction.)  Prints a markdown table; paste into SCALE.md.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lachesis_spark.llm import dedup as D
from lachesis_spark.session import get_spark


def build_index(spark, docs):
    """Bootstrap the persistent state: signature index + label table."""
    sig, labels = D.dedup_incremental_near(None, None, docs)
    sig = sig.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    return sig, labels


def batch_step_time(sig, labels, batch) -> float:
    t0 = time.perf_counter()
    new_sig, new_labels = D.dedup_incremental_near(sig, labels, batch)
    # the caller's real actions: advance the label state + append the
    # index (new_sig is already materialized; count forces the label fold)
    new_labels.count()
    new_sig.count()
    return time.perf_counter() - t0


def main() -> None:
    x10_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/docs_x10"
    spark = get_spark("incr_neardup_probe")

    batch = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .withColumn("doc_id", (F.col("doc_id") + F.lit(900_000_000_000)).cast("long"))
    ).localCheckpoint(eager=True)
    n_batch = batch.count()

    corpora = [
        ("sf0.01", "/root/testdata/sf0.01/documents.parquet"),
        ("sf0.1", "/root/testdata/sf0.1/documents.parquet"),
    ]
    x10 = os.path.join(x10_dir, "documents.parquet")
    if os.path.exists(x10):
        corpora.append(("sf0.1 x10", x10))

    rows = []
    for label, path in corpora:
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        sig, labels = build_index(spark, docs)
        n_sig = sig.count()
        batch_step_time(sig, labels, batch)  # warm-up
        ts = [batch_step_time(sig, labels, batch) for _ in range(3)]
        rows.append((label, n_docs, n_sig, statistics.median(ts)))
        print(f"# {label}: index {n_docs} docs / {n_sig} sig rows, "
              f"batch {n_batch} docs -> {statistics.median(ts):.2f}s",
              flush=True)

    print(f"\n# incremental near-dup batch cost vs index size "
          f"(fixed batch = {n_batch} docs)")
    print("| index corpus | index docs | signature rows | batch step sec |")
    print("|---|---|---|---|")
    for label, n_docs, n_sig, t in rows:
        print(f"| {label} | {n_docs} | {n_sig} | {t:.2f} |")
    if len(rows) >= 2:
        (l0, d0, _, t0), (ln, dn, _, tn) = rows[0], rows[-1]
        e = math.log(tn / t0) / math.log(dn / d0)
        print(f"exponent {l0} -> {ln}: e = log({tn:.2f}/{t0:.2f}) / "
              f"log({dn}/{d0}) = {e:.2f}")


if __name__ == "__main__":
    main()
