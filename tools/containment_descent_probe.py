"""The containment threshold-descent's t<1 path, measured at scale.

Every prior ×10/×100 row for `dedup_containment` exercised corpora where
the t=1.0 opener terminates (≥ k full-containment pairs — true of dedup
corpora, but not of every workload).  This probe builds a corpus whose
top-k SPANS containment < 1, forcing the descent through its windowed
prefix passes, and measures the shipped plan
(`containment_topk_prefix`, llm/dedup.py) at ×1 / ×10 / ×100.

Corpus construction (deterministic, engine-only):

* every BASE doc's tokens are prefixed with a per-doc tag
  (``d<doc_id>_``), so base docs share NO shingles with each other —
  the corpus has zero full-containment pairs and the t=1.0 argmin pass
  finds nothing;
* every base doc gets ONE partner (doc_id + stride) with the same
  tagged tokens except every m-th token replaced by a partner-unique
  token: with 3-token shingles each replacement destroys ≤3 shingles,
  so containment(partner→base) ≈ 1 − 3/m.  m = 16 on even ids puts a
  large pair population at ~0.8 (passes t=0.75, fails t=0.875) — the
  descent must run t=1.0 → 0.875 → 0.75 before it can terminate, and
  the t=0.0 all-pairs backstop (quadratic by design) is never touched;
* scaling = more docs (the whole construction is per-doc, so key-shifted
  copies are decorrelated BY CONSTRUCTION — the doc tag contains the
  shifted id); pair counts grow linearly, never N².

The probe reports wall time, the threshold the descent terminated at,
the number of t<1 passes paid, and the ×N scaling exponent.  Descent
instrumentation is a recording wrapper around
``_containment_threshold_descent`` — the shipped code path runs
unmodified.

Usage: python tools/containment_descent_probe.py [--factors 1,10,100]
       [--base-docs 2000] [--out /tmp/containment_descent]
Prints a markdown table; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lachesis_spark.llm import dedup as D
from lachesis_spark.session import get_spark

SRC = "/root/testdata/sf0.1/documents.parquet"
STRIDE = 100_000_000
REPLACE_EVERY = 8  # ≈ 1 - 3/8 ≈ 0.63 containment on long docs; short docs
# (fewer replacements hit, boundary shingles) top out ≈ 0.83 — still below
# the 0.875 rung, so the descent must pay at least two windowed passes


def build_corpus(spark, out: str, factor: int, base_docs: int) -> int:
    """base_docs originals × factor copies, each with one ~0.8-containment
    partner; returns total doc count."""
    src = (
        spark.read.parquet(SRC)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(base_docs)
    )
    copies = []
    for i in range(factor):
        copies.append(
            src.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * 1_000_000)).cast("long")
            )
        )
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionByName(c)
    # per-doc token tag: base docs share no shingles with each other
    tag = F.concat(F.lit("d"), F.col("doc_id").cast("string"), F.lit("_"))
    base = docs.withColumn(
        "text",
        F.array_join(
            F.transform(F.split("text", " "), lambda t: F.concat(tag, t)), " "
        ),
    )
    # partner: same tagged tokens, every m-th replaced partner-uniquely
    ptag = F.concat(F.lit("x"), F.col("doc_id").cast("string"), F.lit("_"))
    partner = base.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t, i: F.when(
                    i % REPLACE_EVERY == 0,
                    F.concat(ptag, i.cast("string")),
                ).otherwise(t),
            ),
            " ",
        ),
    ).withColumn("doc_id", (F.col("doc_id") + F.lit(STRIDE)).cast("long"))
    corpus = base.unionByName(partner)
    corpus.repartition(max(4, 2 * factor)).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return spark.read.parquet(os.path.join(out, "documents.parquet")).count()


def instrumented_run(spark, sf_dir: str, k: int = 20):
    """Run the shipped plan with a recording wrapper: which thresholds the
    descent visited and where it terminated."""
    visited: list[float] = []
    orig = D._containment_threshold_descent

    def recorder(spark_, sh, arr, prefix_for, k_, thresholds, backstop=True):
        def spy_prefix_for(t):
            visited.append(t)
            return prefix_for(t)

        return orig(spark_, sh, arr, spy_prefix_for, k_, thresholds,
                    backstop=backstop)

    D._containment_threshold_descent = recorder
    try:
        t0 = time.perf_counter()
        rows = D.containment_topk_prefix(spark, sf_dir, k=k).collect()
        wall = time.perf_counter() - t0
    finally:
        D._containment_threshold_descent = orig
    return wall, visited, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--base-docs", type=int, default=2000)
    ap.add_argument("--out", default="/tmp/containment_descent")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    spark = get_spark("containment_descent_probe")
    results = []
    for f in factors:
        d = os.path.join(args.out, f"x{f}")
        n = build_corpus(spark, d, f, args.base_docs)
        instrumented_run(spark, d)  # warm-up
        wall, visited, rows = instrumented_run(spark, d)
        cmax = max(r["containment"] for r in rows) if rows else None
        cmin = min(r["containment"] for r in rows) if rows else None
        assert cmax is not None and cmax < 1.0, (
            f"corpus not descent-forcing: top containment {cmax}"
        )
        assert visited and min(visited) > 0.0, (
            f"descent hit the all-pairs backstop: {visited}"
        )
        results.append((f, n, wall, visited, cmax, cmin))
        print(
            f"# x{f}: {n} docs, {wall:.1f}s, thresholds {visited}, "
            f"top-k containment [{cmin:.3f}, {cmax:.3f}]",
            flush=True,
        )

    print("\n| factor | docs | wall s | thresholds visited | exponent |")
    print("|---|---|---|---|---|")
    base_wall = results[0][2]
    for f, n, wall, visited, _cx, _cn in results:
        exp = (
            math.log(wall / base_wall) / math.log(f) if f > 1 else float("nan")
        )
        exps = f"{exp:.2f}" if f > 1 else "—"
        th = " → ".join(str(t) for t in visited)
        print(f"| ×{f} | {n} | {wall:.1f} | {th} | {exps} |")


if __name__ == "__main__":
    main()
