"""End-to-end curation-pipeline probe: does the COMPOSED pipeline scale,
not just each operator in isolation?

SCALE.md carries per-operator ×10/×100 exponents; a user of this engine
runs the operators in sequence, with every stage materialized back to
parquet (the shape a production corpus pipeline ships — each stage's
output is the next stage's input and the restart point).  This probe runs
the canonical pretraining-curation chain over the documents corpus:

    1. quality_filter   — codegen quality score, keep q >= 0.5
    2. exact_dedup      — keep min-doc_id per content md5.  MUST precede
                          span removal: the span rule removes ALL
                          occurrences of a repeated window, so feeding it
                          byte-identical documents would erase every copy
                          of their content; deduping to one canonical copy
                          first means the span stage only fires on genuine
                          cross-document span duplication
    3. span_removal     — duplicated overlapping 8-gram spans excised
                          (Lee et al. 2022 form), text rewritten
    4. near_dedup       — MinHash-LSH pairs -> convergent connected
                          components -> keep canonical per component
    5. pack             — concat-and-chunk sequence packing (terminal
                          aggregate: #sequences, token totals)

Each stage is timed INCLUDING its parquet write (stages 1-4) — at scale
the write IS part of the stage — and rows in/out are recorded so
selectivity is visible.  Run it at ×1 (sf0.1) and on the decorrelated
×10/×100 builds (tools/scale_probe.py documents build) to get composed
exponents.

Usage:
    python tools/pipeline_probe.py [--src /root/testdata/sf0.1]
        [--work /tmp/lachesis_pipeline] [--label x1]
Prints one JSON line and a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lachesis_spark.binding import base_table
from lachesis_spark.functions import text as TX
from lachesis_spark.llm.dedup import (
    _minhash_pairs_raw,
    cc_converged,
    span_removal_clean,
)
from lachesis_spark.llm.sampling import pack_sequences
from lachesis_spark.session import get_spark

QUALITY_MIN = 0.5


def _read(spark, d):
    return base_table(spark, d, "documents")


def _write(df, d):
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))


def stage_quality_filter(spark, src, dst):
    docs = _read(spark, src)
    _write(
        docs.withColumn("q", TX.quality_score("text"))
        .filter(F.col("q") >= QUALITY_MIN)
        .drop("q"),
        dst,
    )


def stage_span_removal(spark, src, dst):
    _write(span_removal_clean(_read(spark, src)), dst)


def stage_exact_dedup(spark, src, dst):
    docs = _read(spark, src).withColumn("h", F.md5("text"))
    canon = docs.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    _write(docs.join(canon, ["h", "doc_id"]).drop("h"), dst)


def stage_near_dedup(spark, src, dst):
    labels = cc_converged(_minhash_pairs_raw(spark, src))
    docs = _read(spark, src)
    survivors = docs.join(labels, "doc_id", "left").where(
        F.col("canonical_id").isNull()
        | (F.col("canonical_id") == F.col("doc_id"))
    )
    _write(survivors.drop("canonical_id"), dst)


def stage_pack(spark, src, dst):
    # terminal aggregate — the manifest a data loader consumes
    docs = _read(spark, src)
    packed = pack_sequences(docs, "doc_id", TX.token_count("text"))
    row = packed.groupBy("bucket", "bin").agg(
        F.sum("n_tok").alias("t")
    ).agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("t").alias("total_tokens"),
    ).collect()[0]
    return {"n_sequences": row["n_sequences"], "total_tokens": row["total_tokens"]}


STAGES = [
    ("quality_filter", stage_quality_filter),
    ("exact_dedup", stage_exact_dedup),  # before span removal — see header
    ("span_removal", stage_span_removal),
    ("near_dedup", stage_near_dedup),
    ("pack", stage_pack),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--work", default="/tmp/lachesis_pipeline")
    ap.add_argument("--label", default="x1")
    args = ap.parse_args()

    spark = get_spark("pipeline_probe")
    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work, exist_ok=True)

    # warm the JVM so stage 1 isn't charged startup cost
    _read(spark, args.src).count()

    cur = args.src
    rows_in = _read(spark, cur).count()
    report = []
    extra = {}
    for i, (name, fn) in enumerate(STAGES, 1):
        dst = os.path.join(args.work, f"s{i}_{name}")
        os.makedirs(dst, exist_ok=True)
        t0 = time.perf_counter()
        out = fn(spark, cur, dst)
        dt = time.perf_counter() - t0
        if out is None:
            rows_out = _read(spark, dst).count()
            nxt = dst
        else:  # terminal aggregate stage
            rows_out = out["n_sequences"]
            extra = out
            nxt = cur
        report.append(
            {"stage": name, "sec": round(dt, 3), "rows_in": rows_in, "rows_out": rows_out}
        )
        rows_in, cur = rows_out, nxt

    total = round(sum(r["sec"] for r in report), 3)
    print(json.dumps({"label": args.label, "src": args.src, "total_sec": total,
                      "stages": report, **extra}))
    print()
    print("| stage | sec | rows in | rows out |")
    print("|---|---|---|---|")
    for r in report:
        print(f"| {r['stage']} | {r['sec']} | {r['rows_in']} | {r['rows_out']} |")
    print(f"| **total** | **{total}** | | |")


if __name__ == "__main__":
    main()
