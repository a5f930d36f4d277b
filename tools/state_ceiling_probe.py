"""Keyed-state ceiling, measured (round-10 verdict task 4): grow
streaming state at a FIXED small executor heap until the default
HDFS-backed provider falls over, and show RocksDB continuing on the same
corpus — turning SCALE.md's provider table from an architecture claim
into numbers.

Workload: a single-batch availableNow replay of N distinct keys through
``dropDuplicates`` — the leanest stateful operator (state = one entry
per key, no Python workers in the loop).  Each key embeds a ~1 KiB pad,
so the state store must hold ~N KiB of keyed state at commit time.  The
HDFSBackedStateStoreProvider keeps every key of the loaded version in an
executor-heap hash map; RocksDB keeps it in an off-heap LSM with local
SST files.  Every (provider, N) cell runs in its OWN subprocess with
``spark.driver.memory`` pinned (local mode: driver heap IS the executor
heap), so an OOM kills only that cell and the heap is actually fixed.

Outcome per cell: ``ok`` (wall seconds), ``OOM`` (heap exhaustion
anywhere in the driver/executor), or ``timeout`` (GC death spiral —
degraded is failed).

Usage:
    python tools/state_ceiling_probe.py [--heap 1g] [--pad 1024] \
        [--keys 100000,300000,1000000,3000000] [--timeout 600]
Prints a markdown table (stdout, ready for SCALE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, shutil, sys, tempfile, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

provider = {provider!r}
n = {n}
pad = {pad}
work = tempfile.mkdtemp(prefix="state_ceiling_")
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.driver.memory", {heap!r})
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.stateStore.providerClass", provider)
    .appName("state_ceiling").getOrCreate()
)
src = os.path.join(work, "src")
(
    spark.range(0, n)
    .select(F.concat(F.col("id").cast("string"),
                     F.lit("-"), F.lit("x" * pad)).alias("k"))
    .coalesce(4)
    .write.parquet(src)
)
stream = spark.readStream.schema("k string").parquet(src).dropDuplicates(["k"])
seen = []
t0 = time.perf_counter()
q = (
    stream.writeStream.outputMode("append")
    .option("checkpointLocation", os.path.join(work, "ckpt"))
    .foreachBatch(lambda df, _id: seen.append(df.count()))
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
sec = time.perf_counter() - t0
assert sum(seen) == n, (seen, n)
shutil.rmtree(work, ignore_errors=True)
print("RESULT=" + repr(round(sec, 2)))
"""


def run_cell(provider: str, n: int, heap: str, pad: int, timeout: int):
    code = _CHILD.format(provider=provider, n=n, heap=heap, pad=pad)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "timeout", None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT="):
            return "ok", float(line.split("=", 1)[1])
    blob = out.stdout + out.stderr
    if "OutOfMemoryError" in blob or "heap space" in blob:
        return "OOM", None
    return f"failed(rc={out.returncode})", None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--heap", default="1g")
    ap.add_argument("--pad", type=int, default=1024)
    ap.add_argument("--keys", default="100000,300000,1000000,3000000")
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    keys = [int(k) for k in args.keys.split(",")]

    HDFS = ("org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider")
    ROCKS = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    rows = []
    for n in keys:
        for label, provider in (("HDFS", HDFS), ("RocksDB", ROCKS)):
            outcome, sec = run_cell(provider, n, args.heap, args.pad,
                                    args.timeout)
            mb = round(n * (args.pad + 24) / 1e6)
            rows.append({"provider": label, "keys": n, "state_mb": mb,
                         "outcome": outcome, "sec": sec})
            print(f"# {label} keys={n} (~{mb} MB state): {outcome}"
                  + (f" {sec}s" if sec else ""), file=sys.stderr, flush=True)

    print(f"| keys | ~state MB | HDFS provider ({args.heap} heap) | "
          f"RocksDB provider ({args.heap} heap) |")
    print("|---|---|---|---|")
    for n in keys:
        cells = {r["provider"]: r for r in rows if r["keys"] == n}
        def fmt(r):
            return (f"ok, {r['sec']} s" if r["outcome"] == "ok"
                    else f"**{r['outcome']}**")
        print(f"| {n:,} | {cells['HDFS']['state_mb']} | "
              f"{fmt(cells['HDFS'])} | {fmt(cells['RocksDB'])} |")
    print()
    print(json.dumps({"metric": "state_ceiling", "heap": args.heap,
                      "pad": args.pad, "cells": rows}))


if __name__ == "__main__":
    main()
