"""Isolated per-query re-measure: each named query runs in its OWN fresh
subprocess (new JVM, new SparkSession), steady-state timed exactly like
bench.py (untimed warm-up rep, timed final rep).

Purpose (round-8 verdict task 2): the r6->r7 bench showed a uniform
+10-30% per-query inflation with outliers up to 5x on code that did not
change; the committed hypothesis is JVM-accumulation (GC / codegen-cache
pressure) over a 188-query single-session run plus machine contention,
not plan regressions.  A fresh-JVM number per query is the ground truth
that separates "the plan got slower" from "the session got heavier".

Usage:
    python tools/bench_isolated.py [sf_dir] q1 q2 ...
Prints one JSON line {"metric": "isolated_query_sec", "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from lachesis_spark.registry import QUERIES
from lachesis_spark.session import get_spark
spark = get_spark("bench_isolated")
sf_dir = {sf_dir!r}
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
fn = QUERIES[{name!r}]
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    sec = time.perf_counter() - t0
    spark.catalog.clearCache()
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()
print("ISOLATED_SEC=" + repr(round(sec, 3)))
"""


def measure(name: str, sf_dir: str) -> float:
    code = _CHILD.format(repo=REPO, sf_dir=sf_dir, name=name)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ISOLATED_SEC="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"{name}: no result\n{out.stderr[-2000:]}")


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)]
    timings = {}
    for n in names:
        timings[n] = measure(n, sf_dir)
        print(f"# {n}: {timings[n]} s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "isolated_query_sec", "sf_dir": sf_dir, "queries": timings,
        "total_sec": round(sum(timings.values()), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
