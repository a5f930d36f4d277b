"""Self-learning placement, measured end-to-end — the reference's headline
experiment reproduced on Spark.

The reference's documentation records Gram-matrix 41.27 s → 22.95 s and
matmul 42.21 s → 11.41 s once the self-learning optimizer has seen the
workload and re-partitioned the inputs (reference documentation.md:5-9).
This tool runs the same LOOP on this engine:

  1. run a join+agg workload on plainly-laid-out sets, recording each run's
     runtime + shuffle-key usages (captured from the executed plan) + scan
     stats into the HistoryDB;
  2. ask the advisor for each set's layout (runtime-weighted dominant key);
  3. apply the recommendation (bucketed write on the learned key);
  4. re-run the identical workload and diff runtime + Exchange count.

Broadcast joins are disabled for the workload because at the design scale
(100 TB) neither side fits any broadcast threshold — locally Spark would
otherwise hide the shuffle this experiment is about.

Usage: python tools/advisor_demo.py [sf_dir] [--md]
Prints one JSON line; with --md rewrites ADVISOR_DEMO.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from lachesis_spark.advisor import (
    HistoryDB,
    capture_usages_from_plan,
    recommend,
    recommend_file_size,
    scan_stat_for_set,
)
from lachesis_spark.catalog import Catalog
from lachesis_spark.session import get_spark

N_BUCKETS = 16
REPS = 4  # first run absorbs JIT; last run is the steady-state number


def workload(a, b):
    """Join lineitem to orders and aggregate revenue per order — every
    shuffle-inducing op keys on the orderkey, the pattern the advisor
    should learn."""
    j = a.join(b, a["l_orderkey"] == b["o_orderkey"])
    return j.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )


def run_timed(df) -> float:
    t = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.count()
        t = time.perf_counter() - t0
    return t


def main():
    args = [a for a in sys.argv[1:] if a != "--md"]
    write_md = "--md" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("advisor_demo")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    root = tempfile.mkdtemp(prefix="advisor_demo_")
    cat = Catalog(spark, root)
    cat.create_database("db")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cat.write_set(li, "db", "lineitem")
    cat.write_set(od, "db", "orders")

    # 1. run + record (the instrumented submit path)
    h = HistoryDB(":memory:")
    a, b = cat.read_set("db", "lineitem"), cat.read_set("db", "orders")
    plain_t = None
    for i in range(3):
        df = workload(a, b)
        t0 = time.perf_counter()
        df.count()
        t = time.perf_counter() - t0
        plain_t = t
        h.record_job(
            f"wl_run{i}", t, capture_usages_from_plan(df),
            scans=[scan_stat_for_set(cat, "db", "lineitem"),
                   scan_stat_for_set(cat, "db", "orders")],
        )
    plain_plan = workload(a, b)._jdf.queryExecution().executedPlan().toString()
    plain_t = run_timed(workload(a, b))

    # 2. learn
    rec_li = recommend(h, "lineitem", n_buckets=N_BUCKETS)
    rec_od = recommend(h, "orders", n_buckets=N_BUCKETS)
    assert rec_li and rec_od, "advisor produced no recommendation"

    # 3. apply
    cat.write_set(a, "db", "lineitem_learned", bucket_by=rec_li.as_bucket_by())
    cat.write_set(b, "db", "orders_learned", bucket_by=rec_od.as_bucket_by())

    # 4. re-measure on the learned layout (bucket metadata flows through the
    # table identity, so read via spark.table)
    la_, lb = spark.table("db_lineitem_learned"), spark.table("db_orders_learned")
    learned_t = run_timed(workload(la_, lb))
    learned_plan = workload(la_, lb)._jdf.queryExecution().executedPlan().toString()

    # ----- dimension 2: page/file size (the reference optimizer's second
    # knob).  A microbatch-style fragmented copy of lineitem, scanned and
    # recorded; the advisor prices the fragmentation and compact_set applies
    # its target.
    li.repartition(512).write.parquet(cat.set_path("db", "frag"))

    def scan_wl(df):
        return df.groupBy("l_returnflag").agg(
            F.sum("l_extendedprice").alias("s")
        )

    fr = cat.read_set("db", "frag")
    frag_t = None
    for i in range(3):
        t0 = time.perf_counter()
        scan_wl(fr).count()
        frag_t = time.perf_counter() - t0
        h.record_job(f"scan_run{i}", frag_t, [],
                     scans=[scan_stat_for_set(cat, "db", "frag")])
    frag_t = run_timed(scan_wl(fr))
    frag_files = scan_stat_for_set(cat, "db", "frag").n_files

    rec_fs = recommend_file_size(h, "db.frag")
    assert rec_fs is not None and rec_fs.reason == "fragmented"
    n_after = cat.compact_set("db", "frag",
                              target_file_bytes=rec_fs.target_file_bytes)
    compact_t = run_timed(scan_wl(cat.read_set("db", "frag")))

    out = {
        "metric": "advisor_speedup",
        "sf_dir": sf_dir,
        "learned_keys": {
            "lineitem": list(rec_li.key_cols),
            "orders": list(rec_od.key_cols),
        },
        "n_buckets": N_BUCKETS,
        "plain_sec": round(plain_t, 3),
        "learned_sec": round(learned_t, 3),
        "speedup": round(plain_t / learned_t, 2),
        "plain_exchanges": plain_plan.count("Exchange hashpartitioning"),
        "learned_exchanges": learned_plan.count("Exchange hashpartitioning"),
        "frag_files": frag_files,
        "frag_sec": round(frag_t, 3),
        "compacted_files": n_after,
        "compacted_sec": round(compact_t, 3),
        "file_size_speedup": round(frag_t / compact_t, 2),
    }
    print(json.dumps(out), flush=True)

    if write_md:
        md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "ADVISOR_DEMO.md")
        with open(md, "w") as f:
            f.write(f"""# ADVISOR DEMO — self-learning placement, measured

Generated by `python tools/advisor_demo.py {sf_dir} --md`.  The loop the
reference's headline experiment runs (documentation.md:5-9, Gram matrix
41.27 s → 22.95 s after self-learning): record workload history → learn
the dominant shuffle key → re-partition persistently → identical query
goes shuffle-free.  Broadcast disabled (at 100 TB neither side fits).

| layout | steady-state sec (sf0.1, local[32]) | Exchange count |
|---|---|---|
| plain parquet | {out['plain_sec']} | {out['plain_exchanges']} |
| learned bucketing ({N_BUCKETS} buckets on {', '.join(out['learned_keys']['lineitem'])}) | {out['learned_sec']} | {out['learned_exchanges']} |

**Speedup: {out['speedup']}×; join+agg shuffles eliminated entirely
({out['plain_exchanges']} → {out['learned_exchanges']}).**

The advisor learned the keys from the executed plans alone
(`capture_usages_from_plan`): every shuffle in the workload hashes on the
orderkey, so the runtime-weighted rule picks it for both sets.  At 100 TB
the same loop prices the one-time bucketed rewrite against the recurring
shuffle of every later job — the reference's LocalJoin trade realized with
Spark's bucketed scans.

## Dimension 2: page/file size

The reference optimizer's second knob (it picks partition lambda AND page
size).  A microbatch-fragmented copy of lineitem, scanned + recorded; the
advisor flags the fragmentation ({out['frag_files']} files for a table
that fits {out['compacted_files']}) and `compact_set` applies its target:

| layout | steady-state scan+agg sec | files |
|---|---|---|
| fragmented | {out['frag_sec']} | {out['frag_files']} |
| advisor-compacted | {out['compacted_sec']} | {out['compacted_files']} |

**Speedup: {out['file_size_speedup']}× from file-count alone** — at
100 TB/day ingest the same rule keeps scan task count proportional to
data, not to microbatch count.
""")

    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
