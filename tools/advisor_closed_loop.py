"""The FULL self-learning loop, one command, zero manual steps:

    empty HistoryDB
      → instrumented workload runs (runtime + plan key usages + scan
        stats + key-frequency profiles recorded)
      → advise_all()            (every placement decision per dataset)
      → apply_all()             (bucket rewrite / compaction / salting
                                 hint applied to the catalog)
      → identical workloads re-run
      → measured before/after

This is the reference's headline story (README.md:151-268: run → learn →
re-place → same query faster) executed end-to-end as one reproducible
artifact.  Three decision dimensions exercised:

  join+agg on lineitem⋈orders  → layout rule learns the orderkey, bucket
                                 rewrite removes every Exchange
  fragmented scan              → file-size rule prices the fragmentation,
                                 compact_set applies its target
  skewed fact ⋈ dim            → skew rule flags the hot key from the
                                 recorded frequency profile; the persisted
                                 sidecar hint makes hinted_join salt it

Broadcast joins are disabled for the workloads: at the design scale
(100 TB) neither join side fits a broadcast threshold, and locally Spark
would otherwise hide the shuffles this loop is about.

Usage: python tools/advisor_closed_loop.py [sf_dir] [--md]
Prints one JSON line; with --md appends the closed-loop section to
ADVISOR_DEMO.md.
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
    advise_all,
    apply_all,
    capture_usages_from_plan,
    hinted_join,
    key_stat_for,
    scan_stat_for_set,
)
from lachesis_spark.catalog import Catalog
from lachesis_spark.session import get_spark

N_BUCKETS = 16
SHUFFLE_PARTS = 16
REPS = 4
HOT_FRAC = 0.4
N_KEYS = 10_000
SKEW_ROWS = 5_000_000


def run_timed(df) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.count()
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])


def join_workload(li, od):
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"])
    return j.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )


def scan_workload(fr):
    return fr.groupBy("l_returnflag").agg(F.sum("l_extendedprice").alias("s"))


def skew_workload(cat, fact, dim):
    joined = hinted_join(cat, "db", "skewfact", fact, dim, "k", "k")
    return joined.groupBy("w").agg(F.sum("v").alias("sv"))


RANGE_LO, RANGE_HI = 1000, 4000

# 2-D selection box for the Z-order dimension: ~10% selective in each of
# two INDEPENDENT columns.  A single-column range clustering can prune only
# one of them; the Z-curve keeps per-file spans bounded in both, so the
# box touches O(sqrt(files)) instead of all of them.
Z_CUST_LO, Z_CUST_HI = 1000, 2500
Z_PRICE_LO, Z_PRICE_HI = 150_000, 200_000


def zorder_workload(cat):
    """Two-dimensional box scan through the multi-column pruning entry
    point: before the advisor acts the set is unclustered (full scan +
    filters); after apply_all's zorder rewrite the same call skips files
    on BOTH dimensions at planning time."""
    pruned = cat.read_set_pruned_multi(
        "db", "od_zorder",
        {"o_custkey": (Z_CUST_LO, Z_CUST_HI),
         "o_totalprice": (Z_PRICE_LO, Z_PRICE_HI)},
    )
    return pruned.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s"))


def zorder_files_read(cat) -> int:
    return len(
        cat.read_set_pruned_multi(
            "db", "od_zorder",
            {"o_custkey": (Z_CUST_LO, Z_CUST_HI),
             "o_totalprice": (Z_PRICE_LO, Z_PRICE_HI)},
        ).inputFiles()
    )


def range_workload(cat):
    """Key-range scan through the pruning entry point: before the advisor
    acts the set has no clustering and no zone maps (full scan + filter);
    after apply_all's range_zonemap rewrite the same call skips files at
    planning time."""
    pruned = cat.read_set_pruned("db", "od_range", "o_orderkey", RANGE_LO, RANGE_HI)
    return pruned.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s"))


def range_files_read(cat) -> int:
    return len(
        cat.read_set_pruned(
            "db", "od_range", "o_orderkey", RANGE_LO, RANGE_HI
        ).inputFiles()
    )


def n_exchanges(df) -> int:
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .count("Exchange hashpartitioning")
    )


def main():
    args = [a for a in sys.argv[1:] if a != "--md"]
    write_md = "--md" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("advisor_closed_loop", shuffle_partitions=SHUFFLE_PARTS)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    root = tempfile.mkdtemp(prefix="advisor_loop_")
    cat = Catalog(spark, root)
    cat.create_database("db")

    # ----- catalog setup: plain layouts only, nothing pre-optimized
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cat.write_set(li, "db", "lineitem")
    cat.write_set(od, "db", "orders")
    li.repartition(512).write.parquet(cat.set_path("db", "frag"))
    hot = int(SKEW_ROWS * HOT_FRAC)
    fact = spark.range(SKEW_ROWS).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % N_KEYS).cast("long"))
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    cat.write_set(fact.repartition(SHUFFLE_PARTS), "db", "skewfact")
    # range-scanned set: written UNCLUSTERED (random 32-way) so every file
    # spans the whole key range — zone maps would prune nothing until the
    # advisor's range_zonemap rewrite re-clusters it
    cat.write_set(od.repartition(32), "db", "od_range")
    # 2-D-scanned set, same unclustered start; the TWO filter columns in
    # its history make recommend_layout pick zorder instead of range
    cat.write_set(od.repartition(32), "db", "od_zorder")
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    ).cache()
    dim.count()

    # ----- phase 1: OBSERVE from an empty history
    h = HistoryDB(":memory:")
    a, b = cat.read_set("db", "lineitem"), cat.read_set("db", "orders")
    fr = cat.read_set("db", "frag")
    sk = cat.read_set("db", "skewfact")
    for i in range(3):
        df = join_workload(a, b)
        t0 = time.perf_counter()
        df.count()
        h.record_job(
            f"join_run{i}", time.perf_counter() - t0,
            capture_usages_from_plan(df),
            scans=[scan_stat_for_set(cat, "db", "lineitem"),
                   scan_stat_for_set(cat, "db", "orders")],
        )
        t0 = time.perf_counter()
        scan_workload(fr).count()
        # scan-only job: no key usages — the file-size rule runs on shape
        h.record_job(f"scan_run{i}", time.perf_counter() - t0, [],
                     scans=[scan_stat_for_set(cat, "db", "frag")])
    # load-time observation: the skewed set's key-frequency profile
    h.record_job("skew_load", run_timed(skew_workload(cat, sk, dim)), [],
                 key_stats=[key_stat_for(sk, "db.skewfact", ["k"])])
    # range-filter history: the pushed o_orderkey predicate is the
    # data-skipping signal the range_zonemap rule fires on
    for i in range(3):
        rq = cat.read_set("db", "od_range").where(
            F.col("o_orderkey").between(RANGE_LO, RANGE_HI)
        )
        t0 = time.perf_counter()
        rq.count()
        h.record_job(
            f"range_run{i}", time.perf_counter() - t0,
            capture_usages_from_plan(rq),
        )
    # 2-D-filter history: two pushed predicates on the same scan — the
    # combined-weight signal the zorder rule fires on
    for i in range(3):
        zq = cat.read_set("db", "od_zorder").where(
            F.col("o_custkey").between(Z_CUST_LO, Z_CUST_HI)
            & F.col("o_totalprice").between(Z_PRICE_LO, Z_PRICE_HI)
        )
        t0 = time.perf_counter()
        zq.count()
        h.record_job(
            f"zorder_run{i}", time.perf_counter() - t0,
            capture_usages_from_plan(zq),
        )

    before = {
        "join_sec": run_timed(join_workload(a, b)),
        "join_exchanges": n_exchanges(join_workload(a, b)),
        "scan_sec": run_timed(scan_workload(fr)),
        "scan_files": scan_stat_for_set(cat, "db", "frag").n_files,
        "skew_sec": run_timed(skew_workload(cat, sk, dim)),
        "range_sec": run_timed(range_workload(cat)),
        "range_files": range_files_read(cat),
        "zorder_sec": run_timed(zorder_workload(cat)),
        "zorder_files": zorder_files_read(cat),
    }

    # ----- phase 2+3: ADVISE + APPLY (the one call under test)
    reports = advise_all(
        h, n_buckets=N_BUCKETS, cores=SHUFFLE_PARTS,
        shuffle_partitions=SHUFFLE_PARTS,
    )
    applied = apply_all(
        cat, reports,
        resolve={
            "lineitem": ("db", "lineitem"),
            "orders": ("db", "orders"),
            "db.frag": ("db", "frag"),
            "db.skewfact": ("db", "skewfact"),
            "od_range": ("db", "od_range"),
            "od_zorder": ("db", "od_zorder"),
        },
        n_buckets=N_BUCKETS,
    )
    assert applied, "advisor applied nothing — loop is broken"

    # ----- phase 4: identical workloads, re-measured
    a2, b2 = cat.read_set("db", "lineitem"), cat.read_set("db", "orders")
    fr2 = cat.read_set("db", "frag")
    sk2 = cat.read_set("db", "skewfact")
    after = {
        "join_sec": run_timed(join_workload(a2, b2)),
        "join_exchanges": n_exchanges(join_workload(a2, b2)),
        "scan_sec": run_timed(scan_workload(fr2)),
        "scan_files": scan_stat_for_set(cat, "db", "frag").n_files,
        "skew_sec": run_timed(skew_workload(cat, sk2, dim)),
        "range_sec": run_timed(range_workload(cat)),
        "range_files": range_files_read(cat),
        "zorder_sec": run_timed(zorder_workload(cat)),
        "zorder_files": zorder_files_read(cat),
    }

    out = {
        "metric": "advisor_closed_loop",
        "sf_dir": sf_dir,
        "applied": [
            {"dataset": x.dataset, "action": x.action, "detail": x.detail}
            for x in applied
        ],
        "before": {k: round(v, 3) for k, v in before.items()},
        "after": {k: round(v, 3) for k, v in after.items()},
        "join_speedup": round(before["join_sec"] / after["join_sec"], 2),
        "scan_speedup": round(before["scan_sec"] / after["scan_sec"], 2),
        "skew_speedup": round(before["skew_sec"] / after["skew_sec"], 2),
        "range_speedup": round(before["range_sec"] / after["range_sec"], 2),
        "zorder_speedup": round(before["zorder_sec"] / after["zorder_sec"], 2),
    }
    print(json.dumps(out), flush=True)

    if write_md:
        md = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ADVISOR_DEMO.md",
        )
        actions = "; ".join(f"{x.dataset}: {x.action} ({x.detail})" for x in applied)
        with open(md, "a") as f:
            f.write(f"""

## Closed loop — advise_all → apply_all → re-run (one command)

Generated by `python tools/advisor_closed_loop.py {sf_dir} --md`: from an
EMPTY HistoryDB, the instrumented runs record usages/shape/skew, and ONE
`apply_all` call re-places the catalog — no manual steps anywhere.

Applied: {actions}

| workload | before | after | speedup |
|---|---|---|---|
| lineitem⋈orders join+agg | {out['before']['join_sec']} s ({out['before']['join_exchanges']} Exchanges) | {out['after']['join_sec']} s ({out['after']['join_exchanges']} Exchanges) | {out['join_speedup']}× |
| fragmented scan+agg | {out['before']['scan_sec']} s ({out['before']['scan_files']} files) | {out['after']['scan_sec']} s ({out['after']['scan_files']} files) | {out['scan_speedup']}× |
| skewed fact⋈dim (hint-salted) | {out['before']['skew_sec']} s | {out['after']['skew_sec']} s | {out['skew_speedup']}× |
| key-range scan (range_zonemap) | {out['before']['range_sec']} s ({out['before']['range_files']} files read) | {out['after']['range_sec']} s ({out['after']['range_files']} files read) | {out['range_speedup']}× |
| 2-D box scan (zorder) | {out['before']['zorder_sec']} s ({out['before']['zorder_files']} files read) | {out['after']['zorder_sec']} s ({out['after']['zorder_files']} files read) | {out['zorder_speedup']}× |
""")


if __name__ == "__main__":
    main()
