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
    LinUCBPlacementOptimizer,
    PlacementContext,
    capture_usages_from_plan,
    measure_key_cardinality,
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
    """Steady-state seconds: min over the post-warm-up runs (the first run
    absorbs JIT/C2 + footer reads; min is the stablest location statistic
    for a warm single-machine microbenchmark)."""
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.count()
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])


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

    # ----- dimension 3: contextual bandit vs the frequency rule.  Workload
    # mix where the RUNTIME-WEIGHTED MOST-FREQUENT key (l_returnflag,
    # cardinality 3) is NOT the best layout key: its aggregation already
    # collapses map-side (partial agg sends 3 rows per task), so bucketing
    # on it buys ~nothing — and at scale actively hurts by capping the agg
    # at 3 tasks — while the less-frequent l_orderkey join is the workload's
    # only real shuffle.  The rule-based recommender must pick returnflag
    # (by construction of the history); LinUCB's cardinality feature learns
    # to override frequency from measured rewards.
    # orders side fixed (bucketed on its join key) in every branch — only
    # lineitem's layout is the decision under test.  The unbucketed baseline
    # is written at ~1 file per core — the shape the advisor's own file-size
    # rule targets — so the flag-key layout's parallelism collapse (3
    # non-empty buckets on a 32-core box) is measured against a competent
    # plain layout, not a degenerate single-split one.
    cat.write_set(od, "db", "orders_fixed", bucket_by=(N_BUCKETS, ["o_orderkey"]))
    od_fixed = spark.table("db_orders_fixed")
    # 8× key-shifted amplification: enough rows that stage parallelism and
    # shuffle volume — not task overhead — dominate the measurements (the
    # regime every choice here is actually about)
    import functools

    li_cols = li.select("l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_quantity")
    max_ok = li_cols.agg(F.max("l_orderkey")).first()[0] + 1
    li_amp = functools.reduce(
        lambda x, y: x.unionByName(y),
        [li_cols.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok))
         for i in range(8)],
    )
    cat.write_set(li_amp.repartition(32), "db", "li_base")
    a3 = cat.read_set("db", "li_base")

    def flag_agg(li_df):
        # CPU-bound per-row agg (t-digest sketches): wall-clock tracks the
        # stage's PARALLELISM, so a layout that collapses the agg to 3
        # bucket-tasks pays for it — the effect low-cardinality bucketing
        # has on any real aggregation at scale
        return li_df.groupBy("l_returnflag").agg(
            F.expr(
                "percentile_approx(l_extendedprice,"
                " array(0.05,0.1,0.25,0.5,0.75,0.9,0.95), 50000)"
            ).alias("pct"),
            F.expr(
                "percentile_approx(l_quantity, array(0.1,0.5,0.9), 50000)"
            ).alias("pct_q"),
        )

    def ok_join(li_df, od_df):
        return (
            li_df.join(od_df, li_df["l_orderkey"] == od_df["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s"))
        )

    h3 = HistoryDB(":memory:")
    t_flag_one = run_timed(flag_agg(a3))
    t_join_one = run_timed(ok_join(a3, od_fixed))
    # the flag agg runs K_FLAG times per join run — sized so its runtime
    # weight dominates the history BY CONSTRUCTION (the scenario under
    # test: most-frequent key != best layout key)
    k_flag = max(3, int(t_join_one / max(t_flag_one, 1e-6)) + 2)

    def mix(li_df, od_df):
        """Whole workload mix, steady-state seconds."""
        return k_flag * run_timed(flag_agg(li_df)) + run_timed(
            ok_join(li_df, od_df)
        )

    from lachesis_spark.advisor.history import KeyUsage

    for i in range(k_flag):
        h3.record_job(
            f"flag_agg{i}", t_flag_one,
            [KeyUsage("lineitem", "aggregate", ("l_returnflag",))],
            scans=[scan_stat_for_set(cat, "db", "li_base")],
        )
    h3.record_job(
        "ok_join", t_join_one,
        [KeyUsage("lineitem", "join", ("l_orderkey",))],
        scans=[scan_stat_for_set(cat, "db", "li_base")],
    )

    rule_rec = recommend(h3, "lineitem", n_buckets=N_BUCKETS)
    assert rule_rec.key_cols == ("l_returnflag",), rule_rec  # frequency rule

    plain_mix_t = mix(a3, od_fixed)

    # measure both layouts once (the bandit pays this exploration cost, the
    # rule never re-examines its choice)
    weights = h3.key_weights("lineitem")
    total_w = sum(weights.values())
    prof = h3.scan_profile("db.li_base")
    layout_t: dict[str, float] = {}
    contexts: dict[str, PlacementContext] = {}
    for key in ("l_returnflag", "l_orderkey"):
        contexts[key] = PlacementContext(
            total_bytes=prof[1], n_files=prof[0],
            key_cardinality=measure_key_cardinality(a3, [key]),
            runtime_weight=weights.get(key, 0.0) / max(total_w, 1e-9),
        )
    opt = LinUCBPlacementOptimizer(h3)
    epochs = []
    for _ in range(4):
        rec = opt.choose("lineitem", contexts, n_buckets=N_BUCKETS)
        key = rec.key_cols[0]
        if key not in layout_t:
            cat.write_set(a3, "db", f"li_{key}", bucket_by=(N_BUCKETS, [key]))
            layout_t[key] = mix(spark.table(f"db_li_{key}"), od_fixed)
        epochs.append(key)
        opt.observe("lineitem", rec.key_cols, contexts[key],
                    plain_mix_t, layout_t[key])
    ctx_key = epochs[-1]
    assert ctx_key == "l_orderkey", epochs  # learned to override frequency

    rule_mix_t = layout_t["l_returnflag"]
    ctx_mix_t = layout_t["l_orderkey"]

    out = {
        "metric": "advisor_speedup",
        "sf_dir": sf_dir,
        "bandit": {
            "rule_key": list(rule_rec.key_cols),
            "ctx_key": ctx_key,
            "epochs": epochs,
            "k_flag": k_flag,
            "card": {k: contexts[k].key_cardinality for k in contexts},
            "plain_mix_sec": round(plain_mix_t, 3),
            "rule_mix_sec": round(rule_mix_t, 3),
            "ctx_mix_sec": round(ctx_mix_t, 3),
            "ctx_vs_rule_speedup": round(rule_mix_t / ctx_mix_t, 2),
        },
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

## Dimension 3: contextual bandit vs the frequency rule

The reference's DRL optimizer carried STATE (table size, key properties)
that the rule-based one ignored.  Reproduced here with LinUCB over
placement features (table bytes, file count, key cardinality, runtime
weight): a workload mix in which the runtime-weighted most-frequent key —
`l_returnflag`, cardinality {out['bandit']['card']['l_returnflag']} — is
NOT the best layout key (its agg already collapses map-side; a 3-value
bucketing also caps the agg at 3 tasks at scale), while the less-frequent
`l_orderkey` (cardinality {out['bandit']['card']['l_orderkey']}) join is
the workload's only real shuffle.
The flag agg runs {out['bandit']['k_flag']}× per join
run, so the frequency rule must pick it — and did
(`{'/'.join(out['bandit']['rule_key'])}`).  The bandit explored both arms
({' → '.join(out['bandit']['epochs'])}) and converged on
`{out['bandit']['ctx_key']}` from measured rewards:

| lineitem layout | workload-mix steady-state sec |
|---|---|
| plain parquet | {out['bandit']['plain_mix_sec']} |
| rule-based (bucket on {'/'.join(out['bandit']['rule_key'])}) | {out['bandit']['rule_mix_sec']} |
| contextual bandit (bucket on {out['bandit']['ctx_key']}) | {out['bandit']['ctx_mix_sec']} |

**Bandit beats the rule {out['bandit']['ctx_vs_rule_speedup']}× on the
same history** — the cardinality feature overrides frequency, which is
exactly the judgment the reference's DRL state machinery existed to make.
Trained weights transfer across datasets
(`test_advisor.py::test_linucb_transfers_to_unseen_dataset`).
""")

    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
