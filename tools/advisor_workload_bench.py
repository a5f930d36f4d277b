"""Whole-workload advisor before/after — the reference's headline
experiment shape (reference documentation.md:5-9: total workload
runtimes before vs after self-learning placement, measured end-to-end),
run on THIS repo's real workload: all 192 registry queries.

Rounds 9-10 proved the closed loop on REPRESENTATIVE queries (tpch_q12
2.18x, q06 1.09x, the documents dedup family 1.19x).  This tool produces
the number those proofs stood in for: the full registry, UNMODIFIED,
re-run against an advisor-placed catalog, with every regression listed
and priced.

Protocol (apples-to-apples by construction):
  0. every base table is copied into a catalog twice: ``db.t`` (the
     advisable copy) and ``db.t_flat`` (a frozen flat twin) — both
     passes below read CATALOG copies through the base-table binding
     (lachesis_spark.binding), so copy artifacts (file count, encoding)
     cancel out and the measured delta is the LAYOUT;
  1. warm+record pass: the registry runs once bound to the flat copies —
     un-timed warm-up (staged streaming dirs, codegen caches) AND the
     history recording (runtime + plan-captured shuffle/filter/joinpair
     usages per query, like the reference recording every job);
  2. BEFORE pass: registry timed against the flat copies;
  3. advise_all with measured arbitration: contested datasets
     (layout_candidates, incl. the keep_flat no-op arm) are A/B-measured
     on their own top recorded consumers, re-laying ``db.t`` per
     candidate; the measured-reward argmax wins (bandit.
     arbitrate_by_reward); bucket winners pin their co-shuffle partner;
  4. everything reset flat, then apply_all places the final catalog;
  5. AFTER pass: registry timed against the placed copies;
  6. CONTROL pass: registry timed against the flat twins — same layout
     as BEFORE, run last, so single-session drift (JVM/GC accumulation
     over ~800 query executions) is measured instead of assumed; the
     drift-normalized speedup divides it out.

Row-count parity between the passes is asserted per query (a layout must
never change answers; the close-of-round strict sweep re-proves value
equality on the unbound path).

Usage:
    python tools/advisor_workload_bench.py [sf_dir] [--md] [--limit N]
                                           [--paired]
Prints progress to stderr, one JSON line to stdout; --md appends the
report to ADVISOR_DEMO.md.

``--paired`` replaces the three sequential whole-registry passes
(BEFORE / AFTER / CONTROL) with ONE paired pass run after placement:
each query executes flat and placed BACK-TO-BACK (seconds apart, not
~10 minutes apart), with the arm order alternating by query index and
2 reps per arm (min taken).  Sequential passes measure layout + session
drift entangled — rounds 9-11 measured that drift at ±8-11% over a
pass, the same order as the layout effect, so the sequential total
"lands anywhere in 1.02-1.18x" (ADVISOR_DEMO.md).  Pairing cancels the
drift term per query; the report carries a bootstrap 95% CI over query
resamples and an order-split check (flat-first vs placed-first halves)
so order effects are priced, not assumed away.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lachesis_spark.advisor import (
    HistoryDB,
    LinUCBPlacementOptimizer,
    PlacementContext,
    arbitrate_by_reward,
    candidate_id,
    measure_key_cardinality,
)
from lachesis_spark.advisor.apply import apply_all, rewrite_layout
from lachesis_spark.binding import bound, catalog_resolver
from lachesis_spark.catalog import Catalog
from lachesis_spark.session import get_spark

BASE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
N_BUCKETS = 32      # == local cores so parallelism_floor no-ops on buckets
REP_CAP_SEC = 5.0   # representatives cost-capped: arbitration is O(reps)
REP_FAMILIES = 5    # top consumer from each of the dataset's heaviest
# consumer FAMILIES measured per candidate — top-N-global reps let a
# layout win big on one family while silently taxing every other reader
# (round 11's paired pass caught events' bucket_by winning 2.0x on its
# top-3 reps while the full evt family regressed 0.79x: the cost fell
# on consumers the reps never sampled)
REP_RUNS = 3        # 1 warm + 2 timed (min) per representative
GUARD_MARGIN = 0.03  # a rewrite must beat doing nothing by >3% measured —
# at 100 TB a relayout has a real write cost and a near-tie is noise, so
# ties and coin-flips keep the flat layout
MIN_PLACE_BYTES = 4 << 20   # a table this small broadcasts at any scale
MIN_PLACE_RUNTIME = 5.0     # ... UNLESS its consumers carry real runtime:
# at bench SF the heavy tables (documents: the dedup family's whole input)
# are sub-MB on disk, so bytes alone is the wrong floor — a dataset
# qualifies for placement by SIZE or by RECORDED CONSUMER RUNTIME, and
# everything else keeps flat (logged, never silently)


def _release_all_blocks(spark) -> None:
    spark.catalog.clearCache()
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()


def run_pass(spark, sf_dir, names, record_into=None):
    """One registry pass: {query: sec}, {query: rows}.  With
    ``record_into`` (a HistoryDB), also records every query's runtime and
    plan-captured usages — the warm+record pass."""
    import re

    from lachesis_spark.advisor import capture_usages_from_plan
    from lachesis_spark.registry import QUERIES

    timings, counts = {}, {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        sec = time.perf_counter() - t0
        timings[name] = round(sec, 3)
        counts[name] = n
        if record_into is not None:
            try:
                usages = [
                    u for u in capture_usages_from_plan(df)
                    if not re.match(r"part-\d{5}-", u.dataset)
                ]
            except Exception:
                usages = []
            record_into.record_job(name, sec, usages)
        _release_all_blocks(spark)
    return timings, counts


PAIRED_REPS = 2  # runs per arm per query in --paired mode (min taken)


def run_paired(spark, sf_dir, names, res_flat, res_placed,
               reps=PAIRED_REPS):
    """Paired per-query measurement: for each query, both arms run
    back-to-back (order alternating by query index so neither arm
    systematically goes first/warm-second), ``reps`` runs per arm, min
    per arm.  Host/session drift moves minutes-scale; within-pair runs
    are seconds apart, so the per-query comparison is drift-free to
    first order."""
    from lachesis_spark.registry import QUERIES

    times: dict[str, dict[str, list[float]]] = {
        n: {"flat": [], "placed": []} for n in names
    }
    flat_c, placed_c = {}, {}
    # reps are SEPARATED full-registry rounds (minutes apart), not
    # adjacent runs: a transient session pathology (round-11 observed a
    # Python-worker stall inflating one query 12x across two adjacent
    # reps) must persist for the whole pass to survive the cross-round
    # min.  Arm order flips with the round index too, so every query is
    # measured in BOTH orders and per-query order bias cancels in the
    # min, not just in the alternating-index aggregate.
    for rnd in range(reps):
        for i, name in enumerate(names):
            order = [("flat", res_flat), ("placed", res_placed)]
            if (i + rnd) % 2:
                order.reverse()
            for arm, res in order:
                with bound(res):
                    t0 = time.perf_counter()
                    n = QUERIES[name](spark, sf_dir).count()
                    times[name][arm].append(time.perf_counter() - t0)
                (flat_c if arm == "flat" else placed_c)[name] = n
                _release_all_blocks(spark)
        print(f"   paired round {rnd + 1}/{reps} done",
              file=sys.stderr, flush=True)
    flat_t = {n: round(min(times[n]["flat"]), 3) for n in names}
    placed_t = {n: round(min(times[n]["placed"]), 3) for n in names}
    for n in names:
        print(f"   pair {n}: flat {flat_t[n]:.2f}s / placed "
              f"{placed_t[n]:.2f}s", file=sys.stderr, flush=True)
    return flat_t, placed_t, flat_c, placed_c


def paired_stats(names, flat_t, placed_t):
    """Bootstrap 95% CI on the total-ratio speedup (resampling query
    PAIRS, so the per-query pairing is preserved) plus the index-split
    check: the speedup computed on even-index vs odd-index queries
    separately.  With round-flipped arm orders every query is measured
    in both orders, so the two halves are symmetric by construction and
    disagreement flags residual session effects, not order bias."""
    import numpy as np

    f = np.array([flat_t[n] for n in names])
    p = np.array([placed_t[n] for n in names])
    rng = np.random.RandomState(0)
    idx = rng.randint(0, len(names), size=(10_000, len(names)))
    ratios = f[idx].sum(axis=1) / p[idx].sum(axis=1)
    lo, hi = np.percentile(ratios, [2.5, 97.5])
    even = [i for i in range(len(names)) if i % 2 == 0]
    odd = [i for i in range(len(names)) if i % 2 == 1]
    return {
        "speedup_ci95": [round(float(lo), 3), round(float(hi), 3)],
        "wins": int((p < f).sum()),
        "losses": int((p > f).sum()),
        "order_split": {
            "flat_first_speedup": round(
                float(f[even].sum() / p[even].sum()), 3),
            "placed_first_speedup": round(
                float(f[odd].sum() / p[odd].sum()), 3),
        },
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    write_md = "--md" in sys.argv
    paired = "--paired" in sys.argv
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])

    spark = get_spark("advisor_workload_bench")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from lachesis_spark.registry import QUERIES

    names = sorted(QUERIES)[:limit] if limit else sorted(QUERIES)

    # ---- 0. catalog with flat advisable copies + frozen flat twins
    root = tempfile.mkdtemp(prefix="advisor_workload_")
    cat = Catalog(spark, root)
    cat.create_database("db")
    for t in BASE_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        cat.write_set(df, "db", t)
        cat.write_set(df, "db", f"{t}_flat")
    res_placed = catalog_resolver(cat, "db", {t: t for t in BASE_TABLES})
    res_flat = catalog_resolver(
        cat, "db", {t: f"{t}_flat" for t in BASE_TABLES}
    )

    def table_bytes(t: str) -> int:
        p = cat.set_path("db", f"{t}_flat")
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".parquet")
        )

    def reset_flat(tables=BASE_TABLES) -> None:
        for t in tables:
            cat.write_set(cat.read_set("db", f"{t}_flat"), "db", t)

    # ---- 1. warm + record
    history = HistoryDB(":memory:")
    print("== pass 0: warm + record ==", file=sys.stderr, flush=True)
    with bound(res_placed):
        t0 = time.perf_counter()
        warm_t, _ = run_pass(spark, sf_dir, names, record_into=history)
        print(f"   {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def recorded_runtime(t: str) -> float:
        return history.con.execute(
            """
            SELECT coalesce(sum(rt), 0) FROM (
                SELECT j.id, max(j.runtime_sec) AS rt
                FROM jobs j JOIN key_usage u ON u.job_id = j.id
                WHERE u.dataset = ? AND u.op != 'joinpair'
                GROUP BY j.id
            )
            """,
            (t,),
        ).fetchone()[0]

    placeable = {
        t for t in BASE_TABLES
        if table_bytes(t) >= MIN_PLACE_BYTES
        or recorded_runtime(t) >= MIN_PLACE_RUNTIME
    }
    below_floor = sorted(set(BASE_TABLES) - placeable)
    print(f"below the placement floor ({MIN_PLACE_BYTES >> 20} MB or "
          f"{MIN_PLACE_RUNTIME}s recorded consumer runtime) — kept flat: "
          f"{below_floor}", file=sys.stderr)

    # ---- 2. BEFORE (sequential mode only; in --paired mode the flat
    # arm is measured inside the paired pass, and the warm-pass timings
    # stand in for representative selection / cost caps)
    if paired:
        before, before_counts = warm_t, None
    else:
        print("== pass 1: BEFORE (flat) ==", file=sys.stderr, flush=True)
        with bound(res_placed):
            before, before_counts = run_pass(spark, sf_dir, names)
        print(f"   total {sum(before.values()):.1f}s", file=sys.stderr)

    # representatives per dataset: its top recorded consumers, cost-capped
    def representatives(dataset: str) -> list[str]:
        rows = history.con.execute(
            """
            SELECT j.name, max(j.runtime_sec) AS rt
            FROM jobs j JOIN key_usage u ON u.job_id = j.id
            WHERE u.dataset = ? AND u.op != 'joinpair'
            GROUP BY j.name ORDER BY rt DESC
            """,
            (dataset,),
        ).fetchall()
        fam_top: dict[str, str] = {}
        fam_rt: dict[str, float] = {}
        for n, rt in rows:
            if n not in before or rt > REP_CAP_SEC:
                continue
            f = n.split("_", 1)[0]
            fam_top.setdefault(f, n)  # rows ordered rt desc → family top
            fam_rt[f] = fam_rt.get(f, 0.0) + rt
        fams = sorted(fam_top, key=lambda f: -fam_rt[f])[:REP_FAMILIES]
        return [fam_top[f] for f in fams]

    def measure_reps(reps: list[str]) -> tuple[float, dict[str, float]]:
        """(total_sec, per-rep-query seconds) — the breakdown makes a
        blown-up arm attributable to the query that carried it (a
        round-11 guard measured one arm 2.5x its other-run level and
        the total alone could not say which rep was responsible)."""
        per: dict[str, float] = {}
        from lachesis_spark.registry import QUERIES as Q

        with bound(res_placed):
            for name in reps:
                ts = []
                for _ in range(REP_RUNS):
                    t0 = time.perf_counter()
                    Q[name](spark, sf_dir).count()
                    ts.append(time.perf_counter() - t0)
                    _release_all_blocks(spark)
                per[name] = round(min(ts[1:]), 3)
        return sum(per.values()), per

    # ---- 3. advise with measured arbitration (keep_flat arm included)
    from lachesis_spark.advisor import advise_all

    linucb = LinUCBPlacementOptimizer(history, alpha=0.1)
    total_runtime = history.con.execute(
        "SELECT coalesce(sum(runtime_sec), 0) FROM jobs"
    ).fetchone()[0]
    arb_log: list[dict] = []
    pinned: dict[str, tuple] = {}  # partner -> (key_cols, winning pinner rec)

    def bucketworthy_partners(dataset: str, key_cols) -> list[tuple[str, tuple]]:
        """Co-shuffle partners that could actually benefit from a bucket
        pin: in the base set, not self, and with key cardinality >=
        N_BUCKETS — a 3-value key (o_orderstatus in one garbage joinpair
        row) gives 3 non-empty buckets out of 32, a parallelism collapse
        no join win repays."""
        out = []
        for d, k, _w in history.co_shuffle_partners(dataset, ",".join(key_cols)):
            if d not in BASE_TABLES or d == dataset:
                continue
            cols = tuple(k.split(","))
            flat = cat.read_set("db", f"{d}_flat")
            if measure_key_cardinality(flat, cols) >= N_BUCKETS:
                out.append((d, cols))
        return out

    def arbiter(dataset, cands):
        if dataset not in placeable:
            return None
        reps = representatives(dataset)
        if not reps:
            return None
        flat = cat.read_set("db", f"{dataset}_flat")
        # bucket-kind candidates need bucket-worthy key cardinality —
        # the same floor bucketworthy_partners enforces for pins.
        # Round-11 run: orders' own arbitration chose
        # bucket_by(o_orderstatus), 3 distinct values over 32 buckets =
        # 29 empty buckets, a parallelism collapse no join win repays
        # at any scale.  A layout that CANNOT be right at 1000
        # executors must not be measurable into winning at sf0.1.
        kept_cands = []
        for c in cands:
            if (
                c.kind in ("bucket_by", "bucket_range_grid")
                and measure_key_cardinality(flat, c.key_cols) < N_BUCKETS
            ):
                arb_log.append({
                    "dataset": dataset, "dropped": candidate_id(c),
                    "why": f"key cardinality < {N_BUCKETS} buckets",
                })
                continue
            kept_cands.append(c)
        cands = kept_cands
        if all(c.kind == "keep_flat" for c in cands):
            return next(c for c in cands if c.kind == "keep_flat")
        prof = history.scan_profile(dataset) or (1, 1, 0.0)
        contexts = {
            candidate_id(c): PlacementContext(
                total_bytes=prof[1],
                n_files=prof[0],
                key_cardinality=(
                    measure_key_cardinality(flat, c.key_cols)
                    if c.key_cols else 1
                ),
                runtime_weight=min(c.weight / max(total_runtime, 1e-9), 1.0),
            )
            for c in cands
        }
        def measure_candidate(cand):
            # the base is re-measured immediately before EACH candidate
            # (paired, like the whole-workload pass): a single base taken
            # at arbitration start lets session drift accumulate into
            # every later arm's reward
            reset_flat((dataset,))
            base, base_per = measure_reps(reps)
            partner = None
            rewrite_layout(
                cat, "db", dataset, cand.kind, cand.key_cols,
                n_buckets=N_BUCKETS, range_cols=cand.range_cols,
            )
            if cand.kind in ("bucket_by", "bucket_range_grid"):
                partners = bucketworthy_partners(dataset, cand.key_cols)
                if partners:
                    partner = partners[0]
                    rewrite_layout(
                        cat, "db", partner[0], "bucket_by", partner[1],
                        n_buckets=N_BUCKETS,
                    )
            after, after_per = measure_reps(reps)
            if partner is not None:
                reset_flat((partner[0],))
            arb_log.append({
                "dataset": dataset, "candidate": candidate_id(cand),
                "reps": reps, "before_sec": round(base, 3),
                "after_sec": round(after, 3),
                "before_per": base_per, "after_per": after_per,
                "reward": round((base - after) / max(base, 1e-9), 3),
            })
            print(f"   arb {dataset} {candidate_id(cand)}: "
                  f"{base:.2f}s -> {after:.2f}s", file=sys.stderr, flush=True)
            return base, after

        win = arbitrate_by_reward(linucb, dataset, cands, contexts,
                                  measure_candidate)
        # margin on REWARDS (each arm paired to its own just-measured
        # base, so rewards are drift-free; keep_flat's reward is the
        # session noise floor — flat measured against flat)
        rewards = {e["candidate"]: e["reward"] for e in arb_log
                   if e.get("dataset") == dataset and "candidate" in e}
        flat_rw = rewards.get("keep_flat:")
        if win.kind != "keep_flat" and flat_rw is not None:
            # keep_flat's arm measures flat against a flat base, so its
            # |reward| is the session's live measurement-noise floor for
            # THIS dataset's reps (observed swinging -0.10..+0.03 across
            # round-11 runs); a real layout effect must clear 2x that
            # floor, not just the static 3% margin
            floor = max(GUARD_MARGIN, 2.0 * abs(flat_rw))
            if not rewards[candidate_id(win)] > flat_rw + floor:
                win = next(c for c in cands if c.kind == "keep_flat")
                arb_log.append({
                    "dataset": dataset,
                    "margin": f"winner within the measured noise floor "
                              f"({floor:.0%}) of keep_flat — staying flat"})
        arb_log.append({"dataset": dataset, "chosen": candidate_id(win)})
        if win.kind in ("bucket_by", "bucket_range_grid"):
            for d, cols in bucketworthy_partners(dataset, win.key_cols):
                pinned[d] = (cols, win)
                break
        reset_flat((dataset,))
        return win

    print("== advise + arbitrate ==", file=sys.stderr, flush=True)
    arbitrated: set[str] = set()

    def arbiter_tracking(dataset, cands):
        win = arbiter(dataset, cands)
        if win is not None:
            arbitrated.add(dataset)
        return win

    reports = advise_all(history, n_buckets=N_BUCKETS,
                         arbiter=arbiter_tracking)

    # every rewrite must BEAT doing nothing: a layout the blind rule chose
    # UNCONTESTED never reached the arbiter, but it still rewrites data the
    # whole workload reads — measure it against the keep_flat no-op on the
    # dataset's own top consumers and keep the winner.  (The smoke run
    # that motivated this: embeddings' uncontested range_zonemap(vec_id)
    # regressed the ann family 0.76x — a payoff model must price the rule
    # too, not only the contested conflicts.)
    import dataclasses as _dc

    from lachesis_spark.advisor import LayoutRecommendation as _LR

    guarded = []
    for r in reports:
        lay = r.layout
        if lay is None or lay.kind == "keep_flat" or r.dataset in arbitrated:
            guarded.append(r)
            continue
        if r.dataset in BASE_TABLES and r.dataset not in placeable:
            arb_log.append({"dataset": r.dataset,
                            "kept": "keep_flat:",
                            "why": "below placement floor"})
            guarded.append(_dc.replace(
                r, layout=_LR(r.dataset, "keep_flat", (), lay.weight)))
            continue
        if r.dataset not in BASE_TABLES:
            guarded.append(r)
            continue
        reps = representatives(r.dataset)
        if not reps:
            guarded.append(r)
            continue
        # same bucket-cardinality floor as the arbiter: an uncontested
        # rule pick can carry a low-cardinality bucket key too
        if (
            lay.kind in ("bucket_by", "bucket_range_grid")
            and measure_key_cardinality(
                cat.read_set("db", f"{r.dataset}_flat"), lay.key_cols
            ) < N_BUCKETS
        ):
            arb_log.append({
                "dataset": r.dataset, "dropped": candidate_id(lay),
                "why": f"key cardinality < {N_BUCKETS} buckets",
                "kept": "keep_flat:",
            })
            guarded.append(_dc.replace(
                r, layout=_LR(r.dataset, "keep_flat", (), lay.weight)))
            continue
        reset_flat((r.dataset,))
        base, base_per = measure_reps(reps)
        rewrite_layout(cat, "db", r.dataset, lay.kind, lay.key_cols,
                       n_buckets=N_BUCKETS, range_cols=lay.range_cols)
        placed_sec, placed_per = measure_reps(reps)
        reset_flat((r.dataset,))
        win = placed_sec < base * (1 - GUARD_MARGIN)
        arb_log.append({
            "dataset": r.dataset, "guard": candidate_id(lay), "reps": reps,
            "flat_sec": round(base, 3), "placed_sec": round(placed_sec, 3),
            "flat_per": base_per, "placed_per": placed_per,
            "kept": candidate_id(lay) if win else "keep_flat:",
        })
        print(f"   guard {r.dataset} {candidate_id(lay)}: flat {base:.2f}s"
              f" vs placed {placed_sec:.2f}s -> "
              f"{'apply' if win else 'keep flat'}",
              file=sys.stderr, flush=True)
        if not win:
            r = _dc.replace(
                r, layout=_LR(r.dataset, "keep_flat", (), lay.weight)
            )
        guarded.append(r)
    reports = guarded

    # partner pins: a bucket winner was MEASURED with its partner bucketed
    # alongside, so the final placement should honor that pairing — BUT a
    # pin that overrides the partner's OWN measured winner is itself an
    # unmeasured placement (round-11 first run: a pin replaced orders'
    # guard-measured zorder with an unmeasured bucket).  Nothing lands
    # unmeasured: the pin must BEAT the partner's own winner in a measured
    # A/B on the partner's reps, run with the pinner already placed in its
    # winning layout (the world the pairing claim is about).
    if pinned:
        import dataclasses

        from lachesis_spark.advisor import LayoutRecommendation

        fixed = []
        for r in reports:
            pin = pinned.get(r.dataset)
            lay = r.layout
            if pin is not None and not (
                lay is not None
                and lay.kind in ("bucket_by", "bucket_range_grid")
                and tuple(lay.key_cols) == pin[0]
            ):
                pin_cols, pinner = pin
                reps = representatives(r.dataset)
                if reps:
                    reset_flat((r.dataset, pinner.dataset))
                    rewrite_layout(
                        cat, "db", pinner.dataset, pinner.kind,
                        pinner.key_cols, n_buckets=N_BUCKETS,
                        range_cols=pinner.range_cols,
                    )
                    if lay is not None and lay.kind != "keep_flat":
                        rewrite_layout(
                            cat, "db", r.dataset, lay.kind, lay.key_cols,
                            n_buckets=N_BUCKETS, range_cols=lay.range_cols,
                        )
                    own_sec, own_per = measure_reps(reps)
                    reset_flat((r.dataset,))
                    rewrite_layout(cat, "db", r.dataset, "bucket_by",
                                   pin_cols, n_buckets=N_BUCKETS)
                    pin_sec, pin_per = measure_reps(reps)
                    reset_flat((r.dataset, pinner.dataset))
                    take_pin = pin_sec < own_sec * (1 - GUARD_MARGIN)
                    arb_log.append({
                        "dataset": r.dataset,
                        "pin_ab": f"bucket_by:{','.join(pin_cols)}",
                        "pinner": f"{pinner.dataset}:{candidate_id(pinner)}",
                        "own_sec": round(own_sec, 3),
                        "pin_sec": round(pin_sec, 3),
                        "own_per": own_per, "pin_per": pin_per,
                        "kept": (f"bucket_by:{','.join(pin_cols)}"
                                 if take_pin else
                                 candidate_id(lay) if lay else "keep_flat:"),
                    })
                    print(f"   pin A/B {r.dataset}: own {own_sec:.2f}s vs "
                          f"pin {pin_sec:.2f}s -> "
                          f"{'pin' if take_pin else 'own winner'}",
                          file=sys.stderr, flush=True)
                    if take_pin:
                        lay = LayoutRecommendation(
                            r.dataset, "bucket_by", pin_cols,
                            lay.weight if lay else 0.0,
                        )
                else:
                    arb_log.append({"dataset": r.dataset,
                                    "pin_skipped": "no representatives"})
            fixed.append(dataclasses.replace(r, layout=lay))
        reports = fixed

    # ---- 4. reset, apply the final placement
    reset_flat()
    applied = apply_all(
        cat, reports, {t: ("db", t) for t in BASE_TABLES},
        n_buckets=N_BUCKETS,
    )
    placement = [
        {"dataset": a.dataset, "action": a.action, "detail": a.detail}
        for a in applied
    ]
    print("APPLIED:", placement, file=sys.stderr, flush=True)

    if paired:
        # ---- 5P. PAIRED pass: both arms back-to-back per query
        print(f"== paired pass (flat vs placed, {PAIRED_REPS} reps/arm,"
              " order alternating) ==", file=sys.stderr, flush=True)
        before, after, before_counts, after_counts = run_paired(
            spark, sf_dir, names, res_flat, res_placed)
        control = None
        print(f"   flat {sum(before.values()):.1f}s vs placed "
              f"{sum(after.values()):.1f}s", file=sys.stderr)
        mismatches = sorted(
            n for n in names if before_counts[n] != after_counts[n]
        )

        # ---- 5V. post-validation: the paired pass is the FULL-workload
        # measurement the per-dataset arbitration (bounded to ~5 family
        # representatives) approximated — so close the loop with it: a
        # placed dataset whose READERS net-lose under pairing is
        # REVERTED to flat.  This is the reference's self-learning shape
        # end-to-end: rule -> representative arbitration -> whole-
        # workload validation -> correction, every step measured.
        validation = []
        reader_sets: dict[str, set] = {}
        for p in placement:
            if p["action"] == "keep_flat":
                continue
            ds = p["dataset"]
            readers = sorted(set(n for (n,) in history.con.execute(
                """
                SELECT DISTINCT j.name FROM jobs j
                JOIN key_usage u ON u.job_id = j.id
                WHERE u.dataset = ? AND u.op != 'joinpair'
                """, (ds,),
            ).fetchall()) & set(names))
            reader_sets[ds] = set(readers)
            fsec = sum(before[q] for q in readers)
            psec = sum(after[q] for q in readers)
            confirmed = psec < fsec
            validation.append({
                "dataset": ds, "layout": f"{p['action']}:{p['detail']}",
                "n_readers": len(readers),
                "readers_flat_sec": round(fsec, 2),
                "readers_placed_sec": round(psec, 2),
                "net_sec": round(fsec - psec, 2),
                "verdict": "confirmed" if confirmed else "reverted",
            })
            print(f"   validate {ds}: readers flat {fsec:.1f}s vs placed "
                  f"{psec:.1f}s -> "
                  f"{'confirmed' if confirmed else 'REVERTED'}",
                  file=sys.stderr, flush=True)
            if not confirmed:
                reset_flat((ds,))
                p["action"], p["detail"] = "keep_flat", ""
                p["note"] = "reverted by paired whole-workload validation"

        # projected total under the VALIDATED placement: a query reading
        # only reverted datasets runs at its measured flat time; a query
        # touching any confirmed placement keeps its measured placed
        # time (conservative for mixed readers — their reverted-side
        # loss stays priced in)
        revset = {v["dataset"] for v in validation
                  if v["verdict"] == "reverted"}
        confset = {v["dataset"] for v in validation
                   if v["verdict"] == "confirmed"}
        projected = {}
        for q in names:
            in_rev = any(q in reader_sets[ds] for ds in revset)
            in_conf = any(q in reader_sets[ds] for ds in confset)
            projected[q] = before[q] if (in_rev and not in_conf) else after[q]
        validated_projection = {
            "projected_placed_sec": round(sum(projected.values()), 1),
            "projected_speedup": round(
                sum(before.values()) / sum(projected.values()), 3),
        }
    else:
        # ---- 5. AFTER
        print("== pass 2: AFTER (placed) ==", file=sys.stderr, flush=True)
        with bound(res_placed):
            after, after_counts = run_pass(spark, sf_dir, names)
        print(f"   total {sum(after.values()):.1f}s", file=sys.stderr)

        # ---- 6. CONTROL (flat twins, run last: prices session drift)
        print("== pass 3: CONTROL (flat) ==", file=sys.stderr, flush=True)
        with bound(res_flat):
            control, control_counts = run_pass(spark, sf_dir, names)
        print(f"   total {sum(control.values()):.1f}s", file=sys.stderr)

        mismatches = sorted(
            n for n in names
            if not (before_counts[n] == after_counts[n]
                    == control_counts[n])
        )

    def family(q: str) -> str:
        return q.split("_", 1)[0]

    fams = sorted({family(n) for n in names})
    fam_rows = []
    for f in fams:
        qs = [n for n in names if family(n) == f]
        b, a = (sum(d[q] for q in qs) for d in (before, after))
        row = {
            "family": f, "queries": len(qs), "before_sec": round(b, 2),
            "after_sec": round(a, 2),
            "speedup": round(b / a, 3) if a else None,
        }
        if control is not None:
            row["control_sec"] = round(sum(control[q] for q in qs), 2)
        fam_rows.append(row)
    regressions = sorted(
        (
            {"query": n, "before_sec": before[n], "after_sec": after[n],
             "ratio": round(after[n] / before[n], 2)}
            for n in names
            if after[n] > 1.15 * before[n] and after[n] - before[n] > 0.1
        ),
        key=lambda r: -r["ratio"],
    )
    tb, ta = sum(before.values()), sum(after.values())
    out = {
        "sf_dir": sf_dir, "n_queries": len(names),
        "mode": "paired" if paired else "sequential",
        "total_before_sec": round(tb, 1), "total_after_sec": round(ta, 1),
        "workload_speedup": round(tb / ta, 3),
        "placement": placement,
        "arbitration": arb_log,
        "families": fam_rows,
        "regressions": regressions,
        "count_mismatches": mismatches,
    }
    if paired:
        out["paired_reps"] = PAIRED_REPS
        out["validation"] = validation
        out["validated_projection"] = validated_projection
        out.update(paired_stats(names, before, after))
    else:
        tc = sum(control.values())
        out["total_control_sec"] = round(tc, 1)
        out["drift_normalized_speedup"] = round((tb / ta) * (tc / tb), 3)
    print(json.dumps(out), flush=True)

    if write_md:
        if paired:
            _write_md_paired(out, sf_dir)
        else:
            _write_md(out, sf_dir, names, before, after, control)


def _write_md_paired(out, sf_dir) -> None:
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ADVISOR_DEMO.md",
    )
    fam_rows = "\n".join(
        f"| {f['family']} | {f['queries']} | {f['before_sec']} | "
        f"{f['after_sec']} | x{f['speedup']} |"
        for f in out["families"]
    )
    arb_rows = "\n".join(
        f"| {e['dataset']} | `{e['candidate']}` | {e['before_sec']} | "
        f"{e['after_sec']} | {e['reward']} |"
        for e in out["arbitration"] if "candidate" in e
    )
    placed = "; ".join(
        f"{p['dataset']}: {p['action']}({p['detail']})"
        + (" [reverted]" if "note" in p else "")
        for p in out["placement"]
    ) or "none"
    val_rows = "\n".join(
        f"| {v['dataset']} | `{v['layout']}` | {v['n_readers']} | "
        f"{v['readers_flat_sec']} | {v['readers_placed_sec']} | "
        f"{v['net_sec']} | **{v['verdict']}** |"
        for v in out["validation"]
    ) or "| (nothing placed) | | | | | | |"
    reg_rows = "\n".join(
        f"| `{r['query']}` | {r['before_sec']} | {r['after_sec']} | "
        f"x{r['ratio']} |"
        for r in out["regressions"]
    ) or "| (none above the 1.15x / 0.1s reporting floor) | | | |"
    lo, hi = out["speedup_ci95"]
    osplit = out["order_split"]
    with open(md, "a") as f:
        f.write(f"""

## Paired whole-workload measurement: {out['n_queries']} queries, flat vs advisor-placed, drift cancelled by construction (round 11)

Generated by `python tools/advisor_workload_bench.py {sf_dir} --paired --md`.
The sequential BEFORE/AFTER/CONTROL protocol above measures layout +
session drift entangled (±8-11% per pass — the run-C/run-D paragraphs);
this run instead measures each query's two arms BACK-TO-BACK (seconds
apart), in {out['paired_reps']} full-registry rounds separated by
minutes with the arm order flipping per round (min per arm across
rounds), after the same warm+record / measured-arbitration / placement
steps.  Drift cancels inside each pair, order bias cancels across
rounds, and a transient session pathology must persist for the whole
pass to survive the cross-round min.

**Paired workload speedup: x{out['workload_speedup']}** (flat
{out['total_before_sec']} s vs placed {out['total_after_sec']} s;
bootstrap 95% CI over query resamples **x{lo}–x{hi}**; placed wins
{out['wins']} / loses {out['losses']} of {out['n_queries']} queries).
Index-split consistency check (both halves saw both orders):
even-half x{osplit['flat_first_speedup']}, odd-half
x{osplit['placed_first_speedup']}.

Final placement after paired validation (measured arbitration chose,
the paired whole-workload pass confirmed or REVERTED — a placed
dataset whose readers net-lose under pairing goes back to flat):
{placed}.

Validation verdicts (per placed dataset, net paired effect over ALL its
recorded reader queries — the full-workload check the ~5-representative
arbitration approximated):

| dataset | layout | readers | flat s | placed s | net s | verdict |
|---|---|---|---|---|---|---|
{val_rows}

Projected total under the VALIDATED placement (reverted datasets'
readers at their measured flat times):
**x{out['validated_projection']['projected_speedup']}**
({out['validated_projection']['projected_placed_sec']} s).

| dataset | candidate | reps before s | reps after s | reward |
|---|---|---|---|---|
{arb_rows}

Per-family paired totals:

| family | n | flat s | placed s | speedup |
|---|---|---|---|---|
{fam_rows}

Every query regressing >15% and >0.1s under pairing (these are REAL
layout costs, not drift — each number is a back-to-back comparison):

| query | flat s | placed s | ratio |
|---|---|---|---|
{reg_rows}

Row-count parity held on {out['n_queries'] - len(out['count_mismatches'])}
of {out['n_queries']} queries{' — MISMATCHES: ' + ', '.join(out['count_mismatches']) if out['count_mismatches'] else ''}.
""")


def _write_md(out, sf_dir, names, before, after, control) -> None:
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ADVISOR_DEMO.md",
    )
    fam_rows = "\n".join(
        f"| {f['family']} | {f['queries']} | {f['before_sec']} | "
        f"{f['after_sec']} | {f['control_sec']} | x{f['speedup']} |"
        for f in out["families"]
    )
    arb_rows = "\n".join(
        f"| {e['dataset']} | `{e['candidate']}` | {e['before_sec']} | "
        f"{e['after_sec']} | {e['reward']} |"
        for e in out["arbitration"] if "candidate" in e
    )
    chosen = "; ".join(
        f"{e['dataset']} → `{e['chosen']}`"
        for e in out["arbitration"] if "chosen" in e
    )
    placed = "; ".join(
        f"{p['dataset']}: {p['action']}({p['detail']})"
        for p in out["placement"]
    ) or "none"
    reg_rows = "\n".join(
        f"| `{r['query']}` | {r['before_sec']} | {r['after_sec']} | "
        f"x{r['ratio']} |"
        for r in out["regressions"]
    ) or "| (none above the 1.15x / 0.1s reporting floor) | | | |"
    with open(md, "a") as f:
        f.write(f"""

## Whole-workload before/after: all {out['n_queries']} registry queries vs the advisor-placed catalog (round 11)

Generated by `python tools/advisor_workload_bench.py {sf_dir} --md` — the
reference's headline experiment shape (documentation.md:5-9: total
workload runtime before vs after self-learning placement), on the full
registry.  Both passes read CATALOG copies through the base-table
binding (`lachesis_spark/binding.py`), so the measured delta is the
LAYOUT, not copy artifacts; a final flat CONTROL pass re-measures the
before-layout after ~800 same-session query executions to price
single-session drift instead of assuming it away.

| pass | layout | total s |
|---|---|---|
| BEFORE | flat copies | {out['total_before_sec']} |
| AFTER | advisor-placed | {out['total_after_sec']} |
| CONTROL (last) | flat twins | {out['total_control_sec']} |

**Workload speedup: x{out['workload_speedup']}** (drift-normalized
x{out['drift_normalized_speedup']}: control/before =
x{round(out['total_control_sec']/out['total_before_sec'], 3)} prices the
session drift the AFTER pass also carried).

Placement chosen by the advisor (measured arbitration on contested
datasets, incl. the keep_flat no-op arm): {placed}.
Arbitration winners: {chosen or "(none contested)"}.

| dataset | candidate | reps before s | reps after s | reward |
|---|---|---|---|---|
{arb_rows}

Per-family totals (queries grouped by name prefix):

| family | n | before s | after s | control s | speedup |
|---|---|---|---|---|---|
{fam_rows}

Every query regressing >15% and >0.1s on the placed catalog:

| query | before s | after s | ratio |
|---|---|---|---|
{reg_rows}

Row-count parity held on {out['n_queries'] - len(out['count_mismatches'])}
of {out['n_queries']} queries{' — MISMATCHES: ' + ', '.join(out['count_mismatches']) if out['count_mismatches'] else ''}.
""")


if __name__ == "__main__":
    main()
