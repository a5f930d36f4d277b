"""Round-close drift triage: separate host drift from real level shifts
AUTOMATICALLY, so a per-query regression can never again hide inside the
"uniform band" prose (round-10 lesson: `dedup_containment`'s 7.5->11 s
step was labeled band drift without an isolated re-measure; the round-11
fresh-JVM triage attributed it to the host — but only because the judge
forced the question).

Why suite-vs-isolated comparison is NOT the verdict: a fresh-JVM isolated
run carries per-process fixed cost (JVM start amortization aside, codegen
and shuffle-service warm-up) that the in-suite number amortizes, so
"isolated > prior suite time" flags every small query.  The decisive
comparison is CODE-vs-CODE on the SAME host, SAME hour: measure each
mover isolated from the current tree AND from a git worktree of the prior
round's tree.  Ratio ~1 -> the step is the host's; ratio > tol -> the
plan really got slower (investigate).

Protocol per mover (worst decile by suite ratio, bounded below by
--floor seconds of current suite time — sub-floor queries are scheduling
scatter, listed but not isolated):
  1. fresh subprocess/JVM, warm-up rep + timed rep, current tree;
  2. same, from `git worktree add <prev-ref>`;
  3. verdict by iso_cur / iso_prev.

Usage:
    python tools/drift_triage.py --prev BENCH_r10.json --prev-ref d7d3b44 \
        [--cur BENCH_FULL.json] [--top 0] [--floor 0.5] [--tol 1.25] \
        [--sf-dir /root/testdata/sf0.1]

--top 0 (default) means ceil(len(common)/10) — the worst decile.
Without --prev-ref the tool still reports isolated current-tree numbers
but marks every verdict "no prior tree — inconclusive" rather than
guessing.  Output: a markdown section (stdout) ready to append to
BENCH_NOTES.md + one machine-readable JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_isolated import _CHILD  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver-recorded BENCH_r{N}.json wraps the line
        d = d["parsed"]
    return d["queries"] if "queries" in d else d


def measure_in_tree(tree: str, name: str, sf_dir: str) -> float:
    """One fresh-JVM steady-state measurement with `tree` on sys.path."""
    code = _CHILD.format(repo=tree, sf_dir=sf_dir, name=name)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ISOLATED_SEC="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"{name} in {tree}: no result\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True, help="prior round bench json")
    ap.add_argument("--prev-ref", default=None,
                    help="git ref of the prior round's tree (A/B measure)")
    ap.add_argument("--cur", default=os.path.join(REPO, "BENCH_FULL.json"))
    ap.add_argument("--top", type=int, default=0,
                    help="movers to isolate (0 = worst decile)")
    ap.add_argument("--floor", type=float, default=0.5,
                    help="min CURRENT suite seconds to qualify as a mover")
    ap.add_argument("--tol", type=float, default=1.25,
                    help="iso_cur/iso_prev ratio above which it's a shift")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    prev, cur = _load(args.prev), _load(args.cur)
    common = sorted(set(prev) & set(cur))
    ratios = {q: cur[q] / prev[q] for q in common if prev[q] > 0}
    movers = sorted(ratios, key=lambda q: -ratios[q])
    floored = [q for q in movers if cur[q] >= args.floor]
    n = args.top or max(1, math.ceil(len(common) / 10))
    picked = floored[:n]
    decile_cut = ratios[floored[n - 1]] if len(floored) >= n else float("inf")
    under_floor = [q for q in movers
                   if cur[q] < args.floor and ratios[q] >= decile_cut]

    prev_tree = None
    if args.prev_ref:
        prev_tree = tempfile.mkdtemp(prefix="drift_prev_")
        os.rmdir(prev_tree)
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", prev_tree,
             args.prev_ref],
            check=True, capture_output=True,
        )

    rows = []
    try:
        for q in picked:
            iso_cur = measure_in_tree(REPO, q, args.sf_dir)
            if prev_tree:
                iso_prev = measure_in_tree(prev_tree, q, args.sf_dir)
                r = iso_cur / iso_prev if iso_prev > 0 else float("inf")
                verdict = ("LEVEL SHIFT — investigate" if r > args.tol
                           else "host/suite drift")
            else:
                iso_prev, r, verdict = None, None, "no prior tree — inconclusive"
            rows.append((q, prev[q], cur[q], ratios[q], iso_cur, iso_prev,
                         r, verdict))
            print(f"# {q}: suite {prev[q]:.2f}->{cur[q]:.2f}s | isolated "
                  f"cur {iso_cur:.2f}s prev-tree "
                  f"{'-' if iso_prev is None else f'{iso_prev:.2f}s'}"
                  f" -> {verdict}", file=sys.stderr, flush=True)
    finally:
        if prev_tree:
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force",
                 prev_tree],
                capture_output=True,
            )

    print(f"### Close-time drift triage: worst-decile movers vs "
          f"{os.path.basename(args.prev)}"
          + (f" (A/B vs tree {args.prev_ref})" if args.prev_ref else "")
          + "\n")
    print(f"Worst {len(picked)} movers (current suite time >= {args.floor}s)"
          f" re-measured in fresh JVMs from BOTH trees on the same host"
          f" (`tools/drift_triage.py`, tol x{args.tol} on the isolated"
          f" code-vs-code ratio):\n")
    print("| query | prev suite s | cur suite s | suite ratio |"
          " iso cur s | iso prev-tree s | iso ratio | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for q, p, c, sr, ic, ip, ir, v in rows:
        print(f"| `{q}` | {p:.2f} | {c:.2f} | x{sr:.2f} | {ic:.2f} | "
              + ("-" if ip is None else f"{ip:.2f}")
              + " | " + ("-" if ir is None else f"x{ir:.2f}")
              + f" | {v} |")
    if under_floor:
        print(f"\nIn the worst decile by ratio but under the {args.floor}s "
              f"floor (scheduling scatter, not isolated): "
              + ", ".join(f"`{q}` (x{ratios[q]:.2f})"
                          for q in under_floor[:12])
              + (" …" if len(under_floor) > 12 else ""))
    shifts = [r[0] for r in rows if r[7].startswith("LEVEL")]
    print()
    print(json.dumps({
        "metric": "drift_triage", "prev": os.path.basename(args.prev),
        "prev_ref": args.prev_ref,
        "isolated_cur": {r[0]: r[4] for r in rows},
        "isolated_prev_tree": {r[0]: r[5] for r in rows if r[5] is not None},
        "level_shifts": shifts,
    }))


if __name__ == "__main__":
    main()
