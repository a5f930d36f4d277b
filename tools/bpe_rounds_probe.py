"""Measure per-round cost of n-round BPE training (llm.training.bpe_train_n).

The scale claim under test: per-round cost is FLAT in the round number —
`localCheckpoint` every CHECKPOINT_EVERY rounds truncates the fold-expression
lineage, so round 30 costs the same as round 3 (without it, round N replays
all N-1 prior merge folds).  Usage:

    python tools/bpe_rounds_probe.py [sf_dir] [n_rounds]

Prints a per-round timing table plus first-half/second-half means; paste
into SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lachesis_spark.llm import training as TR
from lachesis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bpe_rounds_probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()  # warm the scan so round 1 measures the round, not startup

    times: list[tuple[int, float]] = []
    merges, _ = TR.bpe_train_n(
        docs, n_rounds, on_round=lambda r, s: times.append((r, s))
    )
    print(f"# bpe_train_n @ {sf_dir}, {n_rounds} rounds "
          f"(checkpoint every {TR.CHECKPOINT_EVERY})")
    print("| round | merge | cnt | sec |")
    print("|---|---|---|---|")
    for (r, s), m in zip(times, merges):
        print(f"| {r} | `{m[1]}` -> `{m[2]}` | {m[3]} | {s:.2f} |")
    half = len(times) // 2
    first = sum(s for _, s in times[:half]) / max(1, half)
    second = sum(s for _, s in times[half:]) / max(1, len(times) - half)
    print(f"first-half mean {first:.2f}s  second-half mean {second:.2f}s  "
          f"ratio {second / first:.2f}")


if __name__ == "__main__":
    main()
