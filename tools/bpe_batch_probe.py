"""Measure BPE training at REALISTIC depth: 512 merges via the batched
trainer (llm.training.bpe_train_batch) vs the projected cost of doing the
same sequentially.

The scale claim under test: real tokenizers run 10³–10⁴ merges, where
per-MERGE driver latency dominates (one TakeOrdered collect + one
vocabulary pass each).  Batch selection of the top-m non-interacting pairs
pays that latency once per BATCH — per-merge cost drops ~m×, and per-round
cost stays flat in the round number (checkpoint-truncated lineage, same
argument as the sequential probe).  Usage:

    python tools/bpe_batch_probe.py [sf_dir] [n_merges] [batch_m]

Prints a per-round cost table + summary; paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lachesis_spark.llm import training as TR
from lachesis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    batch_m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("bpe_batch_probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()  # warm the scan so round 1 measures the round, not startup

    # sequential reference point: per-merge cost over a short prefix
    seq_times: list[float] = []
    TR.bpe_train_n(docs, 8, on_round=lambda r, s: seq_times.append(s))
    seq_per_merge = sum(seq_times) / len(seq_times)

    times: list[tuple[int, float, int]] = []
    merges, _ = TR.bpe_train_batch(
        docs, n_merges, batch_m=batch_m,
        on_round=lambda r, s, k: times.append((r, s, k)),
    )
    total = sum(s for _, s, _ in times)
    print(f"# bpe_train_batch @ {sf_dir}: {len(merges)} merges, "
          f"batch_m={batch_m}, checkpoint every {TR.CHECKPOINT_EVERY} rounds")
    print("| round | merges in batch | cumulative merges | sec |")
    print("|---|---|---|---|")
    cum = 0
    for r, s, k in times:
        cum += k
        if r <= 4 or r % 4 == 0 or r == len(times):
            print(f"| {r} | {k} | {cum} | {s:.2f} |")
    half = len(times) // 2
    first = sum(s for _, s, _ in times[:half]) / max(1, half)
    second = sum(s for _, s, _ in times[half:]) / max(1, len(times) - half)
    print(f"first-half mean {first:.2f}s/round  second-half mean "
          f"{second:.2f}s/round  ratio {second / first:.2f}")
    print(f"total {total:.1f}s for {len(merges)} merges = "
          f"{total / max(1, len(merges)) * 1000:.0f} ms/merge; sequential "
          f"measured {seq_per_merge * 1000:.0f} ms/merge over an 8-merge "
          f"prefix -> projected {seq_per_merge * len(merges):.0f}s for "
          f"{len(merges)} merges ({seq_per_merge * len(merges) / max(total, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
