"""Measured skew-join demo: what a hot key does to a shuffle join, and what
each mitigation buys.

Builds a synthetic skewed fact table (one key owning ~40% of all rows — the
shape of a power-law user/domain distribution) joined against a uniform
dimension, with broadcast disabled so the join MUST shuffle (at 100 TB the
dim side often can't broadcast).  Three configurations:

  plain / AQE off   : the straggler baseline — the hot key's partition does
                      ~40% of the work serially
  plain / AQE on    : Spark's runtime skew-join split
                      (spark.sql.adaptive.skewJoin) — the default mitigation
  salted / AQE off  : core.salted_join — the static fallback for engines or
                      layouts where AQE can't see the skew (e.g. the skew is
                      in a bucketed layout AQE won't re-shuffle)

Usage: python tools/skew_demo.py [n_rows] [--md]   (--md appends SKEW_DEMO
section output to stdout as markdown)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lachesis_spark.operators.core import salted_join
from lachesis_spark.session import get_spark

HOT_FRAC = 0.4
N_KEYS = 10_000
SHUFFLE_PARTS = 16


def build(spark, n_rows: int):
    hot = int(n_rows * HOT_FRAC)
    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") < hot, F.lit(0))
            .otherwise((F.col("id") % N_KEYS).cast("long"))
            .alias("k"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
        .repartition(SHUFFLE_PARTS)
        .cache()
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    ).cache()
    fact.count(), dim.count()
    return fact, dim


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(args[0]) if args else 20_000_000
    spark = get_spark("skew_demo", shuffle_partitions=SHUFFLE_PARTS)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact, dim = build(spark, n_rows)
    agg = lambda j: j.groupBy("w").agg(F.sum("v").alias("sv"))  # noqa: E731

    # advisor-driven salting: record the fact table's key profile in the
    # history DB (the load-time observation), then let the recommender pick
    # whether to salt and with how many salts — the demo runs off the
    # recommendation, not a hand-chosen constant
    from lachesis_spark.advisor.history import HistoryDB
    from lachesis_spark.advisor.recommender import key_stat_for, recommend_salting

    h = HistoryDB(":memory:")
    h.record_job("skew_demo_load", 1.0, [],
                 key_stats=[key_stat_for(fact, "demo.fact", ["k"])])
    rec = recommend_salting(h, "demo.fact", shuffle_partitions=SHUFFLE_PARTS)
    assert rec is not None, "advisor failed to flag the hot key"
    print(f"advisor: salt demo.fact on {rec.key_text} with n_salts="
          f"{rec.n_salts} (hot key owns {rec.top_share:.0%} of rows)")

    results = {}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    results["plain join, AQE off (straggler baseline)"] = timed(
        agg(fact.join(dim, "k"))
    )
    results[f"salted join (advisor n_salts={rec.n_salts}), AQE off"] = timed(
        agg(salted_join(fact, dim.withColumnRenamed("k", "dk"), "k", "dk",
                        n_salts=rec.n_salts))
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain join, AQE defaults"] = timed(agg(fact.join(dim, "k")))
    # tuned so AQE's stats actually classify the hot partition as skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    results["plain join, AQE skew split tuned"] = timed(agg(fact.join(dim, "k")))

    base = results["plain join, AQE off (straggler baseline)"]
    print(f"\nskew demo: {n_rows:,} fact rows, hot key = {HOT_FRAC:.0%}, "
          f"{SHUFFLE_PARTS} shuffle partitions, broadcast disabled\n")
    print("| configuration | seconds | vs baseline |")
    print("|---|---|---|")
    for name, t in results.items():
        print(f"| {name} | {t:.2f} | {base / t:.2f}x |")


if __name__ == "__main__":
    main()
