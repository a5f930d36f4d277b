"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lachesis_spark.registry import QUERIES
from lachesis_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("lachesis_bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup (the driver measures steady-state throughput)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0
        # drop caches left by iterative queries (kmeans/pagerank/dedup):
        # accumulated cached RDDs otherwise build heap pressure and a full
        # GC lands on one arbitrary later query's wall-clock
        spark.catalog.clearCache()
    ok = [v for v in timings.values() if v >= 0]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(ok), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
