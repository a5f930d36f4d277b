"""Per-query Spark JOB COUNT (DAGScheduler.nextJobId delta) + wall time.

Host-noise-immune structural metric used throughout OPTIMIZATION_r11.md:
run-to-run wall scatter on this sandbox is 2-3x, but the number of jobs a
query launches is a property of the code, so before/after job counts are
the evidence wall-clock cannot fake.  Usage:

    python tools/job_count_probe.py [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lachesis_spark.registry import QUERIES
from lachesis_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)]
    spark = get_spark("job_count_probe")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def jobs() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    for name in names:
        sc.setJobDescription(f"probe:{name}")
        j0 = jobs()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        sec = time.perf_counter() - t0
        print(f"{name}: jobs={jobs() - j0} wall={sec:.2f}s", flush=True)
        spark.catalog.clearCache()
        for jrdd in sc._jsc.getPersistentRDDs().values():
            jrdd.unpersist()


if __name__ == "__main__":
    main()
