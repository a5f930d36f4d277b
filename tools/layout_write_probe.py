"""Layout WRITE-cost probe (round-9 verdict task 7).

Round 8 measured the round-8 layout features only at QUERY time; this
probes what they cost to WRITE at ×1/×10/×100 of sf0.1 orders, plus the
append path (daily merge into a partitioned corpus) where the sidecar
upkeep strategy decides whether appends stay O(touched partitions):

  plain      — baseline parquet write (what any layout competes against)
  zorder     — Z-curve rewrite on (o_custkey, o_totalprice): one min/max
               pass + one range shuffle + sorted write
  zonemap    — the sidecar pass alone (column-pruned scan grouped by
               input_file_name; n_files rows to the driver)
  bucket     — bucketBy(16, o_orderkey) saveAsTable write
  merge_incr — 1%-of-one-partition merge into a month-partitioned,
               zone-mapped set with INCREMENTAL sidecar upkeep
               (catalog._update_zonemap_partitions — O(touched))
  merge_full — same merge but sidecar rebuilt with the full-corpus scan
               (the pre-round-9 behavior, kept for comparison)

Scaled inputs are materialized to parquet FIRST so every probe reads a
real source instead of recomputing the scale-up union.  Prints one JSON
line per (op, scale) plus per-op ×100 exponents.

Usage: python tools/layout_write_probe.py [sf_dir] [--scales 1,10,100]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from lachesis_spark.catalog import Catalog
from lachesis_spark.session import get_spark

N_BUCKETS = 16


def scaled_source(spark, sf_dir: str, k: int, out: str) -> str:
    """Materialize k offset copies of orders (keys shifted per copy so key
    cardinality scales with the data, as a real corpus would)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    mx = orders.agg(F.max("o_orderkey")).first()[0] + 1
    parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * mx))
        .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * 100_000))
        for i in range(k)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df = df.withColumn("o_month", F.date_trunc("month", "o_orderdate").cast("date"))
    df.repartition(max(8, 2 * k)).write.mode("overwrite").parquet(out)
    return out


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    scales = [1, 10, 100]
    if "--scales" in sys.argv:
        scales = [int(x) for x in sys.argv[sys.argv.index("--scales") + 1].split(",")]

    spark = get_spark("layout_write_probe")
    root = tempfile.mkdtemp(prefix="layout_write_probe_")
    cat = Catalog(spark, os.path.join(root, "cat"))
    cat.create_database("db")
    results: dict[str, dict[int, float]] = {}

    def rec(op: str, k: int, sec: float, extra: str = "") -> None:
        results.setdefault(op, {})[k] = sec
        print(json.dumps({"op": op, "scale": k, "sec": round(sec, 2),
                          "note": extra}), flush=True)

    for k in scales:
        src = scaled_source(spark, sf_dir, k, os.path.join(root, f"src_x{k}"))
        df = spark.read.parquet(src)
        n = df.count()

        rec("plain", k, timed(lambda: cat.write_set(df, "db", f"plain_x{k}")),
            f"{n} rows")
        rec("zorder", k, timed(lambda: cat.write_set(
            df, "db", f"z_x{k}",
            zorder_by=["o_custkey", "o_totalprice"],
        )), "zorder(o_custkey,o_totalprice)")
        # sidecar pass alone, over the just-written z-ordered set
        rec("zonemap", k, timed(lambda: cat._write_zonemap(
            "db", f"z_x{k}", ["o_custkey", "o_totalprice"]
        )), "sidecar pass only")
        rec("bucket", k, timed(lambda: cat.write_set(
            df, "db", f"b_x{k}", bucket_by=(N_BUCKETS, ["o_orderkey"])
        )), f"bucketBy({N_BUCKETS}, o_orderkey)")
        # round-10 hybrid: range-partitioned bucketed write + sidecar —
        # one extra range shuffle vs plain bucketing, same I/O volume
        from lachesis_spark.advisor.apply import N_GRID_RANGES

        rec("bucket_range_grid", k, timed(lambda: cat.write_set(
            df.repartitionByRange(N_GRID_RANGES, "o_orderdate"),
            "db", f"g_x{k}",
            bucket_by=(N_BUCKETS, ["o_orderkey"]),
            zonemap_by=["o_orderdate"],
            bucket_pre_partitioned=True,
        )), f"grid {N_GRID_RANGES}×{N_BUCKETS} (o_orderkey × o_orderdate)")

        # append path: month-partitioned zone-mapped corpus; the daily
        # merge touches ONE partition with a 1%-of-partition update
        cat.write_set(
            df, "db", f"part_x{k}",
            partition_by=["o_month"], zonemap_by=["o_custkey"],
        )
        one_month = df.agg(
            F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("m")
        ).first()["m"]
        upd = (
            df.filter(F.date_trunc("month", "o_orderdate").cast("date") == one_month)
            .filter(F.col("o_orderkey") % 100 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        ).localCheckpoint(eager=True)
        n_upd = upd.count()
        rec("merge_incr", k, timed(lambda: cat.merge_set(
            upd, "db", f"part_x{k}", ["o_orderkey"], partition_col="o_month"
        )), f"{n_upd} update rows into 1 of ~84 months (incremental sidecar)")
        # the pre-round-9 sidecar strategy for comparison: full-corpus scan
        rec("merge_full_sidecar", k, timed(lambda: cat._write_zonemap(
            "db", f"part_x{k}", ["o_custkey"]
        )), "full-corpus sidecar rebuild alone")

        # free disk between scales (keep nothing but the numbers)
        for d in os.listdir(os.path.join(root, "cat", "db")):
            shutil.rmtree(os.path.join(root, "cat", "db", d), ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")

    if len(scales) >= 2:
        k0, k1 = scales[0], scales[-1]
        exps = {
            op: round(
                math.log(ts[k1] / ts[k0]) / math.log(k1 / k0), 2
            )
            for op, ts in results.items()
            if k0 in ts and k1 in ts and ts[k0] > 0
        }
        print(json.dumps({"exponents": exps, "span": f"x{k0}->x{k1}"}), flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
