"""Zone-map file skipping (catalog.write_set(zonemap_by=...) +
catalog.read_set_pruned): files are actually skipped, correctness never
depends on the sidecar, and rewrites invalidate it."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from lachesis_spark.catalog import ZONEMAP_FILE, Catalog
from tests.conftest import SF_SMOKE


def _write_clustered_orders(spark, root, n_files=8):
    cat = Catalog(spark, str(root))
    cat.create_database("zm")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cat.write_set(
        orders.repartitionByRange(n_files, "o_orderkey"),
        "zm",
        "orders",
        zonemap_by=["o_orderkey"],
    )
    return cat, orders


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    cat, orders = _write_clustered_orders(spark, tmp_path)
    total_files = len(
        [f for f in os.listdir(cat.set_path("zm", "orders")) if f.startswith("part-")]
    )
    assert total_files == 8
    lo, hi = 100, 800
    pruned = cat.read_set_pruned("zm", "orders", "o_orderkey", lo, hi)
    # planning-time skip: the pruned frame's file list is a strict subset
    assert 0 < len(pruned.inputFiles()) < total_files
    expect = sorted(
        r["o_orderkey"]
        for r in orders.filter(F.col("o_orderkey").between(lo, hi)).collect()
    )
    got = sorted(r["o_orderkey"] for r in pruned.collect())
    assert got == expect


def test_open_bounds_and_no_match(spark, tmp_path):
    cat, orders = _write_clustered_orders(spark, tmp_path)
    n = orders.count()
    assert cat.read_set_pruned("zm", "orders", "o_orderkey").count() == n
    # range beyond the data: zero files read, empty result, schema intact
    mx = orders.agg(F.max("o_orderkey")).first()[0]
    empty = cat.read_set_pruned("zm", "orders", "o_orderkey", mx + 10, mx + 20)
    assert empty.count() == 0
    assert empty.schema == orders.schema


def test_missing_sidecar_degrades_to_filtered_scan(spark, tmp_path):
    cat, orders = _write_clustered_orders(spark, tmp_path)
    os.remove(os.path.join(cat.set_path("zm", "orders"), ZONEMAP_FILE))
    pruned = cat.read_set_pruned("zm", "orders", "o_orderkey", 100, 800)
    expect = orders.filter(F.col("o_orderkey").between(100, 800)).count()
    assert pruned.count() == expect


def test_unknown_files_are_kept_fail_safe(spark, tmp_path):
    """Files absent from the sidecar (e.g. added by a writer that bypassed
    write_set) are always read."""
    cat, orders = _write_clustered_orders(spark, tmp_path)
    path = cat.set_path("zm", "orders")
    with open(os.path.join(path, ZONEMAP_FILE)) as fh:
        zm = json.load(fh)
    # drop half the entries: those files lose their stats -> always kept
    dropped = dict(list(zm["files"].items())[:4])
    zm["files"] = {k: v for k, v in zm["files"].items() if k not in dropped}
    with open(os.path.join(path, ZONEMAP_FILE), "w") as fh:
        json.dump(zm, fh)
    pruned = cat.read_set_pruned("zm", "orders", "o_orderkey", 100, 800)
    expect = orders.filter(F.col("o_orderkey").between(100, 800)).count()
    assert pruned.count() == expect
    # and every statless file is in the read list
    read = {os.path.basename(p) for p in pruned.inputFiles()}
    assert set(dropped) <= read


def test_rewrite_paths_invalidate_sidecar(spark, tmp_path):
    cat, orders = _write_clustered_orders(spark, tmp_path)
    path = cat.set_path("zm", "orders")
    assert os.path.isfile(os.path.join(path, ZONEMAP_FILE))
    # plain overwrite without zonemap_by must remove the stale sidecar
    cat.write_set(orders, "zm", "orders")
    assert not os.path.isfile(os.path.join(path, ZONEMAP_FILE))
    # and the pruned read still answers correctly without it
    pruned = cat.read_set_pruned("zm", "orders", "o_orderkey", 100, 800)
    expect = orders.filter(F.col("o_orderkey").between(100, 800)).count()
    assert pruned.count() == expect


def test_zonemap_with_zorder_layout(spark, tmp_path):
    """zonemap_by composes with zorder_by (the intended pairing)."""
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("zm")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    cat.write_set(
        li, "zm", "li", zorder_by=["l_orderkey", "l_partkey"],
        zonemap_by=["l_orderkey"],
    )
    pruned = cat.read_set_pruned("zm", "li", "l_orderkey", 1, 500)
    expect = li.filter(F.col("l_orderkey").between(1, 500)).count()
    assert pruned.count() == expect


def test_merge_refreshes_zonemap(spark, tmp_path):
    """A zone-mapped set keeps (fresh) stats through merge_set: new files
    get entries, pruning stays correct and effective."""
    cat, orders = _write_clustered_orders(spark, tmp_path)
    lo_key = orders.agg(F.min("o_orderkey")).first()[0]
    updates = orders.filter(F.col("o_orderkey") < lo_key + 50).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    cat.merge_set(updates, "zm", "orders", ["o_orderkey"])
    path = cat.set_path("zm", "orders")
    assert os.path.isfile(os.path.join(path, ZONEMAP_FILE))
    with open(os.path.join(path, ZONEMAP_FILE)) as fh:
        zm = json.load(fh)
    # every CURRENT data file carries stats (refresh, not stale carryover)
    data = {f for f in os.listdir(path) if f.startswith("part-")}
    assert set(zm["files"]) == data
    pruned = cat.read_set_pruned("zm", "orders", "o_orderkey", 100, 800)
    merged_full = cat.read_set("zm", "orders")
    expect = merged_full.filter(F.col("o_orderkey").between(100, 800)).count()
    assert pruned.count() == expect


def test_compact_refreshes_zonemap(spark, tmp_path):
    cat, orders = _write_clustered_orders(spark, tmp_path)
    cat.compact_set("zm", "orders")
    path = cat.set_path("zm", "orders")
    assert os.path.isfile(os.path.join(path, ZONEMAP_FILE))
    with open(os.path.join(path, ZONEMAP_FILE)) as fh:
        zm = json.load(fh)
    data = {f for f in os.listdir(path) if f.startswith("part-")}
    assert set(zm["files"]) == data
    pruned = cat.read_set_pruned("zm", "orders", "o_orderkey", 100, 800)
    expect = orders.filter(F.col("o_orderkey").between(100, 800)).count()
    assert pruned.count() == expect


def test_cdc_refreshes_zonemap(spark, tmp_path):
    cat, orders = _write_clustered_orders(spark, tmp_path)
    base = orders.select("o_orderkey", "o_totalprice").withColumn(
        "__v", F.lit(0)
    )
    cat.write_set(
        base.repartitionByRange(4, "o_orderkey"), "zm", "orders2",
        zonemap_by=["o_orderkey"],
    )
    changes = (
        base.limit(10)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit(1).alias("__v"),
            F.lit("upsert").alias("op"),
        )
    )
    cat.apply_cdc(changes, "zm", "orders2", ["o_orderkey"], "__v")
    path = cat.set_path("zm", "orders2")
    assert os.path.isfile(os.path.join(path, ZONEMAP_FILE))
    with open(os.path.join(path, ZONEMAP_FILE)) as fh:
        zm = json.load(fh)
    data = {f for f in os.listdir(path) if f.startswith("part-")}
    assert set(zm["files"]) == data
    pruned = cat.read_set_pruned("zm", "orders2", "o_orderkey", 100, 800)
    expect = (
        cat.read_set("zm", "orders2")
        .filter(F.col("o_orderkey").between(100, 800))
        .count()
    )
    assert pruned.count() == expect
