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


def _sidecar(cat, db, name):
    with open(os.path.join(cat.set_path(db, name), ZONEMAP_FILE)) as fh:
        return json.load(fh)


def test_partitioned_merge_updates_zonemap_incrementally(spark, tmp_path):
    """Round-9: a partition-scoped merge maintains the sidecar by
    re-scanning ONLY the touched partitions (O(touched), not O(corpus)) —
    untouched partitions keep their stat entries verbatim, deleted files'
    entries vanish, and the result is byte-identical to a full rebuild."""
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("zm")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    base = orders.withColumn("pb", (F.col("o_orderkey") % 4).cast("int"))
    cat.write_set(
        base.repartitionByRange(8, "o_orderkey"),
        "zm", "ordp",
        partition_by=["pb"],
        zonemap_by=["o_orderkey"],
    )
    before = _sidecar(cat, "zm", "ordp")
    path = cat.set_path("zm", "ordp")
    untouched_files = {
        f"pb={pb}/{f}"
        for pb in (0, 2, 3)
        for f in os.listdir(os.path.join(path, f"pb={pb}"))
        if f.startswith("part-")
    }

    updates = base.filter(F.col("pb") == 1).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    cat.merge_set(updates, "zm", "ordp", ["o_orderkey"], partition_col="pb")

    after = _sidecar(cat, "zm", "ordp")
    live = {
        os.path.relpath(os.path.join(root, f), path)
        for root, _d, files in os.walk(path)
        for f in files
        if f.startswith("part-") and not f.endswith(".crc")
    }
    # every current file carries stats; no stale entries survive
    assert set(after["files"]) == live
    # untouched partitions' entries carried over VERBATIM
    for f in untouched_files & live:
        assert after["files"][f] == before["files"][f]
    # incremental result == full rebuild
    cat._write_zonemap("zm", "ordp", ["o_orderkey"])
    assert _sidecar(cat, "zm", "ordp") == after


def test_pruned_read_works_on_partitioned_set(spark, tmp_path):
    """read_set_pruned_multi lists partitioned sets recursively and keeps
    the partition column (basePath), so partition-scoped merged corpora
    prune like flat ones."""
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("zm")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    base = orders.withColumn("pb", (F.col("o_orderkey") % 4).cast("int"))
    cat.write_set(
        base.repartitionByRange(8, "o_orderkey"),
        "zm", "ordp2",
        partition_by=["pb"],
        zonemap_by=["o_orderkey"],
    )
    path = cat.set_path("zm", "ordp2")
    total = sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.startswith("part-") and not f.endswith(".crc")
    )
    pruned = cat.read_set_pruned_multi("zm", "ordp2", {"o_orderkey": (100, 800)})
    assert "pb" in pruned.columns  # partition column survives basePath read
    assert 0 < len(pruned.inputFiles()) < total
    expect = (
        cat.read_set("zm", "ordp2")
        .filter(F.col("o_orderkey").between(100, 800))
        .count()
    )
    assert pruned.count() == expect and expect > 0


def test_zorder_on_timestamp_column(spark, tmp_path):
    """Round-9: the advisor's real-workload run recommended Z-ordering
    lineitem on its filter columns — one of which is a timestamp — and the
    zorder writer only handled numerics.  Timestamps/dates now normalize
    via an epoch cast; the layout must preserve rows exactly and make the
    time dimension prunable."""
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("zm")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    cat.write_set(
        li, "zm", "li_z",
        zorder_by=["l_shipdate", "l_quantity"],
        zonemap_by=["l_shipdate", "l_quantity"],
    )
    total = len(cat.read_set("zm", "li_z").inputFiles())
    assert cat.read_set("zm", "li_z").count() == li.count()
    pruned = cat.read_set_pruned_multi(
        "zm", "li_z", {"l_shipdate": ("1996-01-01", "1996-04-01")}
    )
    assert 0 < len(pruned.inputFiles()) < total
    expect = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") <= "1996-04-01")
    ).count()
    assert pruned.count() == expect and expect > 0


def test_zorder_on_string_columns(spark, tmp_path):
    """The advisor recommends Z-ordering whatever the workload filters on —
    including STRING columns (part.p_type crashed the round-11 whole-
    workload run with CAST_INVALID_INPUT: 'LARGE...' -> double).  The
    numeric surrogate (big-endian first-7-bytes, fixed hex width) must be
    order-preserving so the clustering prunes, and the rewrite must be
    row-preserving."""
    from lachesis_spark.sources.layout import _as_numeric, zorder

    part = spark.read.parquet(os.path.join(SF_SMOKE, "part.parquet"))
    z = zorder(part, ["p_type", "p_size"], n_files=4)
    assert z.count() == part.count()
    assert sorted(z.columns) == sorted(part.columns)

    # surrogate preserves lexicographic order, incl. the prefix edge case
    # ("b" > "ab" must survive the mapping) and NULLs at the low end
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("ab",), ("b",), ("LARGE BRUSHED",), ("ECONOMY",), (None,), ("",)],
        "s string",
    )
    rows = (
        df.select("s", _as_numeric(df, "s").alias("n"))
        .orderBy(F.col("s").asc_nulls_first())
        .collect()
    )
    nums = [r["n"] for r in rows]
    assert nums == sorted(nums), rows
    # end-to-end: the advisor apply path that crashed now succeeds
    from lachesis_spark.advisor.apply import rewrite_layout
    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    cat.write_set(part, "db", "part")
    rewrite_layout(cat, "db", "part", "zorder", ("p_brand", "p_type"))
    assert cat.read_set("db", "part").count() == part.count()
