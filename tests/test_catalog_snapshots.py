"""Set snapshots / time travel (Catalog.snapshot_set / read_set(version=))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lachesis_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "warehouse"))
    c.create_database("db")
    return c


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["k", "v"])


def test_snapshot_survives_overwrite(cat, spark):
    cat.write_set(_df(spark, ["a", "b"]), "db", "s")
    v1 = cat.snapshot_set("db", "s")
    cat.write_set(_df(spark, ["x", "y", "z"]), "db", "s")
    assert sorted(r["v"] for r in cat.read_set("db", "s").collect()) == ["x", "y", "z"]
    assert sorted(r["v"] for r in cat.read_set("db", "s", version=v1).collect()) == ["a", "b"]


def test_snapshot_survives_merge_and_compact(cat, spark):
    cat.write_set(_df(spark, ["a", "b"]), "db", "s")
    v1 = cat.snapshot_set("db", "s")
    cat.merge_set(_df(spark, ["A"]), "db", "s", key_cols=["k"])
    cat.compact_set("db", "s")
    live = {(r["k"], r["v"]) for r in cat.read_set("db", "s").collect()}
    assert live == {(0, "A"), (1, "b")}
    old = {(r["k"], r["v"]) for r in cat.read_set("db", "s", version=v1).collect()}
    assert old == {(0, "a"), (1, "b")}


def test_versions_are_monotone_and_listed(cat, spark):
    cat.write_set(_df(spark, ["a"]), "db", "s")
    v1 = cat.snapshot_set("db", "s")
    cat.write_set(_df(spark, ["b"]), "db", "s")
    v2 = cat.snapshot_set("db", "s")
    assert (v1, v2) == (1, 2)
    assert cat.list_snapshots("db", "s") == [1, 2]


def test_restore_rolls_back_and_is_undoable(cat, spark):
    cat.write_set(_df(spark, ["a"]), "db", "s")
    v1 = cat.snapshot_set("db", "s")
    cat.write_set(_df(spark, ["b"]), "db", "s")
    v2 = cat.snapshot_set("db", "s")
    cat.restore_set("db", "s", v1)
    assert [r["v"] for r in cat.read_set("db", "s").collect()] == ["a"]
    cat.restore_set("db", "s", v2)
    assert [r["v"] for r in cat.read_set("db", "s").collect()] == ["b"]


def test_snapshots_invisible_to_live_reads(cat, spark):
    cat.write_set(_df(spark, ["a", "b", "c"]), "db", "s")
    cat.snapshot_set("db", "s")
    cat.snapshot_set("db", "s")
    assert cat.read_set("db", "s").count() == 3  # no double-count from snapshots


def test_missing_version_raises(cat, spark):
    cat.write_set(_df(spark, ["a"]), "db", "s")
    with pytest.raises(ValueError, match="no snapshot"):
        cat.read_set("db", "s", version=9)
    with pytest.raises(ValueError, match="no snapshot"):
        cat.restore_set("db", "s", 9)


def test_remove_set_cleans_snapshots(cat, spark):
    cat.write_set(_df(spark, ["a"]), "db", "s")
    cat.snapshot_set("db", "s")
    cat.remove_set("db", "s")
    assert cat.list_snapshots("db", "s") == []


def test_bucketed_set_snapshot_roundtrip(cat, spark):
    df = _df(spark, list("abcdef"))
    cat.write_set(df, "db", "s", bucket_by=(4, ["k"]))
    v1 = cat.snapshot_set("db", "s")
    cat.write_set(_df(spark, ["z"]), "db", "s")
    snap = cat.read_set("db", "s", version=v1)
    assert snap.count() == 6
    assert snap.agg(F.sum("k")).collect()[0][0] == sum(range(6))
