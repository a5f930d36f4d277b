"""CDC apply semantics (Catalog.apply_cdc): latest-wins, tombstones,
late-arrival idempotence, partition-scoped apply incl. fully-deleted
partition cleanup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lachesis_spark.catalog import Catalog


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, 0, "p1"), (2, "b", 20.0, 0, "p1"),
         (3, "c", 30.0, 0, "p2"), (4, "d", 40.0, 0, "p2")],
        "k int, payload string, amount double, version int, part string",
    )


def _state(cat, db="d", name="s"):
    return {
        r["k"]: (r["payload"], r["amount"], r["version"])
        for r in cat.read_set(db, name).collect()
    }


def test_upsert_delete_insert_and_late_change(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("d")
    cat.write_set(_base(spark), "d", "s")
    changes = spark.createDataFrame(
        [
            (1, "a2", 11.0, 2, "p1", "upsert"),   # newer version: applies
            (2, None, 0.0, 1, "p1", "delete"),    # tombstone: key gone
            (3, "late", 99.0, 0, "p2", "upsert"), # version NOT > stored: ignored
            (9, "new", 90.0, 1, "p2", "upsert"),  # new key: inserted
        ],
        "k int, payload string, amount double, version int, part string, op string",
    )
    cat.apply_cdc(changes, "d", "s", ["k"], "version")
    assert _state(cat) == {
        1: ("a2", 11.0, 2),
        3: ("c", 30.0, 0),
        4: ("d", 40.0, 0),
        9: ("new", 90.0, 1),
    }
    # replaying the SAME batch is a no-op (at-least-once safety)
    cat.apply_cdc(changes, "d", "s", ["k"], "version")
    assert _state(cat) == {
        1: ("a2", 11.0, 2),
        3: ("c", 30.0, 0),
        4: ("d", 40.0, 0),
        9: ("new", 90.0, 1),
    }


def test_within_batch_latest_wins_and_tie_prefers_upsert(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("d")
    cat.write_set(_base(spark), "d", "s")
    changes = spark.createDataFrame(
        [
            (1, "v1", 1.0, 1, "p1", "upsert"),
            (1, "v3", 3.0, 3, "p1", "upsert"),   # max version in batch wins
            (1, "v2", 2.0, 2, "p1", "delete"),
            (2, None, 0.0, 5, "p1", "delete"),   # version tie with upsert below
            (2, "keep", 25.0, 5, "p1", "upsert"),  # 'upsert' > 'delete': wins tie
        ],
        "k int, payload string, amount double, version int, part string, op string",
    )
    cat.apply_cdc(changes, "d", "s", ["k"], "version")
    st = _state(cat)
    assert st[1] == ("v3", 3.0, 3)
    assert st[2] == ("keep", 25.0, 5)


def test_bootstrap_from_empty_set(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("d")
    changes = spark.createDataFrame(
        [(1, "a", 1.0, 1, "p1", "upsert"), (2, "b", 2.0, 1, "p1", "delete")],
        "k int, payload string, amount double, version int, part string, op string",
    )
    cat.apply_cdc(changes, "d", "s", ["k"], "version")
    assert _state(cat) == {1: ("a", 1.0, 1)}


def test_partition_scoped_apply_and_emptied_partition_cleanup(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("d")
    cat.write_set(_base(spark), "d", "s", partition_by=["part"])
    path = cat.set_path("d", "s")
    # delete EVERY row of p2; update one row of p1
    changes = spark.createDataFrame(
        [
            (3, None, 0.0, 1, "p2", "delete"),
            (4, None, 0.0, 1, "p2", "delete"),
            (1, "a2", 11.0, 1, "p1", "upsert"),
        ],
        "k int, payload string, amount double, version int, part string, op string",
    )
    cat.apply_cdc(changes, "d", "s", ["k"], "version", partition_col="part")
    assert _state(cat) == {1: ("a2", 11.0, 1), 2: ("b", 20.0, 0)}
    # the fully-deleted partition directory is gone (dynamic overwrite
    # alone would have left its stale files)
    assert not os.path.isdir(os.path.join(path, "part=p2"))


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("d")
    cat.write_set(_base(spark), "d", "s", partition_by=["part"])
    path = cat.set_path("d", "s")
    before = {
        f: os.path.getmtime(os.path.join(path, "part=p2", f))
        for f in os.listdir(os.path.join(path, "part=p2"))
        if f.startswith("part-")
    }
    changes = spark.createDataFrame(
        [(1, "a2", 11.0, 1, "p1", "upsert")],
        "k int, payload string, amount double, version int, part string, op string",
    )
    cat.apply_cdc(changes, "d", "s", ["k"], "version", partition_col="part")
    after = {
        f: os.path.getmtime(os.path.join(path, "part=p2", f))
        for f in os.listdir(os.path.join(path, "part=p2"))
        if f.startswith("part-")
    }
    assert before == after  # p2's files untouched byte-for-byte
    assert _state(cat)[1] == ("a2", 11.0, 1)
