"""Base-table binding: the session-level seam that resolves table NAMES
to physical incarnations (lachesis_spark/binding.py) — the Spark analog
of the reference dispatcher binding a query's set scans to whatever
layout self-learning placement chose (reference
src/serverFunctionalities/source/DispatcherServer.cc).  Every query
module loads base tables through base_table(), so an UNMODIFIED registry
query can run against an advisor-placed catalog."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from lachesis_spark.binding import base_table, bound, catalog_resolver
from lachesis_spark.catalog import Catalog
from tests.conftest import SF_SMOKE


def test_base_table_default_is_plain_read(spark):
    df = base_table(spark, SF_SMOKE, "nation")
    want = spark.read.parquet(os.path.join(SF_SMOKE, "nation.parquet"))
    assert df.count() == want.count()
    assert df.schema == want.schema


def test_bound_resolver_reroutes_and_restores(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    nat = spark.read.parquet(os.path.join(SF_SMOKE, "nation.parquet"))
    cat.write_set(nat.limit(3), "db", "nation")

    def resolver(spark_, sf_dir_, name):
        return cat.read_set("db", name) if name == "nation" else None

    n_all = nat.count()
    with bound(resolver):
        assert base_table(spark, SF_SMOKE, "nation").count() == 3
        # uncovered tables fall through to the plain read
        assert base_table(spark, SF_SMOKE, "region").count() == 5
        with bound(lambda s, d, n: None):  # nested: inner covers nothing
            assert base_table(spark, SF_SMOKE, "nation").count() == n_all
        assert base_table(spark, SF_SMOKE, "nation").count() == 3  # restored
    assert base_table(spark, SF_SMOKE, "nation").count() == n_all


def test_unmodified_registry_query_runs_against_placed_catalog(spark, tmp_path):
    """The payoff: tpch_q12 — untouched registry code — rebound to a
    catalog whose lineitem/orders were bucketed on the join key plans the
    join with ZERO shuffle Exchanges and returns rows identical to the
    flat run.  This is what the whole-workload advisor bench does to all
    192 queries."""
    from lachesis_spark.plans import tpch

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        df = spark.read.parquet(os.path.join(SF_SMOKE, f"{t}.parquet"))
        cat.write_set(df, "db", t, bucket_by=(4, [key]))

    flat = sorted(tuple(r) for r in tpch.q12(spark, SF_SMOKE).collect())

    resolver = catalog_resolver(cat, "db", {"lineitem": "lineitem",
                                            "orders": "orders"})
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with bound(resolver):
            df = tpch.q12(spark, SF_SMOKE)
            placed = sorted(tuple(r) for r in df.collect())
            plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert placed == flat
    # the join itself is exchange-free; the aggregate's exchange (a
    # different key) legitimately remains
    import re

    join_keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert not any(k.startswith(("l_orderkey", "o_orderkey"))
                   for k in join_keys), plan


def test_events_reader_honors_binding(spark, tmp_path):
    """read_events routes through the binding too (ts normalization applies
    to whatever incarnation serves the table)."""
    from lachesis_spark.sources.readers import read_events

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    ev = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    cat.write_set(ev.limit(7), "db", "events")

    with bound(catalog_resolver(cat, "db", {"events": "events"})):
        got = read_events(spark, SF_SMOKE)
        assert got.count() == 7
        assert dict(got.dtypes)["ts"] in ("timestamp_ntz", "timestamp")
    assert read_events(spark, SF_SMOKE).count() == ev.count()
