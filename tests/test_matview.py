"""Materialized aggregate views (plans/matview.py): incremental refresh
folds only new files, full fallback on rewrite, derived averages."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lachesis_spark.catalog import Catalog
from lachesis_spark.plans import matview as MV
from tests.conftest import SF_SMOKE


def _setup(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("mv")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    rest = orders.filter(F.col("o_orderkey") % 2 == 1)
    cat.write_set(base.repartition(3), "mv", "src")
    MV.create_agg_view(
        cat, "mv", "v", "mv", "src", ["o_orderstatus"], ["o_totalprice"]
    )
    return cat, orders, rest


def _full_expect(df):
    return {
        r["o_orderstatus"]: (
            r["c"], round(r["s"], 2), round(r["mn"], 2), round(r["mx"], 2)
        )
        for r in df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("o_totalprice").alias("s"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }


def _view_state(cat):
    return {
        r["o_orderstatus"]: (
            r["mv_count"],
            round(r["sum_o_totalprice"], 2),
            round(r["min_o_totalprice"], 2),
            round(r["max_o_totalprice"], 2),
        )
        for r in cat.read_set("mv", "v").collect()
    }


def test_incremental_refresh_equals_full_aggregate(spark, tmp_path):
    cat, orders, rest = _setup(spark, tmp_path)
    # append-only growth, then refresh: mode must be incremental
    rest.repartition(2).write.mode("append").parquet(cat.set_path("mv", "src"))
    assert MV.refresh_view(cat, "mv", "v") == "incremental"
    assert _view_state(cat) == _full_expect(orders)
    # nothing new: noop
    assert MV.refresh_view(cat, "mv", "v") == "noop"
    assert _view_state(cat) == _full_expect(orders)


def test_rewrite_triggers_full_recompute(spark, tmp_path):
    cat, orders, rest = _setup(spark, tmp_path)
    # REWRITE the source (compact): consumed files vanish -> full fallback
    cat.compact_set("mv", "src")
    assert MV.refresh_view(cat, "mv", "v") == "full"
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    assert _view_state(cat) == _full_expect(base)


def test_read_view_derives_average(spark, tmp_path):
    cat, orders, rest = _setup(spark, tmp_path)
    out = {
        r["o_orderstatus"]: round(r["avg_o_totalprice"], 4)
        for r in MV.read_view(cat, "mv", "v", avg_of=["o_totalprice"]).collect()
    }
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    expect = {
        r["o_orderstatus"]: round(r["a"], 4)
        for r in base.groupBy("o_orderstatus")
        .agg((F.sum("o_totalprice") / F.count(F.lit(1))).alias("a"))
        .collect()
    }
    assert out == expect


def test_delta_scan_touches_only_new_files(spark, tmp_path, monkeypatch):
    """The incremental path must scan ONLY the appended files."""
    cat, orders, rest = _setup(spark, tmp_path)
    before = set(MV._source_files(cat, "mv", "src"))
    rest.repartition(2).write.mode("append").parquet(cat.set_path("mv", "src"))
    new = set(MV._source_files(cat, "mv", "src")) - before

    from pyspark.sql.readwriter import DataFrameReader

    seen: dict = {"calls": []}
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        seen["calls"].append(paths)
        return orig(self, *paths, **kw)

    # spark.read returns a FRESH reader per access — patch the class
    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    assert MV.refresh_view(cat, "mv", "v") == "incremental"
    delta_calls = [
        c for c in seen["calls"] if set(c) and set(c) <= new
    ]
    assert delta_calls, "refresh never scanned the new files in isolation"
    assert all(set(c) <= new for c in delta_calls)


def test_incremental_inverted_index_via_mv(spark, tmp_path):
    """Compose the layers: the BM25 inverted index maintained as a
    term-bucketed MV — append new documents, refresh folds only the new
    files, search results equal the inline full-corpus query."""
    from lachesis_spark.llm import search as S

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("docs")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    cat.write_set(old.repartition(2), "docs", "corpus")
    S.index_documents_incremental(cat, "idx", "docs", "corpus")
    new.repartition(2).write.mode("append").parquet(cat.set_path("docs", "corpus"))
    assert S.refresh_index(cat, "idx") == "incremental"
    via_mv = {
        (r["doc_id"], r["score"])
        for r in S.search_incremental_index(cat, "idx", S.BM25_TERMS, k=20).collect()
    }
    inline = {
        (r["doc_id"], r["score"])
        for r in S.search_bm25_topk(spark, SF_SMOKE).collect()
    }
    assert via_mv == inline
    # the state kept its term bucketing through the refresh
    from lachesis_spark.catalog import LAYOUT_FILE

    assert os.path.isfile(
        os.path.join(cat.set_path("idx", "postings_mv"), LAYOUT_FILE)
    )


def test_streaming_append_sink_feeds_incremental_view(spark, tmp_path):
    """The streaming half of the MV pattern: a parquet stream flows
    through write_stream_append into a catalog set; refresh_view after
    each replay folds ONLY the newly landed files (mode 'incremental'),
    and the view always equals the batch aggregate of everything
    ingested so far."""
    import glob
    import shutil

    from lachesis_spark.streaming.stream import write_stream_append

    src = tmp_path / "src"
    src.mkdir()
    cat = Catalog(spark, str(tmp_path / "catroot"))
    cat.create_database("s")
    chk = str(tmp_path / "chk")

    def add_file(i, rows):
        df = spark.createDataFrame(rows, "g string, v double")
        out = str(tmp_path / f"b{i}")
        df.coalesce(1).write.parquet(out)
        f = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.move(f, str(src / f"{i:02d}.parquet"))

    def ingest():
        stream = spark.readStream.schema("g string, v double").format(
            "parquet"
        ).load(str(src))
        write_stream_append(stream, cat, "s", "feed", chk)

    def view_state():
        return {
            r["g"]: (r["mv_count"], round(r["sum_v"], 6))
            for r in cat.read_set("s", "v").collect()
        }

    add_file(0, [("a", 1.0), ("b", 2.0)])
    ingest()
    MV.create_agg_view(cat, "s", "v", "s", "feed", ["g"], ["v"])
    assert view_state() == {"a": (1, 1.0), "b": (1, 2.0)}

    add_file(1, [("a", 3.0), ("c", 4.0)])
    ingest()  # same checkpoint: only the new file lands, appended
    assert MV.refresh_view(cat, "s", "v") == "incremental"
    assert view_state() == {"a": (2, 4.0), "b": (1, 2.0), "c": (1, 4.0)}

    add_file(2, [("b", 5.0)])
    ingest()
    assert MV.refresh_view(cat, "s", "v") == "incremental"
    assert view_state() == {"a": (2, 4.0), "b": (2, 7.0), "c": (1, 4.0)}


def test_incremental_itemset_counts_via_mv(spark, tmp_path):
    """Basket-pair counts maintained as an MV.  Pair generation is only
    file-decomposable when every basket is FILE-LOCAL (a file split
    mid-basket would undercount its cross-file pairs), so the source is
    laid out one-file-per-orderkey-bucket and the append batch carries
    complete baskets — then the per-file transform + fold is exact, and
    the refreshed state equals a full recompute over the union."""
    from lachesis_spark.plans import matview as MV

    def basket_pairs(df):
        b = df.select(
            F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
        ).distinct()
        return (
            b.alias("a")
            .join(b.alias("c"), "oid")
            .filter(F.col("a.item") < F.col("c.item"))
            .select(F.col("a.item").alias("p1"), F.col("c.item").alias("p2"))
        )

    MV.register_transform("basket_pairs", basket_pairs)
    cat = Catalog(spark, str(tmp_path))
    cat.create_database("sales")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    old = li.filter(F.col("l_orderkey") % 3 != 0)
    new = li.filter(F.col("l_orderkey") % 3 == 0)
    # basket-co-located layout: bucket by the basket key
    cat.write_set(old, "sales", "li", bucket_by=(4, ["l_orderkey"]))
    MV.create_agg_view(
        cat, "mv", "pair_counts", "sales", "li",
        keys=["p1", "p2"], cols=[], transform="basket_pairs",
    )
    # append a batch of COMPLETE new baskets (fresh orderkeys)
    new.repartition(2).write.mode("append").parquet(cat.set_path("sales", "li"))
    assert MV.refresh_view(cat, "mv", "pair_counts") == "incremental"
    got = {
        (r.p1, r.p2, r.mv_count)
        for r in MV.read_view(cat, "mv", "pair_counts").collect()
    }
    want = {
        (r.p1, r.p2, r.n)
        for r in basket_pairs(li)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want
