"""Source connectors: JSON/CSV round-trips with explicit schemas, corrupt-
record quarantine, and the Reddit pipeline run from a JSON source."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from lachesis_spark.sources import readers as R
from tests.conftest import SF_SMOKE, canon


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))


def _same(a, b):
    assert sorted(a.columns) == sorted(b.columns)
    assert canon(a.collect(), a.columns) == canon(b.collect(), b.columns)


def test_json_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_json")
    R.write_json(docs, path)
    back = R.read_json(spark, path, docs.schema)
    clean, bad = R.split_corrupt(back)
    assert bad.count() == 0
    _same(clean, docs)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_orc")
    R.write_orc(docs, path)
    back = R.read_orc(spark, path)
    _same(back, docs)
    # ORC scans get the same filter pushdown machinery as parquet
    q = back.filter(F.col("doc_id") < 10).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id)" in plan or "LessThan(doc_id" in plan


def test_csv_roundtrip_pipe_delimited(spark, tmp_path):
    # tpch-dbgen style: '|' separator, no header
    docs = _docs(spark).select("doc_id", "lang", "source", "n_chars")
    path = str(tmp_path / "docs_csv")
    R.write_csv(docs, path, sep="|", header=False)
    back = R.read_csv(spark, path, docs.schema, sep="|", header=False)
    clean, bad = R.split_corrupt(back)
    assert bad.count() == 0
    _same(clean, docs)


def test_corrupt_records_quarantined(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "part-0.json").write_text(
        '{"doc_id": 1, "lang": "en"}\n'
        "this is not json\n"
        '{"doc_id": 2, "lang": "de"}\n'
    )
    df = R.read_json(spark, str(d), "doc_id BIGINT, lang STRING")
    clean, bad = R.split_corrupt(df)
    assert clean.count() == 2
    assert bad.count() == 1


def test_reddit_pipeline_from_json_source(spark, tmp_path):
    """The pipeline result must be source-format-independent: events
    re-ingested via JSON gives the same answer as the parquet path."""
    from lachesis_spark.plans import reddit

    ev = reddit._events(spark, SF_SMOKE).drop("ts")
    path = str(tmp_path / "events_json")
    R.write_json(ev, path)
    back, bad = R.split_corrupt(R.read_json(spark, path, ev.schema))
    assert bad.count() == 0

    c = back.select(
        F.col("event_id").alias("comment_id"),
        F.col("user_id").alias("author_id"),
        F.col("value").alias("score"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    a = (
        c.groupBy("author_id")
        .agg(F.count(F.lit(1)).alias("n_comments"), F.avg("score").alias("avg_score"))
        .withColumn(
            "tier",
            F.when(F.col("n_comments") >= 15, "heavy")
            .when(F.col("n_comments") >= 5, "regular")
            .otherwise("light"),
        )
    )
    docs = _docs(spark).select("doc_id", "source")
    got = (
        c.join(F.broadcast(a), "author_id")
        .join(docs, c["k"] == docs["doc_id"])
        .withColumn("label", (F.col("score") > 0).cast("int"))
        .groupBy("source", "tier", "label")
        .agg(F.count(F.lit(1)).alias("n_comments"), F.avg("score").alias("avg_score"))
    )
    _same(got, reddit.reddit_pipeline(spark, SF_SMOKE))


def test_catalog_export_set(spark, tmp_path):
    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.register_testdata(SF_SMOKE)
    out = str(tmp_path / "region_csv")
    cat.export_set("testdata", "region", out, "csv")
    back = spark.read.option("header", True).csv(out)
    assert back.count() == cat.read_set("testdata", "region").count()


def test_date_partitioned_write_prunes_scan(spark, tmp_path):
    """Writing events date-partitioned makes a date filter prune the scan to
    matching partitions (PartitionFilters in the plan; the SCALE.md claim)."""
    from lachesis_spark.catalog import Catalog

    from lachesis_spark.sources.readers import read_events

    ev = read_events(spark, SF_SMOKE).withColumn(
        "event_date", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    cat = Catalog(spark, str(tmp_path))
    cat.write_set(ev, "parts", "events_by_date", partition_by=["event_date"])

    one_day = ev.select("event_date").distinct().orderBy("event_date").first()[0]
    scan = cat.read_set("parts", "events_by_date").filter(
        F.col("event_date") == one_day
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan
    # pruned scan returns exactly that day's rows
    expected = ev.filter(F.col("event_date") == one_day).count()
    assert scan.count() == expected > 0


def test_binary_file_source_reads_payloads(spark, tmp_path):
    """binaryFile ingestion: one row per file with raw bytes; size filter
    prunes at the file index; glob restricts extensions."""
    from lachesis_spark.sources import readers as R

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.img").write_bytes(b"\x89IMG" + b"\x00" * 10)
    (d / "b.img").write_bytes(b"\x89IMG" + b"\xff" * 2000)
    (d / "notes.txt").write_text("not media")

    all_media = R.read_binary_files(spark, str(d), glob="*.img")
    rows = {r.path.split("/")[-1]: r for r in all_media.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert bytes(rows["a.img"].content)[:4] == b"\x89IMG"
    assert rows["b.img"].length == 2004

    small = R.read_binary_files(spark, str(d), glob="*.img", max_bytes=100)
    assert [r.path.split("/")[-1] for r in small.collect()] == ["a.img"]


def test_merge_set_upserts_by_key(spark, tmp_path):
    """Unpartitioned MERGE: updated keys replaced, new keys inserted,
    untouched rows preserved."""
    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    cat.write_set(base, "db", "t")
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    cat.merge_set(updates, "db", "t", ["k"])
    got = {r.k: (r.s, r.v) for r in cat.read_set("db", "t").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_set_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    """Partition-scoped MERGE: only partitions present in the updates are
    rewritten; untouched partition files stay byte-identical on disk."""
    import os

    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0), (3, "2024-01-02", 30.0)],
        "k long, day string, v double",
    )
    base.write.mode("overwrite").partitionBy("day").parquet(cat.set_path("db", "t"))

    def listing(day):
        d = os.path.join(cat.set_path("db", "t"), f"day={day}")
        return {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d) if f.endswith(".parquet")}

    before_untouched = listing("2024-01-02")
    updates = spark.createDataFrame(
        [(2, "2024-01-01", 99.0), (5, "2024-01-01", 50.0)], "k long, day string, v double"
    )
    cat.merge_set(updates, "db", "t", ["k"], partition_col="day")
    got = {r.k: r.v for r in cat.read_set("db", "t").collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0, 5: 50.0}
    assert listing("2024-01-02") == before_untouched


def test_zorder_layout_prunes_row_groups_on_both_dimensions(spark, tmp_path):
    """Z-ordered files carry tight min/max stats on BOTH clustered columns,
    so a predicate on either dimension excludes most row groups; a linear
    sort only prunes its own sort column."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    from lachesis_spark.sources.layout import zorder

    ev = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder(ev, ["user_id", "value"], bits=8, n_files=16).write.parquet(zpath)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )

    def matching_groups(path, col, point):
        total = hit = 0
        for f in _glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if st.min <= point <= st.max:
                    hit += 1
        return hit, total

    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    mid_val = (lo + hi) / 2
    mid_user = ev.agg(F.expr("percentile(user_id, 0.5)")).first()[0]

    zu, zt = matching_groups(zpath, "user_id", int(mid_user))
    zv, _ = matching_groups(zpath, "value", mid_val)
    lv, lt = matching_groups(lpath, "value", mid_val)

    assert zu <= zt // 2, f"z-order should prune user_id: {zu}/{zt}"
    assert zv <= zt // 2, f"z-order should prune value: {zv}/{zt}"
    # linear layout prunes the non-sort column strictly worse than z-order
    # (small files can exclude mid_val by chance, so compare, don't absolutize)
    assert lv / lt > zv / zt, f"linear {lv}/{lt} should prune value worse than z {zv}/{zt}"
    # layout is a permutation, not a transformation
    assert spark.read.parquet(zpath).count() == ev.count()


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """A corpus written in waves with evolving schemas reads back as one
    table: mergeSchema unions the fields, missing columns are null — the
    append-only ingestion pattern for a long-lived 100 TB corpus."""
    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "alpha")], "id long, text string")
    v2 = spark.createDataFrame(
        [(2, "beta", "en")], "id long, text string, lang string"
    )
    v1.write.mode("append").parquet(p)
    v2.write.mode("append").parquet(p)
    got = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(got.columns) == {"id", "text", "lang"}
    rows = {r.id: (r.text, r.lang) for r in got.collect()}
    assert rows == {1: ("alpha", None), 2: ("beta", "en")}


def test_compact_set_coalesces_fragmented_files(spark, tmp_path):
    """A set fragmented by many tiny writes compacts to few files with
    identical contents."""
    import glob

    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    base = spark.range(0, 10_000).withColumnRenamed("id", "k")
    base.repartition(64).write.parquet(cat.set_path("db", "frag"))
    before = len(glob.glob(cat.set_path("db", "frag") + "/*.parquet"))
    assert before >= 32

    n = cat.compact_set("db", "frag")
    after = len(glob.glob(cat.set_path("db", "frag") + "/*.parquet"))
    assert after == n < before
    got = cat.read_set("db", "frag")
    assert got.count() == 10_000
    assert got.agg({"k": "sum"}).first()[0] == 10_000 * 9_999 // 2


def test_compact_after_bucketed_write_stays_readable(spark, tmp_path):
    """Regression: compact_set (or any plain path rewrite) over a bucketed
    set must drop the session table backing it — otherwise the next
    read_set routes through a table whose cached listing names files that
    no longer exist (FAILED_READ_FILE) and whose bucket metadata no longer
    matches the plain part files on disk."""
    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.create_database("db")
    base = spark.range(0, 5_000).withColumnRenamed("id", "k")
    cat.write_set(base.repartition(16), "db", "bset", bucket_by=(8, ["k"]))
    assert spark.catalog.tableExists("db_bset")

    n = cat.compact_set("db", "bset")
    assert n >= 1
    assert not spark.catalog.tableExists("db_bset")  # stale table dropped
    got = cat.read_set("db", "bset")
    assert got.count() == 5_000
    assert got.agg({"k": "sum"}).first()[0] == 5_000 * 4_999 // 2

    # plain write_set over the same name must also clear an owned table
    cat.write_set(base, "db", "bset2", bucket_by=(4, ["k"]))
    assert spark.catalog.tableExists("db_bset2")
    cat.write_set(base.limit(10), "db", "bset2")
    assert not spark.catalog.tableExists("db_bset2")
    assert cat.read_set("db", "bset2").count() == 10


def test_read_events_handles_both_ts_encodings(spark, tmp_path):
    """Schema-drift guard: the testdata generator has shipped events.ts as
    both TIMESTAMP(NANOS) (Spark reads int64 under nanosAsLong) and
    timestamp[us] (Spark reads TIMESTAMP_NTZ).  read_events must normalize
    either encoding to the same instants — this exact drift broke all 11
    event-time queries in round 2 and must never reach the gate again."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "event_id": [1, 2, 3],
        "us": [0, 1_700_000_000_123_456, 1_700_003_600_654_321],
    }
    nanos_tbl = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array([u * 1000 for u in rows["us"]], pa.timestamp("ns")),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    micros_tbl = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["us"], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    p_nanos = str(tmp_path / "events_nanos.parquet")
    p_micros = str(tmp_path / "events_micros.parquet")
    pq.write_table(nanos_tbl, p_nanos, store_schema=False)
    pq.write_table(micros_tbl, p_micros)

    for ltz in (False, True):
        a = R.read_events(spark, p_nanos, ltz=ltz)
        b = R.read_events(spark, p_micros, ltz=ltz)
        assert dict(a.dtypes)["ts"] == dict(b.dtypes)["ts"]
        got_a = [r["us"] for r in a.selectExpr(
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us").orderBy("us").collect()]
        got_b = [r["us"] for r in b.selectExpr(
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us").orderBy("us").collect()]
        assert got_a == got_b == sorted(rows["us"])


def test_read_events_rejects_unknown_ts_dtype(spark, tmp_path):
    """A ts column of a dtype the normalizer doesn't understand must fail
    loudly at read time, not produce silently-wrong windows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    bad = pa.table({"event_id": pa.array([1], pa.int64()),
                    "ts": pa.array(["oops"], pa.string())})
    p = str(tmp_path / "events_bad.parquet")
    pq.write_table(bad, p)
    with pytest.raises(TypeError, match="unsupported dtype"):
        R.read_events(spark, p)
