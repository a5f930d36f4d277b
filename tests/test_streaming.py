"""Structured Streaming: replaying the events parquet through the streaming
plans must reproduce the batch window queries (whose DuckDB oracles gate the
semantics), and the custom stateful operator must match a batch groupBy."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lachesis_spark.streaming import stream as S
from lachesis_spark.streaming import windows as W

from tests.conftest import SF_SMOKE, canon


def _assert_same(df_stream_table, df_batch):
    srows, scols = df_stream_table.collect(), df_stream_table.columns
    brows, bcols = df_batch.collect(), df_batch.columns
    assert sorted(scols) == sorted(bcols)
    assert canon(srows, scols) == canon(brows, bcols)


def test_stream_tumbling_matches_batch(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    q = S.run_to_memory(S.stream_tumbling_counts(ev), "t_tumb", "complete")
    try:
        _assert_same(spark.table("t_tumb"), W.win_tumbling(spark, SF_SMOKE))
    finally:
        q.stop()


def test_stream_session_matches_batch(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    q = S.run_to_memory(S.stream_session_counts(ev), "t_sess", "complete")
    try:
        _assert_same(spark.table("t_sess"), W.win_session(spark, SF_SMOKE))
    finally:
        q.stop()


def test_stream_stateful_running_totals(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    q = S.run_to_memory(S.stream_user_running_totals(ev), "t_state", "update")
    try:
        got = spark.table("t_state")
        # update mode may emit multiple rows per user across microbatches;
        # the final state per user is the row with the max n_events.
        final = got.groupBy("user_id").agg(
            F.max(F.struct("n_events", "total_value")).alias("s")
        ).select("user_id", "s.n_events", "s.total_value")
        batch = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").cast("double").alias("total_value"),
            )
        )
        _assert_same(final, batch)
    finally:
        q.stop()


@pytest.mark.parametrize("name", ["win_tumbling", "win_sliding", "win_session"])
def test_window_oracle(spark, duck, name):
    from lachesis_spark.registry import ORACLE, QUERIES
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), duck, ORACLE[name])


def test_stream_incremental_multibatch(spark, tmp_path):
    """Real incremental processing: the events table split into 4
    time-ordered files, replayed one file per trigger — streaming state
    must accumulate across microbatches to the batch answer."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    # build the LTZ events frame the same way the stream source does
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    bounds = base.selectExpr(
        "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) AS p"
    ).first()["p"]
    src = tmp_path / "ev_parts"
    src.mkdir()
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        part = base
        if lo is not None:
            part = part.filter(F.unix_micros("ts") > lo)
        if hi is not None:
            part = part.filter(F.unix_micros("ts") <= hi)
        tmp_out = str(tmp_path / f"w{i}")
        part.coalesce(1).write.parquet(tmp_out)
        f = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(f, str(src / f"{i:02d}.parquet"))
        lo = hi
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    q = S.run_to_memory(S.stream_tumbling_counts(stream), "t_multi", "complete")
    try:
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches >= 3, f"expected multiple microbatches, got {n_batches}"
        _assert_same(spark.table("t_multi"), W.win_tumbling(spark, SF_SMOKE))
    finally:
        q.stop()
