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
