"""Tumbling / sliding / session event-time windows — batch form.

These are the batch (replayable) versions of the streaming jobs in
:mod:`lachesis_spark.streaming.stream`; identical window semantics, so the
DuckDB oracles here gate the streaming logic too.

Scale: all three are single-shuffle groupBys on (window, key).  A 100 TB
events table partitioned by date prunes the scan to the queried range, and
the window expression is a pure codegen projection — no Python, no explode
except the bounded 2-per-row sliding expansion Spark does internally.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAP = "10 minutes"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dtype-branching reader: the testdata `ts` encoding has drifted between
    # rounds (int64-nanos vs timestamp[us]); read_events handles both.
    from lachesis_spark.sources.readers import read_events

    return read_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# 1. Tumbling 1-hour window per event_type.
def win_tumbling(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


WIN_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
       event_type, count(*) AS n_events, sum(value) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# 2. Sliding 1-hour window every 30 minutes, global event rate.
#    Each row lands in exactly 2 windows (len/slide = 2); DuckDB mirrors
#    Spark's expansion with an explicit k ∈ {0,1} cross join.
def win_sliding(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "avg_value",
        )
    )


WIN_SLIDING_SQL = """
WITH slid AS (
  SELECT ts, value,
         time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS win_start
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
)
SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
       count(*) AS n_events, avg(value) AS avg_value
FROM slid GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 3. Session windows per user, 10-minute inactivity gap.
#    Spark session_window end = last event + gap; the oracle reproduces the
#    gaps-and-islands form (lag + running sum of session breaks).
def win_session(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


WIN_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '10 minutes'
              THEN 0 ELSE 1 END AS brk
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id, min(ts) AS sess_start,
       max(ts) + INTERVAL '10 minutes' AS sess_end,
       count(*) AS n_events, sum(value) AS sum_value
FROM sess GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# 4. Event correlation: click → purchase by the same user within 30 minutes
#    (the batch twin of the stream-stream interval join in stream.py).
def win_correlation(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"),
        F.col("value").alias("amount"),
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.sum("amount").alias("attributed_value"),
    )


WIN_CORRELATION_SQL = """
SELECT c.user_id, count(*) AS n_attributed, sum(b.value) AS attributed_value
FROM events c JOIN events b
  ON c.user_id = b.user_id
 AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL '30 minutes'
WHERE c.event_type = 'click' AND b.event_type = 'purchase'
GROUP BY c.user_id
"""


# ---------------------------------------------------------------------------
# 5. As-of join: each purchase matched to the same user's most recent click
#    at or before it.  Implemented as a union + ordered window carry-forward
#    (one shuffle on user_id, no range-join pair blowup): tag both event
#    kinds, sort per user by (ts, kind, id), and carry the last click
#    forward — the standard scalable as-of formulation.
def win_asof(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("kind"),
        F.col("event_id").alias("click_id"), F.lit(None).cast("long").alias("purchase_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # at equal ts the click sorts first (kind 0) → "at or before" semantics;
    # among same-ts clicks the highest id wins (deterministic)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("click_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(buys).withColumn(
        "last_click", F.last("click_id", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("kind") == 1) & F.col("last_click").isNotNull())
        .select("purchase_id", "user_id", F.col("last_click").alias("click_id"))
    )


WIN_ASOF_SQL = """
SELECT purchase_id, user_id, click_id FROM (
  SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM events p JOIN events c
    ON c.user_id = p.user_id AND c.ts <= p.ts
  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# 6. Hierarchical (hypertable-style) rollup: hourly aggregates computed FROM
#    the minute-level rollup rather than raw events — the continuous-
#    aggregate chain pattern.  At 100 TB each level reads the previous
#    level's materialization (~60-3600× smaller than raw); associative
#    aggregates (count/sum + min/max) make the chain exact, which the
#    oracle proves by computing the hourly result straight from raw.
def win_hier_rollup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    minute = ev.groupBy(
        F.window("ts", "1 minute").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.max("value").alias("mx"),
    )
    hourly = (
        minute.groupBy(
            F.window(F.col("w.start"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").alias("sum_value"),
            F.max("mx").alias("max_value"),
        )
    )
    return hourly.select(
        F.col("h.start").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
        "max_value",
    )


WIN_HIER_ROLLUP_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
       count(*) AS n_events, sum(value) AS sum_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 7. Gap-fill + LOCF: the time-series downsampling surface (TimescaleDB's
#    time_bucket_gapfill / locf).  Hourly per-user averages on a COMPLETE
#    hour grid, missing hours carried forward from the last observation.
GAPFILL_USERS = 20  # bounded user slice: output = users x hours, never x rows


def win_gapfill(spark, sf_dir):
    """Per-user hourly averages gap-filled over the global hour grid with
    last-observation-carried-forward.

    Scale shape: the observation agg is one windowed groupBy; the grid is
    (bounded user slice) × (span hours) built from a 1-row bounds
    aggregate — sequence+explode, no scan; LOCF is a PER-USER running
    window (partitioned — never the unpartitioned-window anti-pattern).
    Leading hours before a user's first observation stay NULL (there is
    nothing to carry)."""
    ev = _events(spark, sf_dir)
    obs = (
        ev.filter(F.col("user_id") < GAPFILL_USERS)
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.avg("value").alias("v"))
        .select("user_id", F.col("w.start").alias("hour_start"), "v")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour_start")
    )
    users = (
        ev.filter(F.col("user_id") < GAPFILL_USERS).select("user_id").distinct()
    )
    grid = hours.crossJoin(F.broadcast(users))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            "hour_start",
            F.round(F.last("v", ignorenulls=True).over(w), 6).alias("v_filled"),
        )
    )


WIN_GAPFILL_SQL = f"""
WITH obs AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
         avg(value) AS v
  FROM events WHERE user_id < {GAPFILL_USERS} GROUP BY 1, 2
),
bounds AS (
  SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS h0,
         time_bucket(INTERVAL '1 hour', max(ts)) AS h1
  FROM events
),
hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour_start
  FROM bounds
),
users AS (
  SELECT DISTINCT user_id FROM events WHERE user_id < {GAPFILL_USERS}
),
grid AS (SELECT u.user_id, h.hour_start FROM users u CROSS JOIN hours h)
SELECT g.user_id, g.hour_start,
       round(last_value(o.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
FROM grid g LEFT JOIN obs o
  ON g.user_id = o.user_id AND g.hour_start = o.hour_start
"""


# ---------------------------------------------------------------------------
# 8. Exponentially-weighted moving average — the smoothed per-entity
#    baseline an anomaly monitor (evt_anomaly's continuous twin) keeps.
#    Finite-memory formulation: weights (1-α)^j over each user's last
#    EWMA_W observations, normalized by the present-weight sum — the
#    truncated-EWMA every streaming system actually computes (exact
#    infinite-horizon EWMA is a linear recurrence whose float error and
#    state grow unboundedly; truncation at W=8 bounds both, and the
#    dropped tail weighs (1-α)^8 < 1.7%).
#
#    Scale: one shuffle on user_id; the rank window is per-user (never a
#    global sort), the weighting is a codegen expression, and the result
#    is one row per entity — the shape of a baseline dimension table
#    refreshed per batch.
EWMA_ALPHA = 0.4
EWMA_W = 8


def win_ewma(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = ev.select(
        "user_id", "value", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= EWMA_W)
    wgt = F.pow(F.lit(1.0 - EWMA_ALPHA), F.col("rn") - 1)
    return (
        recent.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_recent"),
            F.round(F.sum(wgt * F.col("value")) / F.sum(wgt), 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


WIN_EWMA_SQL = f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_recent,
       round(sum(power({1.0 - EWMA_ALPHA}, rn - 1) * value)
             / sum(power({1.0 - EWMA_ALPHA}, rn - 1)), 6) AS ewma
FROM ranked WHERE rn <= {EWMA_W}
GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 9. OHLC bars — the canonical time-series downsample: per (event_type,
#    hour) the first / max / min / last value, with (ts, event_id) as the
#    deterministic intra-bar order.  One shuffle on (type, hour); open and
#    close come from rank windows over that same partitioning (two
#    WindowExec passes over sorted runs, no extra exchange), high/low/
#    volume from the groupBy.  Output is bar-grid-sized.
def win_ohlc(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        "ts",
        "event_id",
        "value",
    )
    wf = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    wl = Window.partitionBy("event_type", "bar").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type", "bar", "value",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    oc = ranked.groupBy("event_type", "bar").agg(
        F.max(F.when(F.col("rf") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rl") == 1, F.col("value"))).alias("close"),
    )
    hl = ev.groupBy("event_type", "bar").agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        hl.join(oc, ["event_type", "bar"])
        .select(
            "event_type", "bar", "open", "high", "low", "close", "n_events"
        )
        .orderBy("event_type", "bar")
    )


WIN_OHLC_SQL = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS bar, ts, event_id, value
  FROM events
), ranked AS (
  SELECT event_type, bar, value,
         row_number() OVER (PARTITION BY event_type, bar ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY event_type, bar ORDER BY ts DESC, event_id DESC) AS rl
  FROM ev
), oc AS (
  SELECT event_type, bar,
         max(CASE WHEN rf = 1 THEN value END) AS open,
         max(CASE WHEN rl = 1 THEN value END) AS close
  FROM ranked GROUP BY event_type, bar
), hl AS (
  SELECT event_type, bar, max(value) AS high, min(value) AS low,
         count(*)::BIGINT AS n_events
  FROM ev GROUP BY event_type, bar
)
SELECT hl.event_type, hl.bar, oc.open, hl.high, hl.low, oc.close, hl.n_events
FROM hl JOIN oc USING (event_type, bar)
ORDER BY hl.event_type, hl.bar
"""


QUERIES = {
    "win_tumbling": win_tumbling,
    "win_sliding": win_sliding,
    "win_session": win_session,
    "win_correlation": win_correlation,
    "win_asof": win_asof,
    "win_hier_rollup": win_hier_rollup,
    "win_gapfill": win_gapfill,
    "win_ewma": win_ewma,
    "win_ohlc": win_ohlc,
}

ORACLE = {
    "win_tumbling": WIN_TUMBLING_SQL,
    "win_sliding": WIN_SLIDING_SQL,
    "win_session": WIN_SESSION_SQL,
    "win_correlation": WIN_CORRELATION_SQL,
    "win_asof": WIN_ASOF_SQL,
    "win_hier_rollup": WIN_HIER_ROLLUP_SQL,
    "win_gapfill": WIN_GAPFILL_SQL,
    "win_ewma": WIN_EWMA_SQL,
    "win_ohlc": WIN_OHLC_SQL,
}
