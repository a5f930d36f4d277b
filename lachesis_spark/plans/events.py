"""Event-sequence analytics over the ``events`` table.

Product-analytics operators the reference's event workloads imply but never
ship as first-class queries: ordered funnels (ClickHouse ``windowFunnel``
semantics), weekly cohort retention, rolling z-score anomaly flags, and a
Kimball SCD Type-2 dimension build.  All four are pure DataFrame plans —
window functions + conditional aggregation, zero Python in the hot path.

Scale notes
-----------
* ``evt_funnel`` shuffles ONCE on ``user_id``; the three chained step
  windows share that partitioning (one Exchange, three WindowExec passes
  over sorted runs), the per-user collapse reuses it, and the final funnel
  frame is 1 row.  At 100 TB the only cost is the user_id exchange — the
  same shuffle any sessionization already pays.
* ``evt_retention`` is window-on-user + distinct + a cohort-week agg whose
  output is (weeks × offsets)-sized, i.e. tiny; the retention fraction is a
  window over that tiny frame.
* ``evt_anomaly`` aggregates to (event_type × hour) first — the rolling
  stats run over the *bucketed* frame (720 rows/month/type), never raw
  events.  Mean/variance use explicit sum / sum-of-squares over integer
  counts so the DuckDB oracle reproduces the doubles bit-for-bit
  (stddev_samp's internal algorithm differs between engines; this doesn't).
* ``scd2_build`` is one row_number+lead window partitioned by the entity
  key — the standard dimension-versioning shuffle, linear in the change
  stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lachesis_spark.sources.readers import read_events

from lachesis_spark.binding import base_table

from lachesis_spark.operators.core import barrier as _barrier


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return base_table(spark, sf_dir, "orders")


# ---------------------------------------------------------------------------
# 1. Ordered funnel: view -> click -> purchase within 24 h of the first view.
#    Earliest-chain semantics: s1 = first view; s2 = first click in
#    [s1, s1+24h]; s3 = first purchase in [s2, s1+24h].  Depth = furthest
#    step reached; the report is users-per-step + conversion from step 1.
def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    day = F.expr("INTERVAL 24 HOURS")

    df = ev.withColumn(
        "s1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    df = df.withColumn(
        "s2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("s1"))
                & (F.col("ts") <= F.col("s1") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "s3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("s2"))
                & (F.col("ts") <= F.col("s1") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = df.groupBy("user_id").agg(
        F.max(
            F.when(F.col("s3").isNotNull(), 3)
            .when(F.col("s2").isNotNull(), 2)
            .when(F.col("s1").isNotNull(), 1)
            .otherwise(0)
        ).alias("depth")
    )
    counts = per_user.agg(
        F.sum((F.col("depth") >= 1).cast("long")).alias("u1"),
        F.sum((F.col("depth") >= 2).cast("long")).alias("u2"),
        F.sum((F.col("depth") >= 3).cast("long")).alias("u3"),
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("step"), F.col("u1").alias("n_users")),
                F.struct(F.lit(2).alias("step"), F.col("u2").alias("n_users")),
                F.struct(F.lit(3).alias("step"), F.col("u3").alias("n_users")),
            )
        ).alias("s"),
        F.col("u1"),
    ).select(
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
        F.round(F.col("s.n_users") / F.col("u1"), 6).alias("conv_from_step1"),
    )


EVT_FUNNEL_SQL = """
WITH u1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS s1
  FROM events GROUP BY user_id
), u2 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'click' AND e.ts >= u1.s1
                   AND e.ts <= u1.s1 + INTERVAL 24 HOUR THEN e.ts END) AS s2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  GROUP BY e.user_id
), u3 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts >= u2.s2
                   AND e.ts <= u1.s1 + INTERVAL 24 HOUR THEN e.ts END) AS s3
  FROM events e
  JOIN u1 ON e.user_id = u1.user_id
  JOIN u2 ON e.user_id = u2.user_id
  GROUP BY e.user_id
), d AS (
  SELECT u1.user_id,
         CASE WHEN u3.s3 IS NOT NULL THEN 3
              WHEN u2.s2 IS NOT NULL THEN 2
              WHEN u1.s1 IS NOT NULL THEN 1 ELSE 0 END AS depth
  FROM u1
  JOIN u2 ON u1.user_id = u2.user_id
  JOIN u3 ON u1.user_id = u3.user_id
), c AS (
  SELECT CAST(sum(CASE WHEN depth >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS u1n,
         CAST(sum(CASE WHEN depth >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS u2n,
         CAST(sum(CASE WHEN depth >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS u3n
  FROM d
)
SELECT 1 AS step, u1n AS n_users, round(CAST(u1n AS DOUBLE) / u1n, 6) AS conv_from_step1 FROM c
UNION ALL
SELECT 2, u2n, round(CAST(u2n AS DOUBLE) / u1n, 6) FROM c
UNION ALL
SELECT 3, u3n, round(CAST(u3n AS DOUBLE) / u1n, 6) FROM c
"""


# ---------------------------------------------------------------------------
# 2. Weekly cohort retention: users grouped by the ISO week of their first
#    event; for each (cohort_week, week_offset) the count of cohort members
#    active that week and the fraction of the cohort they represent.
def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir).select("user_id", "ts")
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "cohort_week", F.date_trunc("week", F.min("ts").over(w))
    ).withColumn("activity_week", F.date_trunc("week", F.col("ts")))
    per = (
        df.select(
            "user_id",
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    g = per.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    wc = Window.partitionBy("cohort_week")
    return g.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active")
            / F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(wc),
            6,
        ).alias("retention"),
    )


EVT_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts)) // 7 AS INTEGER)
           AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id
), g AS (
  SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM a GROUP BY cohort_week, week_offset
)
SELECT cohort_week, week_offset, n_active,
       round(CAST(n_active AS DOUBLE)
             / max(CASE WHEN week_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_week), 6) AS retention
FROM g
"""


# ---------------------------------------------------------------------------
# 3. Rolling z-score anomaly flags on hourly event-type volumes.  The
#    rolling window is the previous 24 OBSERVED hourly buckets (rows-frame,
#    full-window only); mean/variance from explicit sum / sum-of-squares so
#    both engines produce identical IEEE doubles.
def evt_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    st = h.select(
        "event_type",
        "hour",
        "n",
        F.sum("n").over(w).alias("s"),
        F.count("n").over(w).alias("c"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
    )
    mean = F.col("s").cast("double") / 24
    var = (F.col("sq").cast("double") - 24 * mean * mean) / 23
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        st.withColumn("mean_", mean)
        .withColumn("var_", var)
        .withColumn("z_", z)
        .filter(
            (F.col("c") == 24) & (F.col("var_") > 1e-12) & (F.abs(F.col("z_")) >= 2)
        )
        .select(
            "event_type",
            "hour",
            "n",
            F.round("mean_", 4).alias("mean24"),
            F.round("z_", 4).alias("zscore"),
        )
    )


EVT_ANOMALY_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), wdw AS (
  SELECT event_type, hour, n,
         sum(n) OVER w AS s, count(n) OVER w AS c, sum(n * n) OVER w AS sq
  FROM h
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
), st AS (
  SELECT event_type, hour, n, c,
         CAST(s AS DOUBLE) / 24 AS mean_,
         (CAST(sq AS DOUBLE)
          - 24 * (CAST(s AS DOUBLE) / 24) * (CAST(s AS DOUBLE) / 24)) / 23 AS var_
  FROM wdw
)
SELECT event_type, hour, n, round(mean_, 4) AS mean24,
       round((CAST(n AS DOUBLE) - mean_) / sqrt(var_), 4) AS zscore
FROM st
WHERE c = 24 AND var_ > 1e-12
  AND abs((CAST(n AS DOUBLE) - mean_) / sqrt(var_)) >= 2
"""


# ---------------------------------------------------------------------------
# 4. SCD Type-2 dimension build (Kimball): each order is a versioned change
#    to its customer's "latest order" attributes; validity intervals come
#    from lead() over the change stream.  Hash-free deterministic subset
#    (o_custkey % 97 = 0) keeps the emitted dimension bounded while the
#    window itself runs over the full partition.
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir).filter(F.col("o_custkey") % 97 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        F.row_number().over(w).alias("ver"),
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


SCD2_BUILD_SQL = """
SELECT o_custkey,
       CAST(row_number() OVER w AS INTEGER) AS ver,
       o_orderkey, o_totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (lead(o_orderdate) OVER w IS NULL) AS is_current
FROM orders
WHERE o_custkey % 97 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ---------------------------------------------------------------------------
# 5. First-order Markov transition matrix of user journeys: for each
#    consecutive event pair within a user's timeline, count (prev_type →
#    type) and the per-source transition probability.  The model behind
#    next-action prediction and journey sankeys.
#
#    Scale: ONE shuffle on user_id for the lag window (the sessionization
#    partitioning every other evt_* query shares), then a groupBy on the
#    (|types|²)-sized transition space — the output is model-sized, not
#    data-sized.  Probabilities are exact integer ratios rounded at 1e-6
#    so both engines agree bit-for-bit.
def evt_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lachesis_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(totals, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


EVT_MARKOV_SQL = """
WITH pairs AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), c AS (
  SELECT prev_type, next_type, count(*)::BIGINT AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT c.prev_type, c.next_type, c.n,
       round(c.n / t.tot::DOUBLE, 6) AS p
FROM c JOIN (SELECT prev_type, sum(n) AS tot FROM c GROUP BY prev_type) t
  USING (prev_type)
ORDER BY prev_type, next_type
"""


QUERIES = {
    "evt_funnel": evt_funnel,
    "evt_retention": evt_retention,
    "evt_anomaly": evt_anomaly,
    "scd2_build": scd2_build,
    "evt_markov": evt_markov,
}

ORACLE = {
    "evt_funnel": EVT_FUNNEL_SQL,
    "evt_retention": EVT_RETENTION_SQL,
    "evt_anomaly": EVT_ANOMALY_SQL,
    "scd2_build": SCD2_BUILD_SQL,
    "evt_markov": EVT_MARKOV_SQL,
}


# ---------------------------------------------------------------------------
# 6. Hour-of-day seasonal profile + deviation counts — the baseline table
#    behind evt_anomaly's z-scores, exposed as its own operator: per
#    (event_type, hour-of-day) mean value over the whole window, plus how
#    many raw events exceed 2× their slot's seasonal mean.
#
#    Scale: one groupBy to the 24×|types| profile (map-side combined),
#    then ONE re-join of the raw stream against the broadcast-sized
#    profile for the deviation count — the profile is model-sized, the
#    stream is touched exactly twice (once to build, once to compare),
#    and nothing shuffles by value.
def evt_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lachesis_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", F.hour("ts").alias("hod"), "value"
    ).transform(_barrier)
    # mean is rounded BEFORE the 2x comparison: Spark and DuckDB sum
    # doubles in different orders, so a raw avg can differ in the last ulp
    # and flip a value sitting exactly at the 2x boundary between engines.
    prof = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_raw"),
    )
    dev = (
        ev.join(F.broadcast(prof), ["event_type", "hod"])
        .groupBy("event_type", "hod")
        .agg(
            F.sum(
                F.when(F.col("value") > 2 * F.col("mean_raw"), 1).otherwise(0)
            ).cast("long").alias("n_above_2x")
        )
    )
    return (
        prof.join(dev, ["event_type", "hod"])
        .select(
            "event_type", "hod", "n",
            F.col("mean_raw").alias("mean_value"),
            "n_above_2x",
        )
        .orderBy("event_type", "hod")
    )


EVT_SEASONALITY_SQL = """
WITH ev AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hod, value FROM events
), prof AS (
  SELECT event_type, hod, count(*)::BIGINT AS n,
         round(avg(value), 6) AS mean_raw
  FROM ev GROUP BY event_type, hod
), dev AS (
  SELECT ev.event_type, ev.hod,
         sum(CASE WHEN ev.value > 2 * prof.mean_raw THEN 1 ELSE 0 END)::BIGINT
           AS n_above_2x
  FROM ev JOIN prof USING (event_type, hod)
  GROUP BY ev.event_type, ev.hod
)
SELECT p.event_type, p.hod, p.n, p.mean_raw AS mean_value, d.n_above_2x
FROM prof p JOIN dev d USING (event_type, hod)
ORDER BY p.event_type, p.hod
"""

QUERIES["evt_seasonality"] = evt_seasonality
ORACLE["evt_seasonality"] = EVT_SEASONALITY_SQL


# ---------------------------------------------------------------------------
# 7. Top-k 3-step journey paths — the order-2 sequence counts behind a
#    sankey / next-2-action model (evt_markov's higher-order sibling).
#    Same single user_id shuffle; two lags over the shared sort, then a
#    groupBy on the ≤|types|³ path space — output model-sized, ordering
#    fully deterministic (count desc, then path).
PATH_TOPK = 15


def evt_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t3 = ev.select(
        F.lag("event_type", 2).over(w).alias("s1"),
        F.lag("event_type", 1).over(w).alias("s2"),
        F.col("event_type").alias("s3"),
    ).filter(F.col("s1").isNotNull())
    return (
        t3.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "s1", "s2", "s3")
        .limit(PATH_TOPK)
    )


EVT_PATHS_SQL = f"""
WITH t3 AS (
  SELECT lag(event_type, 2) OVER w AS s1,
         lag(event_type, 1) OVER w AS s2,
         event_type AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT s1, s2, s3, count(*)::BIGINT AS n
FROM t3 WHERE s1 IS NOT NULL
GROUP BY s1, s2, s3
ORDER BY n DESC, s1, s2, s3 LIMIT {PATH_TOPK}
"""

QUERIES["evt_paths"] = evt_paths
ORACLE["evt_paths"] = EVT_PATHS_SQL


# ---------------------------------------------------------------------------
# 8. Multi-touch attribution: every purchase distributes conversion credit
#    over the same user's touchpoint events (view/click/signup) in the 24 h
#    before it — last-touch, first-touch, and linear (1/n) models computed
#    side by side, reported per touch type.  The marketing-analytics
#    counterpart of evt_funnel: the funnel asks "did the chain complete",
#    attribution asks "which touch gets the credit".
#
#    Scale: ONE equi-join on user_id with a time-range residue — purchases
#    and touches co-partition on the same user_id exchange every other
#    event query pays, and the residue bounds each pair set to a user's
#    24 h activity.  The per-purchase rank windows partition by the
#    purchase's event_id (rows = that purchase's touches, never a
#    corpus-wide sort), and the report collapses to |touch types| rows.
#    At 100 TB the same plan holds; if user activity is heavy-tailed the
#    join inherits AQE skew splitting on the user_id key.
ATTR_LOOKBACK_H = 24
ATTR_TOUCH_TYPES = ("view", "click", "signup")


def evt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.where(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        "user_id", F.col("event_type").alias("touch"), F.col("ts").alias("t_ts")
    )
    lb = F.expr(f"INTERVAL {ATTR_LOOKBACK_H} HOURS")
    pairs = purchases.join(
        touches,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - lb),
    )
    w = Window.partitionBy("p_id")
    ranked = pairs.select(
        "p_id",
        "touch",
        F.row_number()
        .over(w.orderBy(F.desc("t_ts"), F.desc("touch")))
        .alias("rn_last"),
        F.row_number().over(w.orderBy("t_ts", "touch")).alias("rn_first"),
        F.count(F.lit(1)).over(w).alias("n_touches"),
    )
    return (
        ranked.groupBy("touch")
        .agg(
            F.sum(F.when(F.col("rn_last") == 1, 1.0).otherwise(0.0)).alias("last_touch"),
            F.sum(F.when(F.col("rn_first") == 1, 1.0).otherwise(0.0)).alias("first_touch"),
            F.sum(F.lit(1.0) / F.col("n_touches")).alias("linear"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .orderBy("touch")
    )


EVT_ATTRIBUTION_SQL = f"""
WITH pairs AS (
  SELECT p.event_id AS p_id, t.event_type AS touch, t.ts AS t_ts
  FROM events p
  JOIN events t
    ON t.user_id = p.user_id
   AND t.ts < p.ts
   AND t.ts >= p.ts - INTERVAL {ATTR_LOOKBACK_H} HOUR
  WHERE p.event_type = 'purchase'
    AND t.event_type IN {ATTR_TOUCH_TYPES!r}
),
ranked AS (
  SELECT p_id, touch,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ts DESC, touch DESC) AS rn_last,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ts ASC, touch ASC) AS rn_first,
         count(*) OVER (PARTITION BY p_id) AS n_touches
  FROM pairs
)
SELECT touch,
       CAST(sum(CASE WHEN rn_last = 1 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS last_touch,
       CAST(sum(CASE WHEN rn_first = 1 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS first_touch,
       CAST(sum(1.0 / n_touches) AS DOUBLE) AS linear,
       count(*)::BIGINT AS n_pairs
FROM ranked
GROUP BY touch
ORDER BY touch
"""

QUERIES["evt_attribution"] = evt_attribution
ORACLE["evt_attribution"] = EVT_ATTRIBUTION_SQL



# ---------------------------------------------------------------------------
# 9. A/B experiment analysis: users hash-assigned to two variants (the same
#    seeded md5 family as the corpus splits, so assignment is deterministic,
#    engine-independent, and stable under re-runs and cluster resizes), the
#    experiment metric is each user's total purchase value, and the readout
#    is per-variant n / mean / variance plus the Welch z statistic — the
#    significance test an experimentation pipeline runs on every metric.
#    Variance uses explicit sum / sum-of-squares (the evt_anomaly pattern)
#    so both engines reproduce the doubles; a binary conversion rate is
#    deliberately NOT the statistic here because on this corpus every user
#    purchases (p_pool = 1 degenerates the two-proportion test to 0/0).
#
#    Scale: one map-side-combined groupBy on user_id (the exchange every
#    event query pays), a 2-row variant agg, and the z-score is a window
#    over the 2-row frame.
AB_SEED = 4217


def evt_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lachesis_spark.functions import hashing as H

    ev = read_events(spark, sf_dir)
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ).alias("metric")
        )
        .select(
            F.when(H.hash01(F.col("user_id").cast("string"), AB_SEED) < 0.5, "A")
            .otherwise("B")
            .alias("variant"),
            "metric",
        )
    )
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("metric").alias("s"),
        F.sum(F.col("metric") * F.col("metric")).alias("ss"),
    )
    per = per.select(
        "variant",
        "n_users",
        (F.col("s") / F.col("n_users")).alias("mean"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n_users"))
            / (F.col("n_users") - 1)
        ).alias("var"),
    )
    w = Window.partitionBy()  # 2-row frame: the unpartitioned window is safe
    other = per.select(
        "variant",
        "n_users",
        "mean",
        "var",
        (F.sum("mean").over(w) - F.col("mean")).alias("mean_o"),
        (F.sum("var").over(w) - F.col("var")).alias("var_o"),
        (F.sum("n_users").over(w) - F.col("n_users")).alias("n_o"),
    )
    return other.select(
        "variant",
        "n_users",
        F.round("mean", 6).alias("mean_value"),
        F.round(
            (F.col("mean") - F.col("mean_o"))
            / F.sqrt(F.col("var") / F.col("n_users") + F.col("var_o") / F.col("n_o")),
            6,
        ).alias("welch_z"),
    ).orderBy("variant")


EVT_ABTEST_SQL = """
WITH users AS (
  SELECT CASE WHEN {h} < 0.5 THEN 'A' ELSE 'B' END AS variant,
         sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS metric
  FROM events
  GROUP BY user_id
),
per AS (
  SELECT variant, count(*)::BIGINT AS n_users,
         sum(metric) AS s, sum(metric * metric) AS ss
  FROM users GROUP BY variant
),
m AS (
  SELECT variant, n_users,
         s / n_users AS mean,
         (ss - s * s / n_users) / (n_users - 1) AS var
  FROM per
),
o AS (
  SELECT variant, n_users, mean, var,
         sum(mean) OVER () - mean AS mean_o,
         sum(var) OVER () - var AS var_o,
         sum(n_users) OVER () - n_users AS n_o
  FROM m
)
SELECT variant, n_users,
       round(mean, 6) AS mean_value,
       round((mean - mean_o) / sqrt(var / n_users + var_o / n_o), 6) AS welch_z
FROM o
ORDER BY variant
"""


def _abtest_sql() -> str:
    from lachesis_spark.functions import hashing as H

    return EVT_ABTEST_SQL.format(h=H.sql_hash01("CAST(user_id AS VARCHAR)", AB_SEED))


QUERIES["evt_abtest"] = evt_abtest
ORACLE["evt_abtest"] = _abtest_sql()
