"""Event-sequence analytics: funnel, retention, anomaly, SCD2."""

from __future__ import annotations

from pyspark.sql import functions as F

from lachesis_spark.plans.events import (
    evt_anomaly,
    evt_funnel,
    evt_retention,
    scd2_build,
)
from tests.conftest import SF_SMOKE


def test_funnel_is_monotone(spark):
    rows = {r["step"]: r for r in evt_funnel(spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["conv_from_step1"] == 1.0


def test_funnel_chain_respects_order(spark):
    # A user whose only purchase precedes every view must not reach step 3.
    ev = spark.createDataFrame(
        [
            (1, "purchase", "2024-01-01 00:00:00"),
            (1, "view", "2024-01-01 01:00:00"),
            (1, "click", "2024-01-01 02:00:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    import lachesis_spark.plans.events as mod

    orig = mod.read_events
    mod.read_events = lambda s, d: ev
    try:
        rows = {r["step"]: r["n_users"] for r in evt_funnel(spark, "ignored").collect()}
    finally:
        mod.read_events = orig
    assert rows == {1: 1, 2: 1, 3: 0}


def test_retention_offset_zero_is_full_cohort(spark):
    rows = evt_retention(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0
        assert 0.0 <= r["retention"] <= 1.0
        assert r["week_offset"] >= 0


def test_funnel_single_user_shuffle(spark):
    # The three chained step windows must share ONE user_id exchange.
    plan = evt_funnel(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert n_exchanges == 1, plan


def test_anomaly_flags_planted_spike(spark):
    # 30 days alternating 1/2 events per hour (nonzero variance), then one
    # 100-event hour.
    hours = spark.range(24 * 30)
    base = hours.unionByName(hours.filter(F.col("id") % 2 == 0)).select(
        F.lit("click").alias("event_type"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.expr("make_interval(0,0,0,0,CAST(id AS INT),0,0)")).alias("ts"),
        F.lit(7).alias("user_id").cast("long"),
    )
    spike_hour = "2024-01-30 23:00:00"
    spike = (
        spark.range(100)
        .select(
            F.lit("click").alias("event_type"),
            (F.to_timestamp(F.lit(spike_hour)) + F.expr("make_interval(0,0,0,0,0,0,CAST(id AS INT))")).alias("ts"),
            F.lit(7).alias("user_id").cast("long"),
        )
    )
    ev = base.unionByName(spike)
    import lachesis_spark.plans.events as mod

    orig = mod.read_events
    mod.read_events = lambda s, d: ev
    try:
        rows = evt_anomaly(spark, "ignored").collect()
    finally:
        mod.read_events = orig
    flagged = {r["hour"].strftime("%Y-%m-%d %H:%M:%S"): r for r in rows}
    assert spike_hour in flagged
    assert flagged[spike_hour]["zscore"] > 2


def test_scd2_intervals_partition_the_timeline(spark):
    rows = scd2_build(spark, SF_SMOKE).collect()
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault(r["o_custkey"], []).append(r)
    for key, vers in by_key.items():
        vers.sort(key=lambda r: r["ver"])
        assert [r["ver"] for r in vers] == list(range(1, len(vers) + 1))
        # exactly one current version, intervals chain contiguously
        assert sum(r["is_current"] for r in vers) == 1
        assert vers[-1]["is_current"] and vers[-1]["valid_to"] is None
        for a, b in zip(vers, vers[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["valid_to"]


def test_markov_rows_are_probability_distributions(spark):
    import pyspark.sql.functions as F

    from lachesis_spark.plans.events import evt_markov

    df = evt_markov(spark, "/root/testdata/sf0.001")
    # per-source probabilities sum to ~1 (rounding at 1e-6 per cell)
    sums = df.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-4 for r in sums)
    # transition space is |types|^2-bounded
    n_types = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_type").distinct().count()
    )
    assert df.count() <= n_types * n_types


def test_seasonality_profile_shape_and_bounds(spark):
    from lachesis_spark.plans.events import evt_seasonality

    df = evt_seasonality(spark, "/root/testdata/sf0.001").toPandas()
    assert ((df.hod >= 0) & (df.hod <= 23)).all()
    assert (df.n_above_2x <= df.n).all()
    # every (type, hod) slot appears at most once
    assert not df.duplicated(subset=["event_type", "hod"]).any()


def test_ohlc_invariants(spark):
    from lachesis_spark.streaming.windows import win_ohlc

    df = win_ohlc(spark, "/root/testdata/sf0.001").toPandas()
    assert len(df) > 0
    assert ((df.low <= df.open) & (df.open <= df.high)).all()
    assert ((df.low <= df.close) & (df.close <= df.high)).all()
    assert (df.n_events >= 1).all()


def test_paths_are_model_sized_and_sorted(spark):
    from lachesis_spark.plans.events import PATH_TOPK, evt_paths

    df = evt_paths(spark, "/root/testdata/sf0.001").toPandas()
    assert 0 < len(df) <= PATH_TOPK
    keys = list(zip(-df.n, df.s1, df.s2, df.s3))
    assert keys == sorted(keys)


def test_attribution_credit_conservation(spark):
    # every attribution model hands out exactly one unit of credit per
    # purchase-with-touches, however it is split across touch types
    from lachesis_spark.plans.events import evt_attribution

    rows = evt_attribution(spark, SF_SMOKE).collect()
    assert rows, "no attributed purchases"
    last = sum(r.last_touch for r in rows)
    first = sum(r.first_touch for r in rows)
    linear = sum(r.linear for r in rows)
    assert last == first  # both count attributed purchases once each
    assert abs(linear - last) < 1e-6  # linear splits the same unit
    assert all(r.n_pairs >= r.last_touch for r in rows)


def test_attribution_models_on_known_journey(spark):
    # one purchase, three touches: view(t1) click(t2) signup(t3) purchase(t4)
    from lachesis_spark.plans import events as EV

    rows = [
        (1, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),
        (2, "2024-01-01 11:00:00", 7, "click", 0.0, "{}"),
        (3, "2024-01-01 12:00:00", 7, "signup", 0.0, "{}"),
        (4, "2024-01-01 13:00:00", 7, "purchase", 0.0, "{}"),
        (5, "2023-12-30 13:00:00", 7, "view", 0.0, "{}"),  # outside lookback
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r.touch: r for r in EV.evt_attribution(spark, d).collect()}
    assert got["signup"].last_touch == 1.0 and got["signup"].first_touch == 0.0
    assert got["view"].first_touch == 1.0 and got["view"].last_touch == 0.0
    assert all(abs(r.linear - 1 / 3) < 1e-9 for r in got.values())
    assert sum(r.n_pairs for r in got.values()) == 3  # stale view excluded


def test_abtest_symmetry_and_partition(spark):
    from lachesis_spark.plans.events import evt_abtest

    rows = {r.variant: r for r in evt_abtest(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B"}
    # the two z-scores are the same test from either side
    assert abs(rows["A"].welch_z + rows["B"].welch_z) < 1e-6
    # hash assignment partitions the full user set
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert rows["A"].n_users + rows["B"].n_users == ev.select("user_id").distinct().count()
