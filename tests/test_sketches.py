"""Deterministic HLL / Count-Min sketches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lachesis_spark.functions.hashing import h60
from lachesis_spark.plans.sketches import M_HLL, sketch_cms, sketch_hll
from tests.conftest import SF_CHECK, SF_SMOKE


def test_hll_error_within_theory(spark):
    # sigma ~ 1.04/sqrt(512) = 4.6%; 3-sigma bound.
    row = sketch_hll(spark, SF_CHECK).collect()[0]
    assert row["rel_err"] <= 3 * 1.04 / (M_HLL ** 0.5)
    assert row["n_registers_used"] + row["n_registers_zero"] == M_HLL


def test_hll_registers_merge_across_sources(spark):
    # Max-merging per-group registers == registers of the union: the
    # property that makes the sketch distributable (partial agg = merge).
    orders = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    v = orders.select(
        F.col("o_custkey").cast("string").alias("v"),
        (F.col("o_orderkey") % 7).alias("src"),
    )
    h = h60("v")
    hashed = v.select(
        "src",
        h.bitwiseAND(F.lit(M_HLL - 1)).alias("bucket"),
        F.shiftright(h, 9).alias("w"),
    )
    rho = F.when(F.col("w") == 0, 52).otherwise(52 - F.length(F.bin(F.col("w"))))
    per_src = (
        hashed.select("src", "bucket", rho.alias("rho"))
        .groupBy("src", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = per_src.groupBy("bucket").agg(F.max("r").alias("r"))
    direct = (
        hashed.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_never_undercounts(spark):
    rows = sketch_cms(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overcount"] >= 0
        assert r["cms_estimate"] >= r["exact_n"]


def test_quantile_sketch_error_within_bin_width(spark):
    from lachesis_spark.plans.sketches import Q_BINS, sketch_quantile

    sf = "/root/testdata/sf0.001"
    df = sketch_quantile(spark, sf).toPandas()
    assert len(df) == 3
    # histogram estimate can miss by at most one bin width
    import pyspark.sql.functions as F

    li = spark.read.parquet(sf + "/lineitem.parquet")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    width = (hi - lo) / Q_BINS
    assert (df.abs_err <= width).all()


def test_hll_merge_equals_direct_sketch(spark):
    """Register-wise max of per-source sketches == sketch of the union
    stream — the mergeability contract, bit-exact on integer checksums."""
    from lachesis_spark.plans.sketches import sketch_hll_merge

    row = sketch_hll_merge(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.regsum_merged == row.regsum_direct
    assert row.rel_err < 0.2  # p=9 HLL: ~4.6% typical; generous bound


def test_cm_join_estimate_is_upper_bound(spark):
    """CM inner-product never undercounts (hash collisions only ADD)."""
    from lachesis_spark.plans.sketches import sketch_join_size

    row = sketch_join_size(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.cm_estimate >= row.exact_join_size
    assert row.rel_overcount >= 0


def test_exact_quantiles_refined_matches_percentile(spark):
    """The distributed histogram-refinement order statistic equals
    Spark's in-memory percentile aggregate (the thing it replaced after
    the x100 OOM), including the degenerate constant-column case."""
    import pyspark.sql.functions as F

    from lachesis_spark.plans.sketches import Q_PROBES, _exact_quantiles_refined

    x = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(F.col("l_extendedprice").alias("x"))
    )
    got = {r["p"]: r["exact"] for r in _exact_quantiles_refined(spark, x, Q_PROBES).collect()}
    want = x.agg(
        *[F.expr(f"percentile(x, {p})").alias(str(p)) for p in Q_PROBES]
    ).first()
    for p in Q_PROBES:
        assert abs(got[float(p)] - round(float(want[str(p)]), 6)) < 1e-6

    const = spark.range(100).select(F.lit(7.5).alias("x"))
    got_c = {r["p"]: r["exact"] for r in _exact_quantiles_refined(spark, const, Q_PROBES).collect()}
    assert all(v == 7.5 for v in got_c.values())
