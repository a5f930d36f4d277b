"""Native-lambda escape hatch: batch/row UDF parity with expression
equivalents, 5-input arity, and arbitrary operator+ aggregation states."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lachesis_spark.functions import lambdas as L


def test_batch_lambda_matches_expression(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("b")
    )
    got = df.withColumn("s", L.batch_lambda(lambda a, b: a + b, "long", "id", "b"))
    exp = df.withColumn("s", F.col("id") + F.col("b"))
    assert got.collect() == exp.collect()


def test_row_lambda_q06_style_predicate(spark):
    """The Q06-shape native predicate (reference src/tpch/headers/
    Query06.h:33-67 open-codes it in C++) as a row lambda vs expressions."""
    df = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("qty"),
        ((F.col("id") % 10) / 100.0).alias("disc"),
    )
    pred = L.row_lambda(
        lambda q, d: q < 24 and 0.05 <= d <= 0.07, "boolean", "qty", "disc"
    )
    got = df.filter(pred).count()
    exp = df.filter(
        (F.col("qty") < 24) & (F.col("disc") >= 0.05) & (F.col("disc") <= 0.07)
    ).count()
    assert got == exp > 0


def test_five_input_arity_limit(spark):
    df = spark.range(10).select(*[(F.col("id") + i).alias(f"c{i}") for i in range(6)])
    five = L.row_lambda(
        lambda a, b, c, d, e: a + b + c + d + e, "long", "c0", "c1", "c2", "c3", "c4"
    )
    assert df.select(five.alias("s")).first()["s"] == 0 + 1 + 2 + 3 + 4
    with pytest.raises(ValueError):
        L.row_lambda(lambda *a: 0, "long", "c0", "c1", "c2", "c3", "c4", "c5")


def test_grouped_udaf_avg_state(spark):
    # defined inside the test so cloudpickle ships the class by value
    # (the test module is not importable on executor workers)
    class AvgState(L.MergeState):
        """The reference's Avg{total,count} merge state (Avg.h:11-35)."""

        def __init__(self, total, count):
            self.total, self.count = total, count

        @classmethod
        def from_row(cls, row):
            return cls(row["v"], 1)

        def __add__(self, other):
            return AvgState(self.total + other.total, self.count + other.count)

        def finish(self):
            return {"avg_v": self.total / self.count, "n": self.count}

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    got = L.grouped_udaf(df, ["k"], AvgState, "k long, avg_v double, n long")
    exp = df.groupBy("k").agg(
        F.avg("v").alias("avg_v"), F.count(F.lit(1)).alias("n")
    )
    g = {r["k"]: (round(r["avg_v"], 9), r["n"]) for r in got.collect()}
    e = {r["k"]: (round(r["avg_v"], 9), r["n"]) for r in exp.collect()}
    assert g == e
