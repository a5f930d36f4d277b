"""Cross-engine hashing: every Spark column builder in functions.hashing
must agree bit-for-bit with its DuckDB SQL twin (these hashes drive dedup,
LSH, and generated NN weights, so one differing bit breaks oracles)."""

from __future__ import annotations

import pyspark.sql.functions as F

from lachesis_spark.functions import hashing as H

CORPUS = [
    "", "a", "hello world", "0|1", "Zürich", "the quick brown fox",
    "123456789", "x" * 300, "tab\tsep", "newline\nin middle",
]


def _spark_vals(spark, col):
    df = spark.createDataFrame([(s,) for s in CORPUS], "s string")
    return [r["v"] for r in df.select(col.alias("v")).collect()]


def _duck_vals(duck, expr):
    rows = duck.execute(
        f"SELECT {expr} AS v FROM (SELECT unnest(?) AS s)", [CORPUS]
    ).fetchall()
    return [r[0] for r in rows]


def test_h60_matches_duckdb(spark, duck):
    assert _spark_vals(spark, H.h60("s")) == _duck_vals(duck, H.sql_h60("s"))


def test_h60_seeded_matches_duckdb(spark, duck):
    assert _spark_vals(spark, H.h60_seeded("s", 7)) == _duck_vals(
        duck, H.sql_h60_seeded("s", 7)
    )


def test_hash01_matches_duckdb(spark, duck):
    svals = _spark_vals(spark, H.hash01("s", 3))
    dvals = _duck_vals(duck, H.sql_hash01("s", 3))
    assert all(abs(a - b) < 1e-15 for a, b in zip(svals, dvals))
    assert all(0.0 <= v < 1.0 for v in svals)


def test_hbit_matches_duckdb(spark, duck):
    for bit in (0, 17, 59):
        assert _spark_vals(spark, H.hbit("s", bit, 5)) == _duck_vals(
            duck, H.sql_hbit("s", bit, 5)
        )


def test_hyperplane_sign_matches_h60(spark):
    """The driver-side literal hyperplane signs (llm.similarity) must equal
    bit 0 of the engine-side h60 of the same string."""
    from lachesis_spark.llm.similarity import _hyperplane_sign

    pairs = [(b, j) for b in range(4) for j in (1, 2, 33, 64)]
    df = spark.createDataFrame(
        [(f"{b}|{j}",) for b, j in pairs], "s string"
    )
    engine = [
        r["v"]
        for r in df.select(
            (H.h60("s").bitwiseAND(F.lit(1)) * 2 - 1).cast("double").alias("v")
        ).collect()
    ]
    driver = [_hyperplane_sign(b, j) for b, j in pairs]
    assert engine == driver
