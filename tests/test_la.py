"""LA library + DSL front-end: inverse identity, DSL parse/eval equivalence,
and parse errors."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lachesis_spark.plans import la, la_dsl
from tests.conftest import SF_SMOKE, canon


def test_inverse_times_matrix_is_identity(spark):
    out = la.la_inverse_identity(spark, SF_SMOKE).collect()
    # after rounding to 1e-6 only the diagonal survives, all ones
    assert all(r["i"] == r["j"] and abs(r["v"] - 1.0) < 1e-5 for r in out)
    assert len(out) == 64


def test_dsl_matches_direct_algebra(spark):
    got = la_dsl.run(spark, SF_SMOKE, "A = load(embeddings)\nR = rowSum(A '* A)")
    exp = la.row_sum(la.gram(la.coo_from_embeddings(spark, SF_SMOKE)))
    assert canon(got.collect(), got.columns) == canon(exp.collect(), exp.columns)


def test_dsl_postfix_transpose_and_scale(spark):
    got = la_dsl.run(spark, SF_SMOKE, "A = load(embeddings)\nB = 2 * A'\n")
    exp = la.scale_mult(la.transpose(la.coo_from_embeddings(spark, SF_SMOKE)), 2.0)
    assert canon(got.collect(), got.columns) == canon(exp.collect(), exp.columns)


def test_dsl_identity_matmul(spark):
    got = la_dsl.run(
        spark, SF_SMOKE,
        "A = load(embeddings)\nI = identity(64)\nP = (A %*% I) - A\n",
    )
    assert got.filter(F.col("v") != 0.0).count() == 0


def test_dsl_errors(spark):
    with pytest.raises(SyntaxError):
        la_dsl.run(spark, SF_SMOKE, "A = load(embeddings)\nB = A * A\n")
    with pytest.raises(NameError):
        la_dsl.run(spark, SF_SMOKE, "B = C + C\n")
    with pytest.raises(SyntaxError):
        la_dsl.run(spark, SF_SMOKE, "B = @bad\n")


def test_inverse_newton_converges_distributed(spark):
    """Newton–Schulz distributed inverse: X·A ≈ I to tight tolerance on a
    well-conditioned (diagonally dominant) matrix, with no driver-side
    gather of A anywhere in the computation."""
    import numpy as np
    import pyspark.sql.functions as F

    rng = np.random.RandomState(7)
    n = 16
    m = rng.uniform(-1.0, 1.0, (n, n))
    m += n * np.eye(n)  # diagonally dominant => well-conditioned
    a = spark.createDataFrame(
        [(i, j, float(m[i, j])) for i in range(n) for j in range(n)],
        "i bigint, j bigint, v double",
    )
    x = la.inverse_newton(a, n=n, iters=12)
    prod = la.matmul(x, a)
    err = (
        prod.join(
            la.identity_coo(spark, n).withColumnRenamed("v", "e"),
            ["i", "j"], "outer",
        )
        .select(
            F.abs(F.coalesce(F.col("v"), F.lit(0.0))
                  - F.coalesce(F.col("e"), F.lit(0.0))).alias("d")
        )
        .agg(F.max("d"))
        .first()[0]
    )
    assert err < 1e-9, err
