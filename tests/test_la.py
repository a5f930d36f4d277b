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
