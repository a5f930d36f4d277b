"""Vector math over ``array<float/double>`` columns — JVM-side expressions.

The similarity-search operators need dot products, norms, and cosine over an
embedding column.  ``F.zip_with`` + ``F.aggregate`` keep the arithmetic in
codegen; a Pandas-UDF path exists in llm.similarity for batch-BLAS when the
dimensionality makes expression trees slow (the crossover is ~1k dims).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def scale(a: Column, s: Column | float) -> Column:
    sc = F.lit(s) if isinstance(s, float) else s
    return F.transform(a, lambda x: x * sc)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def arr_lit(vals) -> Column:
    """Python floats as ONE parsed array<double> literal.  ``F.lit`` of
    the same list converts element-by-element over py4j — measured at
    >1 s for a few thousand doubles — while one ``F.expr`` parse is
    ~20 ms; ``repr`` round-trips every double exactly, so the parsed
    literal is bit-identical to the F.lit form."""
    return F.expr(
        "array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")"
    )


def mat_lit(rows) -> Column:
    """List-of-lists of Python floats as one parsed
    array<array<double>> literal (see arr_lit for why expr, not lit)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in row) + ")"
            for row in rows
        )
        + ")"
    )


def matvec(m_t: Column, x: Column, n_out: int) -> Column:
    """y[k] = dot(row k of m_t, x) — a dense mat-vec as one
    transform-over-sequence fold; m_t holds the TRANSPOSED matrix (row k
    = output dim k's weights)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_out - 1)),
        lambda k: dot(F.element_at(m_t, k + 1), x),
    )
