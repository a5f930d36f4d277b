"""Native-lambda escape hatch: arbitrary Python logic inside the algebra.

Reference: ``CPlusPlusLambda`` ("native_lambda") — an arbitrary C++ closure
over 1–5 inputs usable as predicate, projection, or key/value extractor
(reference src/lambdas/headers/CPlusPlusLambda.h:240,
LambdaCreationFunctions.h:21-182) — and the user-defined associative
``operator+`` merge that powers AggregateComp
(reference src/queryExecution/headers/ClusterAggregateComp.h:21-28).

Spark mapping, in preference order (SURVEY.md §2.2):

1. Column expressions — most "native lambdas" in the reference workloads are
   arithmetic/compare/substring logic that Catalyst expresses directly; use
   those, they stay in codegen.
2. :func:`batch_lambda` — Arrow-batched pandas UDF over 1–5 columns
   (pandas Series in/out).  ~10-100× faster than per-row Python.
3. :func:`row_lambda` — true per-row closure parity for logic that cannot be
   vectorized.  Implemented on top of the same Arrow batches.
4. :func:`grouped_udaf` / :class:`MergeState` — arbitrary aggregation state
   merged with a user ``+`` (the reference's ``Value::operator+``), run via
   ``applyInPandas`` (one shuffle, same dataflow as the reference's
   combiner-less aggregation).

Scale: 2–4 serialize every referenced column through Arrow — keep them off
the hot path unless the logic genuinely needs Python; never put a
row_lambda inside a join condition (cartesian evaluation).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MAX_ARITY = 5  # the reference's makeLambda supports 1-5 inputs


def _cols(cols) -> list[Column]:
    out = [F.col(c) if isinstance(c, str) else c for c in cols]
    if not 1 <= len(out) <= MAX_ARITY:
        raise ValueError(f"native lambda takes 1..{MAX_ARITY} inputs, got {len(out)}")
    return out


def batch_lambda(fn: Callable, return_type: str, *cols) -> Column:
    """Vectorized native lambda: ``fn`` receives one pandas Series per input
    column and returns a Series.  The preferred Python path."""
    inputs = _cols(cols)

    @pandas_udf(return_type)
    def udf(*series):
        return fn(*series)

    return udf(*inputs)


def row_lambda(fn: Callable, return_type: str, *cols) -> Column:
    """Per-row native lambda (full CPlusPlusLambda generality): ``fn``
    receives one Python value per input column.  Internally still
    Arrow-batched; only the user function is per-row."""
    inputs = _cols(cols)

    @pandas_udf(return_type)
    def udf(*series):
        import pandas as pd

        if len(series) == 1:
            return series[0].map(fn)
        return pd.Series(
            [fn(*vals) for vals in zip(*(s.tolist() for s in series))],
            index=series[0].index,
        )

    return udf(*inputs)


class MergeState:
    """Convenience base for ``operator+`` aggregation states (the
    reference's Avg/SumResult/TopKQueue pattern — e.g.
    reference src/builtInPDBObjects/headers/Avg.h:11-35).  Subclasses
    implement ``from_row``, ``__add__``, and ``finish``."""

    @classmethod
    def from_row(cls, row: dict) -> "MergeState":
        raise NotImplementedError

    def __add__(self, other: "MergeState") -> "MergeState":
        raise NotImplementedError

    def finish(self) -> dict:
        raise NotImplementedError


def grouped_udaf(
    df: DataFrame,
    key_cols: list[str],
    state: type[MergeState],
    out_schema: str,
) -> DataFrame:
    """AggregateComp with an arbitrary merge state: rows of each key group
    are folded through ``state.from_row`` / ``__add__`` and emitted by
    ``finish`` — exact ``ClusterAggregateComp`` semantics.

    One shuffle on ``key_cols``.  Unlike built-in aggs there is no map-side
    combine (Spark groups whole partitions per key before Python sees them);
    for decomposable states prefer native aggregate expressions, this is the
    parity path for truly opaque ``operator+`` logic."""

    def run(pdf):
        import pandas as pd

        rows = pdf.to_dict("records")
        acc = state.from_row(rows[0])
        for r in rows[1:]:
            acc = acc + state.from_row(r)
        out = {k: rows[0][k] for k in key_cols}
        out.update(acc.finish())
        return pd.DataFrame([out])

    return df.groupBy(*key_cols).applyInPandas(run, schema=out_schema)
