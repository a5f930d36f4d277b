"""Computation-graph API — the reference's user-facing DSL shape.

The reference wires ``Computation`` subclasses with ``setInput(i, prev)`` and
submits the sink via ``executeComputations``
(reference src/lambdas/headers/Computation.h:156-191,
src/mainClient/headers/PDBClient.h:206-211).  This module reproduces that
wiring for users who want the graph style; each node lowers to the functional
algebra in :mod:`lachesis_spark.operators.core`, so both styles produce the
same Catalyst plan.

The reference's TCAP IR (sink-to-source ``toTCAPString`` walk,
src/queryPlanning/source/QueryGraphAnalyzer.cc:25-49) is deliberately NOT
ported — the Catalyst logical plan *is* the IR; ``explain()`` on any node
dumps it for debugging.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from lachesis_spark.operators import core


class Computation:
    """Base node: inputs wired by position, lazily lowered to a DataFrame."""

    def __init__(self, n_inputs: int):
        self.inputs: list[Computation | None] = [None] * n_inputs

    def set_input(self, which: int, node: "Computation") -> "Computation":
        self.inputs[which] = node
        return self

    def _lower(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def to_df(self, spark: SparkSession) -> DataFrame:
        for i, node in enumerate(self.inputs):
            if node is None:
                raise ValueError(f"{type(self).__name__}: input {i} not wired")
        return self._lower(spark)

    def explain(self, spark: SparkSession, mode: str = "formatted") -> None:
        self.to_df(spark).explain(mode)


class ScanSet(Computation):
    """ScanUserSet (reference src/builtInPDBObjects/headers/ScanUserSet.h:23)."""

    def __init__(self, catalog, db: str, set_name: str):
        super().__init__(0)
        self.catalog, self.db, self.set_name = catalog, db, set_name

    def _lower(self, spark):
        return self.catalog.read_set(self.db, self.set_name)


class DataFrameSource(Computation):
    """Adapter so an arbitrary DataFrame can feed a graph."""

    def __init__(self, df: DataFrame):
        super().__init__(0)
        self.df = df

    def _lower(self, spark):
        return self.df


class SelectionComp(Computation):
    def __init__(self, pred: Column | None = None, proj: Sequence[Column] | None = None):
        super().__init__(1)
        self.pred, self.proj = pred, proj

    def _lower(self, spark):
        return core.selection(self.inputs[0].to_df(spark), self.pred, self.proj)


class MultiSelectionComp(Computation):
    def __init__(self, pred, flat_proj, extra_cols=None, out_name: str = "item"):
        super().__init__(1)
        self.pred, self.flat_proj = pred, flat_proj
        self.extra_cols, self.out_name = extra_cols, out_name

    def _lower(self, spark):
        return core.multi_selection(
            self.inputs[0].to_df(spark), self.pred, self.flat_proj,
            self.extra_cols, self.out_name,
        )


class AggregateComp(Computation):
    def __init__(self, key, values: Sequence[Column]):
        super().__init__(1)
        self.key, self.values = key, values

    def _lower(self, spark):
        return core.aggregate(self.inputs[0].to_df(spark), self.key, self.values)


class JoinComp(Computation):
    """Variadic inner join (reference src/lambdas/headers/JoinComp.h:43)."""

    def __init__(self, n_inputs: int, equi, theta=None, projection=None):
        super().__init__(n_inputs)
        self.equi, self.theta, self.projection = equi, theta, projection

    def _lower(self, spark):
        dfs = [node.to_df(spark) for node in self.inputs]
        return core.join(dfs, self.equi, self.theta, self.projection)


class PartitionComp(Computation):
    def __init__(self, key, num_partitions: int | None = None):
        super().__init__(1)
        self.key, self.num_partitions = key, num_partitions

    def _lower(self, spark):
        return core.partition(self.inputs[0].to_df(spark), self.key, self.num_partitions)


class TopKComp(Computation):
    def __init__(self, k: int, score, ascending: bool = False, tiebreak=None):
        super().__init__(1)
        self.k, self.score, self.ascending, self.tiebreak = k, score, ascending, tiebreak

    def _lower(self, spark):
        return core.top_k(self.inputs[0].to_df(spark), self.k, self.score,
                          self.ascending, self.tiebreak)


class WriteSet(Computation):
    """WriteUserSet sink (reference WriteUserSet.h:18); materializes on
    execute."""

    def __init__(self, catalog, db: str, set_name: str):
        super().__init__(1)
        self.catalog, self.db, self.set_name = catalog, db, set_name

    def _lower(self, spark):
        return self.inputs[0].to_df(spark)


def execute_computations(spark: SparkSession, *sinks: Computation) -> list[DataFrame]:
    """PDBClient.executeComputations analog (reference PDBClient.h:206-211).

    For WriteSet sinks the result is persisted to the catalog and re-read
    (so downstream consumers scan the materialized set, as in the reference);
    other sinks just return their lazy DataFrame.
    """
    out = []
    for sink in sinks:
        df = sink.to_df(spark)
        if isinstance(sink, WriteSet):
            sink.catalog.write_set(df, sink.db, sink.set_name)
            df = sink.catalog.read_set(sink.db, sink.set_name)
        out.append(df)
    return out
