"""Session-level base-table binding: name -> DataFrame resolution.

Every query module loads its base tables (the ten TESTDATA.md tables)
through :func:`base_table`; by default that is a plain parquet read of
``<sf_dir>/<name>.parquet``.  :func:`bound` temporarily installs a
RESOLVER — e.g. one that routes names to advisor-placed catalog sets —
so the UNMODIFIED workload can run against re-placed data.

This is the Spark analog of the reference dispatcher resolving a
query's set scans against whatever physical layout its self-learning
placement chose for the database (reference
src/serverFunctionalities/source/DispatcherServer.cc — queries name
sets, the dispatcher binds them to placed partitions): queries name
TABLES; the binding decides which physical incarnation serves them.
Correctness contract: a resolver must return the SAME ROWS the default
read would (a re-layout, never a re-derivation); returning ``None``
falls through to the default read, so a resolver only needs to cover
the tables it actually re-placed.

Thread-safety: the binding is process-global and intended for the
driver-side single-threaded orchestration path (bench/advisor tools);
nest :func:`bound` blocks rather than sharing across threads.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

Resolver = Callable[[SparkSession, str, str], Optional[DataFrame]]

_RESOLVER: Optional[Resolver] = None


def base_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load base table ``name`` for the dataset rooted at ``sf_dir``:
    through the installed resolver when one is bound (and it covers the
    table), else the plain parquet read."""
    if _RESOLVER is not None:
        df = _RESOLVER(spark, sf_dir, name)
        if df is not None:
            return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


@contextmanager
def bound(resolver: Resolver) -> Iterator[None]:
    """Install ``resolver`` for the duration of the block (restores the
    previous binding on exit, so blocks nest)."""
    global _RESOLVER
    prev = _RESOLVER
    _RESOLVER = resolver
    try:
        yield
    finally:
        _RESOLVER = prev


def catalog_resolver(cat, db: str, placed: dict[str, str]) -> Resolver:
    """A resolver routing table names to :class:`~lachesis_spark.catalog.
    Catalog` sets: ``placed`` maps base-table name -> set name in ``db``.
    Reads go through ``cat.read_set`` (table-identity reads, so bucket
    metadata survives and bucketed joins plan exchange-free)."""

    def resolve(spark: SparkSession, sf_dir: str, name: str):
        set_name = placed.get(name)
        if set_name is None:
            return None
        return cat.read_set(db, set_name)

    return resolve
