"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator/query from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql()`` provides the DuckDB-equivalent SQL for the hash-compare
correctness gate.  Implementation lives in the ``lachesis_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lachesis_spark.registry import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q03 3-table join + agg + top-k) on sf0.001."""
    return QUERIES["tpch_q03"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
