"""Central registry of all (query, oracle) pairs exposed to the driver.

Every operator claimed done in SURVEY.md §2 has an entry here; queries whose
semantics are not SQL-expressible (streaming, iterative) appear in QUERIES
without an ORACLE entry and get the driver's rows-only check.
"""

from __future__ import annotations

from lachesis_spark.llm import dedup, multimodal, sampling, scrub, similarity, textstats
from lachesis_spark.plans import iterative, la, la_dsl, ops_queries, reddit, tpch
from lachesis_spark.streaming import stream, windows

QUERIES: dict = {}
ORACLE: dict = {}

for _mod in (tpch, ops_queries, la, dedup, similarity, textstats, windows, stream, iterative, reddit, multimodal, la_dsl, sampling, scrub):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)


def _register(queries: dict, oracle: dict) -> None:
    QUERIES.update(queries)
    ORACLE.update(oracle)
