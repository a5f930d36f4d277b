"""Event-time windowed analytics over the ``events`` table.

The reference has **no streaming at all** (SURVEY.md §2.8) — this module is
beyond-reference surface: tumbling / sliding / session windows as batch
DataFrame queries (DuckDB-oracle'd) and the same logic as Structured
Streaming jobs with watermarks and custom Pandas state
(:mod:`lachesis_spark.streaming.stream`).
"""

from lachesis_spark.streaming.windows import QUERIES, ORACLE  # noqa: F401
