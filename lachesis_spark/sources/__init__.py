"""Source / sink connectors (schema-explicit readers and writers).

The reference ingests external data through hand-written C++ parsers — e.g.
the Reddit JSON comment loader (reference src/reddit/headers/RedditComment.h)
and the TPC-H '|'-delimited loader (src/tpch/source/tpchDataLoader.cc).
Here the same surface is Spark's native parquet/JSON/CSV readers with
explicit schemas (never runtime inference in production paths — at 100 TB
schema inference is an extra full scan).
"""

from lachesis_spark.sources.lachesis_source import (  # noqa: F401
    LachesisDataSource,
    set_layout,
)
from lachesis_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
)
