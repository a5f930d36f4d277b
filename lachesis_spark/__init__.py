"""lachesis_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of asu-cactus/lachesis (Lachesis++/PlinyCompute).

The reference is a ~130k-LoC C++ distributed object-analytics engine with a
UDF-centric Computation DSL (scan / selection / multi-selection / join /
aggregate / partition / top-k / write — reference
src/lambdas/headers/Computation.h:156-191).  This package re-expresses that
algebra Spark-first: every operator is declared through the DataFrame/SQL API
so Catalyst + Tungsten + AQE supply the optimization and distributed physical
execution that the reference hand-rolls (TCAP planning, pipelining, shuffle,
combiners — reference src/queryPlanning/, src/queryExecution/).

Layout
------
- ``session``    : SparkSession factory tuned for both local test runs and
                   large-cluster deployment (AQE, broadcast thresholds).
- ``catalog``    : database/set management mirroring PDBClient
                   (reference src/mainClient/headers/PDBClient.h:76-138).
- ``operators``  : the Computation algebra (SURVEY.md §2.1) as composable
                   DataFrame transformations.
- ``functions``  : scalar/lambda helpers — the native-lambda escape hatch
                   (reference src/lambdas/headers/CPlusPlusLambda.h:240) as
                   pandas UDFs, plus text/vector function libraries.
- ``plans``      : workload libraries — TPC-H suite, linear algebra
                   (reference src/tpch/, src/linearAlgebraDSL/).
- ``llm``        : beyond-reference large-scale training-data pipeline ops
                   (dedup, similarity search, text analysis, multimodal).
- ``streaming``  : Structured Streaming surface over the events table.
- ``advisor``    : the Lachesis self-learning data-placement analog —
                   workload history + partitioning advisor (rule-based and
                   bandit policies; reference src/selfLearning/).
- ``sources``    : schema-explicit JSON/CSV/parquet connectors with
                   corrupt-record quarantine (reference src/reddit/ loaders,
                   src/tpch/source/tpchDataLoader.cc).
"""

__version__ = "0.1.0"

from lachesis_spark.session import get_spark  # noqa: F401
