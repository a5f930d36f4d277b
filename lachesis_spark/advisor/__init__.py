"""Self-learning data-placement advisor — the Lachesis headline feature.

The reference records every job's TCAP, lambdas, and runtime into an
embedded SQLite history DB (reference
src/selfLearning/source/SelfLearningDB.cc:109-148) and, at data-load time,
picks the partitioning lambda a dataset should be pre-partitioned with
(rule-based: src/selfLearning/headers/
RuleBasedDataPlacementOptimizerForLoadJob.h:15-53).

Here the same loop is: :class:`HistoryDB` (SQLite) ← key usages captured
from executed Computation graphs → :func:`recommend` picks the bucketing
key by runtime-weighted frequency → ``Catalog.write_set(bucket_by=...)``
applies it, and Spark's bucketed-scan machinery turns later shuffles on that
key into partition-local work (the reference's LocalJoin).
"""

from lachesis_spark.advisor.apply import (  # noqa: F401
    AppliedAction,
    apply_all,
    apply_report,
    apply_salting_hint,
    hinted_join,
    read_hints,
    rewrite_layout,
    write_hints,
)
from lachesis_spark.advisor.bandit import (  # noqa: F401
    BanditPlacementOptimizer,
    LinUCBPlacementOptimizer,
    PlacementContext,
    arbitrate_by_reward,
    candidate_id,
    measure_key_cardinality,
)
from lachesis_spark.advisor.history import (  # noqa: F401
    HistoryDB,
    KeyStat,
    KeyUsage,
    ScanStat,
)
from lachesis_spark.advisor.recommender import (  # noqa: F401
    FileSizeRecommendation,
    LayoutRecommendation,
    PlacementReport,
    Recommendation,
    SaltingRecommendation,
    advise,
    advise_all,
    capture_usages,
    capture_usages_from_plan,
    key_stat_for,
    layout_candidates,
    recommend,
    recommend_all,
    recommend_file_size,
    recommend_layout,
    recommend_salting,
    run_and_record,
    scan_stat_for_set,
)
