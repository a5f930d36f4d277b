"""The Computation operator algebra (SURVEY.md §2.1).

Functional, composable DataFrame transformations with the same observable
semantics as the reference's ``Computation`` subclass DSL
(reference src/lambdas/headers/Computation.h:156-191).
"""

from lachesis_spark.operators.core import (  # noqa: F401
    aggregate,
    count_all,
    join,
    multi_selection,
    partition,
    selection,
    top_k,
    top_k_per_group,
)
from lachesis_spark.operators.graph import (  # noqa: F401
    AggregateComp,
    Computation,
    JoinComp,
    MultiSelectionComp,
    PartitionComp,
    ScanSet,
    SelectionComp,
    TopKComp,
    WriteSet,
    execute_computations,
)
