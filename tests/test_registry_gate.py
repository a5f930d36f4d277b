"""Gate-window curation invariants.

The driver's correctness gate checks the FIRST 50 registry entries; the
curation promise (registry.py) is that those 50 carry at least one
oracle-gated representative of EVERY subsystem, so a growing registry can
never silently exile a subsystem from the driver's check.  This test
enforces it module-by-module — a new module with queries() entries must
claim a gate seat (or consciously amend this test saying why not).

Round-9 rotation rationale (verdict task 6): the round-8 production forms
took gate seats from entries whose subsystem keeps another representative —
`la_dsl_inverse` in for `la_dsl_gram_rowsum` (la_gram keeps the Gram plan;
the DSL front-end is still gate-exercised, now through its hardest op),
`stream_late_data` in for `stream_tumbling` (win_tumbling keeps the
tumbling-window seat; the stream seat now exercises real watermark
drop/keep semantics), and `ds_zonemap_box` in for `ds_scan_pushdown`
(every gated query scans parquet; multi-dim Z-order pruning is the
layout feature worth gating).  All rotated-out entries stay in the
strict sweep.
"""

from __future__ import annotations

from lachesis_spark import registry as R
from lachesis_spark.llm import (
    dedup,
    multimodal,
    sampling,
    scrub,
    search,
    similarity,
    textstats,
    training,
)
from lachesis_spark.plans import (
    events,
    graph_algos,
    itemsets,
    iterative,
    la,
    la_dsl,
    matview,
    ops_queries,
    profile,
    reddit,
    sketches,
    tpch,
)
from lachesis_spark.sources import lachesis_source
from lachesis_spark.streaming import stream, windows

MODULES = {
    "tpch": tpch,
    "ops_queries": ops_queries,
    "la": la,
    "la_dsl": la_dsl,
    "dedup": dedup,
    "similarity": similarity,
    "textstats": textstats,
    "windows": windows,
    "stream": stream,
    "iterative": iterative,
    "graph_algos": graph_algos,
    "matview": matview,
    "reddit": reddit,
    "multimodal": multimodal,
    "sampling": sampling,
    "scrub": scrub,
    "search": search,
    "lachesis_source": lachesis_source,
    "training": training,
    # round 7 (cont.): these four claimed gate seats when added
    "events": events,
    "sketches": sketches,
    "profile": profile,
    "itemsets": itemsets,
}


def test_gate_window_is_first_50_in_insertion_order():
    assert len(R._PRIORITY) == 50
    assert list(R.QUERIES)[:50] == R._PRIORITY


# Round-10 rotation rationale (verdict task 3): `stream_outer_join` in for
# `win_tumbling`.  The left-outer stream-stream interval join (round 9's
# newest stateful-streaming semantics — NULL emission driven by state
# EVICTION, not data) had no gate seat; tumbling-window EVENT-TIME semantics
# remain gate-exercised twice over without win_tumbling's seat:
# `stream_late_data` is itself watermarked TUMBLING counts (same window
# grouping, plus watermark drop/keep), and `evt_funnel` holds the event-time
# sequence seat.  win_tumbling stays oracle-checked in the strict sweep.
# The per-module invariant below encodes this as an explicit PROXY: a module
# may cede its seat only to a named gate entry that exercises the same
# semantics — never silently.
GATE_PROXIES = {
    # module -> gate entries that exercise its core semantics
    "windows": {"stream_late_data", "evt_funnel"},
}


def test_every_subsystem_keeps_a_gate_representative():
    gate = set(R._PRIORITY)
    missing = {
        name
        for name, mod in MODULES.items()
        if mod.QUERIES
        and not (set(mod.QUERIES) & gate)
        and not (GATE_PROXIES.get(name, set()) & gate)
    }
    assert not missing, (
        f"subsystems with no gate representative: {sorted(missing)} — "
        "displace a redundant entry in registry._PRIORITY"
    )


def test_registry_covers_every_module_query():
    """No module query is silently dropped from the registry (e.g. by a
    name collision between modules)."""
    all_names = set()
    for mod in MODULES.values():
        dup = all_names & set(mod.QUERIES)
        assert not dup, f"query name collision across modules: {sorted(dup)}"
        all_names |= set(mod.QUERIES)
    assert all_names == set(R.QUERIES)


def test_gate_entries_all_oracled():
    assert all(k in R.ORACLE for k in R._PRIORITY)
