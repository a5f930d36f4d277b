"""Rule-based data-placement recommender + Computation-graph usage capture.

Reference: RuleBasedDataPlacementOptimizerForLoadJob
(reference src/selfLearning/headers/
RuleBasedDataPlacementOptimizerForLoadJob.h:15-53) — at load time, choose
the partitioning lambda of the dataset's historically most expensive
consumers.  The DRL variant (DRLBasedDataPlacementOptimizerForLoadJob.h)
optimizes the same decision; the rule-based policy is what we implement —
the decision surface (which key to pre-partition on) is identical.

Applying a recommendation = ``Catalog.write_set(bucket_by=(n, cols))``.
Spark then plans joins/aggs on that key without an Exchange on the bucketed
side — the reference's LocalJoin
(reference src/lambdas/headers/JoinTuple.h:14-22) realized by the built-in
bucketed scan instead of a custom storage manager.
"""

from __future__ import annotations

import math
import re
import time
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, SparkSession

from lachesis_spark.advisor.history import HistoryDB, KeyStat, KeyUsage, ScanStat
from lachesis_spark.operators import graph as G

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _key_names(key) -> tuple[str, ...] | None:
    """Normalize an operator's key spec to column names; opaque expressions
    (real lambdas) return None and are not recorded — same as the reference,
    which only learns placements for hashable attribute lambdas."""
    if key is None:
        return None
    if isinstance(key, (str, Column)):
        key = [key]
    names = []
    for k in key:
        if isinstance(k, Column):
            k = k._jc.toString()
        if not isinstance(k, str) or not _IDENT.match(k):
            return None
        names.append(k)
    return tuple(names) if names else None


def _source_dataset(node) -> str | None:
    """Nearest upstream stored set of a unary chain (dataset identity)."""
    while node is not None:
        if isinstance(node, G.ScanSet):
            return f"{node.db}.{node.set_name}"
        if not node.inputs:
            return None
        node = node.inputs[0]
    return None


def capture_usages(*sinks) -> list[KeyUsage]:
    """Walk Computation graphs sink-to-source (the reference records the
    same facts while emitting TCAP — QuerySchedulerServer.cc:999-1017) and
    collect (dataset, op, key) observations."""
    usages: list[KeyUsage] = []
    seen: set[int] = set()

    def walk(node):
        if node is None or id(node) in seen:
            return
        seen.add(id(node))
        if isinstance(node, G.AggregateComp):
            keys = _key_names(node.key)
            ds = _source_dataset(node.inputs[0])
            if keys and ds:
                usages.append(KeyUsage(ds, "aggregate", keys))
        elif isinstance(node, G.PartitionComp):
            keys = _key_names(node.key)
            ds = _source_dataset(node.inputs[0])
            if keys and ds:
                usages.append(KeyUsage(ds, "partition", keys))
        elif isinstance(node, G.JoinComp):
            # string equi-specs name the same column on both sides — record
            # the usage against every joined input's source set
            for i, equi in enumerate(node.equi or []):
                keys = _key_names(equi)
                if not keys:
                    continue
                for side in (node.inputs[0], node.inputs[i + 1]):
                    ds = _source_dataset(side)
                    if ds:
                        usages.append(KeyUsage(ds, "join", keys))
        for child in node.inputs:
            walk(child)

    for sink in sinks:
        walk(sink)
    return usages


_SCAN_RE = re.compile(
    r"FileScan \w+ \[([^\]]*)\].*?Location: \w+(?:\(\d+ paths?\))?\[([^\]]+)\]"
)
_EXCHANGE_RE = re.compile(r"Exchange hashpartitioning\(([^)]*)\)")
# Equi-join key-list operators.  BroadcastHashJoin is included on purpose:
# which keys two tables JOIN on is a logical fact independent of the
# physical strategy, and at bench scale Spark broadcasts joins that a
# 100 TB deployment would sort-merge — recording only SMJ would leave the
# co-partitioning advisor blind exactly where it learns.
_SMJ_RE = re.compile(
    r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\w*\s+"
    r"(?:\w+\s+)?\[([^\]]*)\], \[([^\]]*)\]"
)
_ATTR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#(\d+)")
_LOC_RE = re.compile(r"Location: \w+(?:\(\d+ paths?\))?\[([^\]]+)\]")
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")
_FILTER_COL_RE = re.compile(
    r"(?:EqualTo|GreaterThan(?:OrEqual)?|LessThan(?:OrEqual)?|In|String\w+)"
    r"\(([A-Za-z_][A-Za-z0-9_]*)"
)


def capture_usages_from_plan(df) -> list[KeyUsage]:
    """Plan-level usage capture for arbitrary DataFrame queries (no graph
    API needed): map scan output attributes (name#exprId) to their source
    files, then attribute every shuffle ``Exchange hashpartitioning`` key
    back to the table it came from.  This is the fully-general form of the
    reference's TCAP-time recording — any query Spark runs can feed the
    placement history."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    attr_to_table: dict[str, str] = {}
    for cols, loc in _SCAN_RE.findall(plan):
        table = loc.rsplit("/", 1)[-1].split(".")[0]
        for name, eid in _ATTR_RE.findall(cols):
            attr_to_table[eid] = table
    usages: set[KeyUsage] = set()
    for keys in _EXCHANGE_RE.findall(plan):
        by_table: dict[str, list[str]] = {}
        for name, eid in _ATTR_RE.findall(keys):
            table = attr_to_table.get(eid)
            if table:
                by_table.setdefault(table, []).append(name)
        for table, cols in by_table.items():
            usages.add(KeyUsage(table, "shuffle", tuple(sorted(set(cols)))))
    # shuffle-join PAIRS (SortMergeJoin / ShuffledHashJoin key lists): the
    # co-partitioning signal 'shuffle' rows cannot carry — a job with three
    # shuffles says nothing about WHICH two meet in a join, and a partner
    # pin on the wrong key buys no Exchange elision.  Encoded as
    # dataset "left>right", key "lcols>rcols" (single element, so the
    # key_text sort normalization cannot scramble the sides).
    for lk, rk in _SMJ_RE.findall(plan):
        def _side(keys: str):
            tabs, cols = set(), []
            for name, eid in _ATTR_RE.findall(keys):
                t = attr_to_table.get(eid)
                if t:
                    tabs.add(t)
                    cols.append(name)
            return (tabs.pop(), tuple(sorted(set(cols)))) if len(tabs) == 1 else None
        left, right = _side(lk), _side(rk)
        if left and right and left[0] != right[0]:
            usages.add(
                KeyUsage(
                    f"{left[0]}>{right[0]}",
                    "joinpair",
                    (f"{','.join(left[1])}>{','.join(right[1])}",),
                )
            )
    # scan-filter columns (per pushed selective predicate, one usage per
    # column): the data-skipping signal — IsNotNull is implied by every
    # join/agg and carries no layout information, so it is skipped
    for line in plan.splitlines():
        if "FileScan" not in line:
            continue
        loc = _LOC_RE.search(line)
        pushed = _PUSHED_RE.search(line)
        if not loc or not pushed:
            continue
        table = loc.group(1).rsplit("/", 1)[-1].split(".")[0]
        for col in _FILTER_COL_RE.findall(pushed.group(1)):
            usages.add(KeyUsage(table, "filter", (col,)))
    return sorted(usages, key=lambda u: (u.dataset, u.op, u.key_text))


def run_and_record(
    history: HistoryDB, name: str, spark: SparkSession, *sinks
) -> list:
    """executeComputations + history capture — the instrumented submit path
    (the reference hooks the same point: QuerySchedulerServer.cc:999-1017)."""
    t0 = time.perf_counter()
    out = G.execute_computations(spark, *sinks)
    for df in out:
        df.count()  # force execution so the recorded runtime is real
    history.record_job(name, time.perf_counter() - t0, capture_usages(*sinks))
    return out


@dataclass(frozen=True)
class Recommendation:
    dataset: str
    key_cols: tuple[str, ...]
    weight: float  # total historical runtime behind this key
    n_buckets: int

    def as_bucket_by(self) -> tuple[int, list[str]]:
        return (self.n_buckets, list(self.key_cols))


def recommend(
    history: HistoryDB,
    dataset: str,
    n_buckets: int = 32,
    min_weight: float = 0.0,
) -> Recommendation | None:
    """Pick the runtime-weighted most valuable pre-partitioning key."""
    weights = history.key_weights(dataset)
    if not weights:
        return None
    key_text, weight = max(weights.items(), key=lambda kv: (kv[1], kv[0]))
    if weight < min_weight:
        return None
    return Recommendation(dataset, tuple(key_text.split(",")), weight, n_buckets)


def recommend_all(history: HistoryDB, n_buckets: int = 32) -> list[Recommendation]:
    recs = (recommend(history, ds, n_buckets) for ds in history.datasets())
    return [r for r in recs if r is not None]


@dataclass(frozen=True)
class LayoutRecommendation:
    """A full physical-layout decision for one dataset.

    ``range_cols`` is only set for the hybrid ``bucket_range_grid`` kind:
    hash-bucket on ``key_cols`` (the join/shuffle dimension) while each
    write task holds one range slice of ``range_cols`` (the filter
    dimension), so every output file is simultaneously a joinable bucket
    AND tight in the filter column — one layout serving both sides of a
    contested workload."""

    dataset: str
    kind: str  # 'bucket_by' | 'zorder' | 'range_zonemap' | 'bucket_range_grid' | 'keep_flat'
    key_cols: tuple[str, ...]
    weight: float
    range_cols: tuple[str, ...] = ()


@dataclass(frozen=True)
class FileSizeRecommendation:
    """The page-size dimension of placement: a per-dataset target file size.

    The reference's load-time optimizer picks the partition lambda AND the
    page size (reference
    src/selfLearning/headers/RuleBasedDataPlacementOptimizerForLoadJob.h:15);
    Spark's analog of page size is the parquet file target — it bounds scan
    task granularity exactly as the reference's page size bounds its worker
    read unit.  Apply with ``Catalog.compact_set(db, name,
    target_file_bytes=rec.target_file_bytes)``.
    """

    dataset: str
    target_file_bytes: int
    n_files_now: int
    n_files_target: int
    reason: str  # 'fragmented' | 'coarse'


MIN_FILE_BYTES = 64 * 1024 * 1024
MAX_FILE_BYTES = 1024 * 1024 * 1024


def recommend_file_size(
    history: HistoryDB,
    dataset: str,
    cores: int = 32,
    min_file_bytes: int = MIN_FILE_BYTES,
    max_file_bytes: int = MAX_FILE_BYTES,
) -> FileSizeRecommendation | None:
    """Pick a target file size from the observed physical shape.

    Rule: a scanned dataset should split into enough files to feed every
    core (``cores``; at 100 TB, the cluster's total cores) but no file
    should leave [min, max] bytes — below min, per-file open/footer/listing
    overhead dominates; above max, a single task owns too much data and the
    stage's tail is one straggler.  Recommend only when the observed layout
    is off by >2x in either direction (recommendation stability: don't
    churn a layout that is roughly right)."""
    prof = history.scan_profile(dataset)
    if prof is None:
        return None
    n_files, total_bytes, _weight = prof
    if n_files <= 0 or total_bytes <= 0:
        return None
    # ideal file count: one per core, unless that pushes files outside the
    # [min, max] size band — the band wins (clamp order matters: a tiny
    # table never splits below min_file_bytes just to reach `cores` files)
    n_target = max(1, min(cores, total_bytes // min_file_bytes))
    n_target = max(n_target, -(-total_bytes // max_file_bytes))  # ceil
    target = max(min_file_bytes, min(max_file_bytes, -(-total_bytes // n_target)))
    avg = total_bytes / n_files
    if n_files > 2 * n_target and avg < target / 2:
        return FileSizeRecommendation(
            dataset, target, n_files, n_target, "fragmented"
        )
    # coarse side mirrors the fragmented side: measured against the computed
    # target with the same 2x stability factor (avg > 2*max_file_bytes would
    # miss layouts whose every file exceeds the band ceiling by up to 2x)
    if avg > 2 * target:
        return FileSizeRecommendation(dataset, target, n_files, n_target, "coarse")
    return None


def scan_stat_for_set(catalog, db: str, name: str) -> ScanStat:
    """Measure a stored set's physical shape (file count + bytes) for
    history recording — the load-time observation the reference's
    self-learning DB keeps per stored set."""
    import os as _os

    path = catalog.set_path(db, name)
    n, size = 0, 0
    for root, _dirs, files in _os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += _os.path.getsize(_os.path.join(root, f))
    return ScanStat(f"{db}.{name}", n, size)


def key_stat_for(df, dataset: str, key_cols: Sequence[str]) -> KeyStat:
    """Measure one key's frequency profile for history recording — one
    groupBy + one 3-number aggregation (the same load-time observation
    surface as scan_stat_for_set; the reference's self-learning DB records
    per-set stats at dispatch the same way)."""
    from pyspark.sql import functions as F

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    row = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    ).collect()[0]
    return KeyStat(
        dataset,
        tuple(key_cols),
        int(row["n_rows"] or 0),
        int(row["n_distinct"] or 0),
        int(row["top_cnt"] or 0),
    )


@dataclass(frozen=True)
class SaltingRecommendation:
    """Salt this dataset's join on ``key_cols`` with ``n_salts`` salts.

    Emitted when the hottest key value alone exceeds ``threshold``× a fair
    partition share — the shape where the shuffle join stragglers on one
    task and AQE's skew split can't always help (skewed aggregation feeding
    the join, bucketed layouts AQE won't re-shuffle; the measured 2.25×
    salted-vs-straggler demo in SCALE.md is exactly this shape).  Apply
    with ``operators.core.salted_join(..., n_salts=rec.n_salts)``.
    """

    dataset: str
    key_cols: tuple[str, ...]
    n_salts: int
    top_share: float

    @property
    def key_text(self) -> str:
        return ",".join(sorted(self.key_cols))


def recommend_salting(
    history: HistoryDB,
    dataset: str,
    shuffle_partitions: int = 32,
    threshold: float = 2.0,
) -> SaltingRecommendation | None:
    """Pick the most skewed recorded key whose hottest value breaks the
    fair-share threshold; size n_salts to spread that one value across the
    stage.

    A uniform shuffle gives each of P partitions 1/P of the rows; a key
    value owning ``top_share`` of the rows makes one partition
    ``top_share·P``× fair share.  Salt when that factor exceeds
    ``threshold`` (2× = the same stability factor the file-size rule
    uses), with ``n_salts = ceil(2·top_share·P)`` clamped to [2, P]: the
    salted partitions still carry their ordinary share of the other keys,
    so spreading the hot value to exactly fair share would leave them at
    ~2× fair — spread it to HALF fair share so hot-slice + base load ≈
    fair (measured in the skew demo: the half-fair sizing recovers the
    full hand-tuned salting win; the exact-fair sizing left a third of it
    on the table).  Never more salts than the stage has partitions."""
    best: SaltingRecommendation | None = None
    for st in history.key_profiles(dataset):
        factor = st.top_share * shuffle_partitions
        if factor < threshold:
            continue
        n_salts = max(2, min(shuffle_partitions, math.ceil(2 * factor)))
        rec = SaltingRecommendation(dataset, st.key_cols, n_salts, st.top_share)
        if best is None or rec.top_share > best.top_share:
            best = rec
    return best


@dataclass(frozen=True)
class PlacementReport:
    """Every placement decision the advisor can make for one dataset, in
    one call — the full analog of the reference's load-time optimizer
    output (partition lambda + page size,
    RuleBasedDataPlacementOptimizerForLoadJob.h:15), extended with the two
    dimensions the reference lacked (data-skipping layout, skew salting).

    Apply: ``layout`` via ``Catalog.write_set(bucket_by=...)`` or
    ``sources.layout.zorder``; ``file_size`` via ``Catalog.compact_set``;
    ``salting`` at query time via ``core.salted_join``.
    """

    dataset: str
    layout: LayoutRecommendation | None
    file_size: FileSizeRecommendation | None
    salting: SaltingRecommendation | None

    def is_empty(self) -> bool:
        return self.layout is None and self.file_size is None and self.salting is None


def advise(
    history: HistoryDB,
    dataset: str,
    n_buckets: int = 32,
    cores: int = 32,
    shuffle_partitions: int = 32,
    arbiter=None,
) -> PlacementReport:
    """One-call placement report for a dataset from its recorded history.

    ``arbiter`` (optional) is a callable ``(dataset, candidates) ->
    LayoutRecommendation | None`` consulted ONLY when
    :func:`layout_candidates` finds the layout contested (material runtime
    on both the filter and shuffle dimensions).  It is expected to measure
    the candidates on real data and answer with the payoff-maximizing one
    (see ``bandit.arbitrate_by_reward``); ``None`` means "can't measure
    this dataset here" and keeps the rule's choice."""
    layout = recommend_layout(history, dataset, n_buckets)
    if arbiter is not None:
        cands = layout_candidates(history, dataset, n_buckets)
        if len(cands) > 1:
            chosen = arbiter(dataset, cands)
            if chosen is not None:
                layout = chosen
    return PlacementReport(
        dataset,
        layout,
        recommend_file_size(history, dataset, cores),
        recommend_salting(history, dataset, shuffle_partitions),
    )


def advise_all(history: HistoryDB, **kw) -> list[PlacementReport]:
    """Reports for every dataset the history has observed (key usages or
    frequency profiles), non-empty ones only.  Accepts ``arbiter=`` (see
    :func:`advise`) for measured-reward arbitration of contested layouts."""
    seen = set(history.datasets())
    seen.update(
        r[0]
        for r in history.con.execute("SELECT DISTINCT dataset FROM key_stats")
    )
    # scan-stats-only datasets (recorded shape, no key usage yet) still get
    # the file-size dimension — a fragmented microbatch sink is exactly the
    # set that has no join/agg history of its own
    seen.update(
        r[0]
        for r in history.con.execute("SELECT DISTINCT dataset FROM scan_stats")
    )
    out = [advise(history, ds, **kw) for ds in sorted(seen)]
    return [r for r in out if not r.is_empty()]


def recommend_layout(
    history: HistoryDB, dataset: str, n_buckets: int = 32
) -> LayoutRecommendation | None:
    """Extend the bucket-key rule with the data-skipping dimensions the
    reference never had:

    - scans filter on TWO OR MORE columns whose combined runtime outweighs
      the best shuffle key → no single sort key serves the workload —
      Z-order the top filter columns (sources.layout.zorder);
    - scans filter on ONE dominant column that outweighs the best shuffle
      key → range-cluster on it and record zone maps
      (``write_set(df.repartitionByRange(...), zonemap_by=[col])``): tight
      per-file ranges + planning-time file skipping via
      ``read_set_pruned`` — strictly better than Z-order for the
      single-column workload because range clustering keeps each file's
      span minimal in THE dimension that matters;
    - otherwise the reference's rule: bucket on the runtime-weighted
      dominant shuffle key.
    """
    shuffle = history.key_weights(dataset)
    filters = history.filter_weights(dataset)
    best_shuffle = max(shuffle.values()) if shuffle else 0.0
    ranked = sorted(filters.items(), key=lambda kv: (-kv[1], kv[0]))
    # dominant-single first: a second filter column under 20% of the top
    # one doesn't justify trading away the tight single-dimension ranges
    # (Z-order interleaving widens per-file spans in EVERY dimension)
    if (
        ranked
        and ranked[0][1] > best_shuffle
        and (len(ranked) == 1 or ranked[1][1] < 0.2 * ranked[0][1])
    ):
        col, w = ranked[0]
        return LayoutRecommendation(dataset, "range_zonemap", (col,), w)
    multi = ranked[:2]
    if len(multi) >= 2 and sum(w for _, w in multi) > best_shuffle:
        cols = tuple(sorted(k for k, _ in multi))
        return LayoutRecommendation(
            dataset, "zorder", cols, sum(w for _, w in multi)
        )
    rec = recommend(history, dataset, n_buckets)
    if rec is None:
        return None
    return LayoutRecommendation(dataset, "bucket_by", rec.key_cols, rec.weight)


CONTEST_RATIO = 0.5


def layout_candidates(
    history: HistoryDB, dataset: str, n_buckets: int = 32
) -> list[LayoutRecommendation]:
    """The rule's choice, plus the alternates when the history CONTESTS it.

    A dataset is contested when the workload puts material runtime behind
    BOTH layout dimensions — the filter side (data skipping wants
    range/Z-order clustering) and the shuffle side (joins/aggs want a
    bucket key) — ``min(filter_w, shuffle_w) >= CONTEST_RATIO *
    max(...)``.  The static rule must then pick one dimension blind; the
    reference resolves exactly this with its payoff-modeled optimizer
    (DRLBasedDataPlacementOptimizerForLoadJob.h) — choose by MEASURED
    reward, not by a fixed precedence.  Returned candidates (rule's choice
    first) feed :func:`lachesis_spark.advisor.bandit.arbitrate_by_reward`:

    - the rule's own pick (filter-favoring on a filter-heavy history);
    - ``bucket_by`` on the dominant shuffle key (join-favoring);
    - ``bucket_range_grid``: hash-bucket the shuffle key while each write
      task holds one range slice of the dominant filter column — files
      are joinable buckets AND tight in the filter dimension, at the cost
      of multi-file buckets (the read-side per-bucket sort is no longer
      elided; whether that trade pays is precisely what the measured
      arbitration decides);
    - ``keep_flat``: the no-op arm — leave the dataset as-is, so a
      rewrite must BEAT doing nothing on measured reward to be applied.

    Uncontested datasets return just the rule's choice (or [] with no
    history) — the arbiter never runs, no measurement cost."""
    rule = recommend_layout(history, dataset, n_buckets)
    if rule is None:
        return []
    shuffle = history.key_weights(dataset)
    filters = history.filter_weights(dataset)
    if not shuffle or not filters:
        return [rule]
    best_shuffle = max(shuffle.values())
    filter_total = sum(
        w for _, w in sorted(filters.items(), key=lambda kv: -kv[1])[:2]
    )
    if min(best_shuffle, filter_total) < CONTEST_RATIO * max(
        best_shuffle, filter_total
    ):
        return [rule]
    bucket = recommend(history, dataset, n_buckets)
    ranked = sorted(filters.items(), key=lambda kv: (-kv[1], kv[0]))
    top_filter = ranked[0][0]
    cands = [rule]
    if bucket is not None and rule.kind != "bucket_by":
        # filter-favoring rule: add the shuffle-favoring alternate
        cands.append(
            LayoutRecommendation(
                dataset, "bucket_by", bucket.key_cols, bucket.weight
            )
        )
    elif rule.kind == "bucket_by":
        # shuffle-favoring rule: add the filter-favoring alternate,
        # mirroring recommend_layout's own single-vs-multi column choice —
        # contested means BOTH dimensions carry material runtime, so both
        # must reach the measured arbiter regardless of which one the
        # blind rule happened to pick.
        if len(ranked) >= 2 and ranked[1][1] >= 0.2 * ranked[0][1]:
            cols = tuple(sorted(k for k, _ in ranked[:2]))
            cands.append(
                LayoutRecommendation(
                    dataset, "zorder", cols, sum(w for _, w in ranked[:2])
                )
            )
        else:
            cands.append(
                LayoutRecommendation(
                    dataset, "range_zonemap", (top_filter,), ranked[0][1]
                )
            )
    if bucket is not None:
        cands.append(
            LayoutRecommendation(
                dataset,
                "bucket_range_grid",
                bucket.key_cols,
                bucket.weight + filters[top_filter],
                range_cols=tuple(top_filter.split(",")),
            )
        )
    # the no-op arm: "do nothing" is a layout decision too, and on a
    # contested dataset it must be PRICED, not assumed — a rewrite whose
    # wins on one family are outweighed by regressions elsewhere (round
    # 10's documents bucket_by: dedup family +19%, agg-only control -2x)
    # should lose the measured arbitration to the flat layout.
    cands.append(LayoutRecommendation(dataset, "keep_flat", (), 0.0))
    return cands


@dataclass(frozen=True)
class JoinStrategyRecommendation:
    """Pick the physical join strategy for (left ⋈ right on key_cols) from
    RECORDED statistics instead of engine defaults: Spark's
    autoBroadcastJoinThreshold sees only logical-plan size estimates (often
    unknown behind a Python DataSource or fresh write), while the history
    DB has the measured on-disk bytes and key NDV from past runs.

    strategy ∈ 'broadcast_left' | 'broadcast_right' | 'bucket_both' |
    'shuffle'.  Apply broadcast_* with :func:`apply_join_strategy`;
    bucket_both via ``Catalog.write_set(bucket_by=...)`` on both sides
    (the advisor's layout apply path) so the join plans no Exchange.
    """

    left: str
    right: str
    key_cols: tuple[str, ...]
    strategy: str
    reason: str


def recommend_join_strategy(
    history: HistoryDB,
    left: str,
    right: str,
    key_cols: Sequence[str],
    broadcast_threshold_bytes: int = 32 << 20,
    n_buckets: int = 32,
) -> JoinStrategyRecommendation:
    """Measured-bytes broadcast rule, then co-partitioning, then shuffle.

    - either side's latest recorded scan bytes under the threshold →
      broadcast that side (prefer the smaller);
    - both sides large with a recorded profile of this key on each and NDV
      ≥ n_buckets on both (buckets would actually spread) → bucket both on
      the key for a persistent exchange-free local join;
    - otherwise plain shuffle join (and AQE takes it from there).
    """
    key = tuple(sorted(key_cols))
    lp, rp = history.scan_profile(left), history.scan_profile(right)
    lb = lp[1] if lp else None
    rb = rp[1] if rp else None
    sides = [(b, s, ds) for b, s, ds in ((lb, "broadcast_left", left), (rb, "broadcast_right", right)) if b is not None]
    small = min(sides, key=lambda t: t[0], default=None)
    if small is not None and small[0] <= broadcast_threshold_bytes:
        return JoinStrategyRecommendation(
            left, right, key, small[1],
            f"{small[2]} measured at {small[0]} bytes <= {broadcast_threshold_bytes}",
        )

    def prof(ds):
        for st in history.key_profiles(ds):
            if tuple(sorted(st.key_cols)) == key:
                return st
        return None

    lk, rk = prof(left), prof(right)
    if lk and rk and min(lk.n_distinct, rk.n_distinct) >= n_buckets:
        return JoinStrategyRecommendation(
            left, right, key, "bucket_both",
            f"both sides large; key NDV {lk.n_distinct}/{rk.n_distinct} >= {n_buckets} buckets",
        )
    return JoinStrategyRecommendation(
        left, right, key, "shuffle", "no side broadcastable; co-partitioning not justified"
    )


def apply_join_strategy(left_df, right_df, on, rec: JoinStrategyRecommendation):
    """Query-time application of a broadcast recommendation (bucket_both is
    a STORAGE decision — apply it through the layout rewrite path)."""
    from pyspark.sql import functions as F

    if rec.strategy == "broadcast_left":
        left_df = F.broadcast(left_df)
    elif rec.strategy == "broadcast_right":
        right_df = F.broadcast(right_df)
    return left_df.join(right_df, on=on, how="inner")
