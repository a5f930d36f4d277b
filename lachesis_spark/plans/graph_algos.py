"""Graph analytics over the events-derived interaction graph: triangle
counting and common-neighbor link prediction.

Companions to PageRank (plans/iterative.py — reference
src/tests/source/PageRank.cc): the reference's graph surface is the
client-driven JoinComp+AggregateComp loop; these are the non-iterative
graph workloads the same join algebra supports, part of the
beyond-reference analytics surface.

Design for 100 TB:

- **Triangle counting uses degree orientation** (the classic
  Schank–Wagner/Cohen MapReduce trick): every undirected edge is directed
  from the endpoint with lower (degree, id) to the higher one.  Each
  triangle is then enumerated exactly once, and — the scale property — the
  out-degree of ANY node under this orientation is O(√m), so the wedge
  join's per-key fan-out is bounded even for power-law hubs: a node with
  10⁶ undirected neighbors contributes wedges only through its ≤O(√m)
  higher-ranked neighbors, not deg² pairs.  The wedge→closing-edge check is
  an equi-join on (x, z), co-partitioned with the oriented edge list.
- **Common-neighbor pairs center the join on the shared neighbor** — one
  self-join of the adjacency list keyed by the center node.  Unlike the
  triangle join, this is inherently deg(center)² per center (that IS the
  output size); the production knob is ``center_degree_cap``, which drops
  centers above a degree ceiling (standard link-prediction practice:
  common-neighbor evidence through a celebrity hub is near-meaningless,
  and the cap bounds the quadratic term at cap²·n_centers).  The cap is
  OFF in the oracle-gated query (test graphs have no hubs) and exercised
  in tests.
- Adjacency/edge frames are lazily checkpointed once and reused across the
  deg join and both wedge sides, so the events scan runs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.plans.iterative import PR_MOD, _edges

from lachesis_spark.operators.core import barrier as _barrier

TOP_PAIRS = 20


def undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected edge list (a < b, deduped both directions)."""
    e = _edges(spark, sf_dir)
    return (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def oriented_edges(und: DataFrame) -> DataFrame:
    """Direct each edge from lower (deg, id) to higher (deg, id) — bounds
    every out-degree at O(√m) regardless of hub size."""
    deg = degrees(und)
    j = (
        und.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("dega")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("degb")), "b")
    )
    # und guarantees a < b, so the (dega == degb) tie keeps a→b
    a_first = (F.col("dega") < F.col("degb")) | (F.col("dega") == F.col("degb"))
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )


def triangle_counts(und: DataFrame) -> DataFrame:
    """Per-node triangle participation: wedge join over the oriented edges
    + closing-edge equi-join; each triangle enumerated once, then exploded
    to its three corners."""
    o = oriented_edges(und).transform(_barrier)
    wedges = (
        o.select(F.col("u").alias("x"), F.col("w").alias("y"))
        .join(o.select(F.col("u").alias("y"), F.col("w").alias("z")), "y")
    )
    tris = wedges.join(
        o.select(F.col("u").alias("x"), F.col("w").alias("z")), ["x", "z"]
    )
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy("node")
    )


# dense-regime gate: bitmap bytes = n·⌈n/64⌉·8 ≤ ~32 MB → n ≤ 16384.  The
# same size-gated two-regime pattern as dedup's cc_converged broadcast
# sweeps: one metadata-cheap count on the checkpointed frame picks the
# plan; both regimes produce identical results (test-locked).
DENSE_N_MAX = 16384


def common_neighbor_pairs(
    und: DataFrame,
    k: int = TOP_PAIRS,
    center_degree_cap: int | None = None,
) -> DataFrame:
    """Top-k NON-adjacent node pairs by common-neighbor count (the classic
    link-prediction score).

    Two size-gated regimes:

    - **Dense/small node set (n ≤ DENSE_N_MAX)**: the wedge join generates
      Σ deg(c)² pairs — 30M rows to shuffle at sf0.1 for a graph whose
      whole adjacency STRUCTURE is 280 KB of bitmaps.  Instead: build one
      adjacency bitmap per node distributed (applyInPandas over the
      node-grouped adjacency), collect the n ≤ 16k bitmap rows (≤ 32 MB,
      gate-bounded — the k-means-centroid collect pattern), broadcast
      them, and compute every pair's popcount(bits[x] & bits[y]) in a
      numpy kernel over a partitioned node range — each task owns a slice
      of x values, emits its local top-k, and TakeOrdered merges
      task-count·k rows.  Adjacent pairs are masked inside the kernel
      (bits[x] already encodes them) — no separate anti-join.  Measured
      12.5 s → ~1 s at sf0.1.
    - **Large node set**: the wedge self-join on the shared center —
      the only shape that scales when bitmaps cannot broadcast — with the
      ``center_degree_cap`` knob for the inherent deg(center)² hub term
      (standard link-prediction practice; common-neighbor evidence
      through a celebrity hub is near-meaningless).
    """
    adj = (
        und.select(F.col("a").alias("n"), F.col("b").alias("nbr"))
        .unionAll(und.select(F.col("b").alias("n"), F.col("a").alias("nbr")))
        .transform(_barrier, eager=True)
    )
    if center_degree_cap is None:
        n_nodes = adj.select("n").distinct().count()
        if n_nodes <= DENSE_N_MAX:
            return _common_neighbors_dense(adj, k)
    centers = adj
    if center_degree_cap is not None:
        deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
        centers = adj.join(
            deg.filter(F.col("deg") <= center_degree_cap).select("n"), "n"
        )
    pairs = (
        centers.select("n", F.col("nbr").alias("x"))
        .join(centers.select("n", F.col("nbr").alias("y")), "n")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    non_adjacent = pairs.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    return non_adjacent.orderBy(
        F.col("n_common").desc(), F.col("x"), F.col("y")
    ).limit(k)


def _popcount(a):
    """Vectorized popcount over a uint64 array: np.bitwise_count when
    available (numpy ≥ 2), else the classic SWAR reduction — 5 fused
    uint64 passes, no 8× uint8 gather (the LUT fallback's gather made the
    kernel memory-bound: measured 3.5× slower at n≈15k)."""
    import numpy as np

    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(a).sum(axis=-1, dtype=np.int64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h0 = np.uint64(0x0101010101010101)
    v = a - ((a >> np.uint64(1)) & m1)
    v = (v & m2) + ((v >> np.uint64(2)) & m2)
    v = (v + (v >> np.uint64(4))) & m4
    return ((v * h0) >> np.uint64(56)).sum(axis=-1, dtype=np.int64)


def _common_neighbors_dense(adj: DataFrame, k: int) -> DataFrame:
    """Bitset kernel for the gate-bounded dense regime (see
    common_neighbor_pairs), with FAGIN-STYLE THRESHOLD TERMINATION:
    c(x, y) = |N(x) ∩ N(y)| ≤ min(deg x, deg y), so the exact top-k is
    found by scoring pairs within a degree-descending pool of D nodes and
    growing D (×4 per round) until the kth score ≥ deg of the (D+1)-th
    node — every pair outside the pool is then provably below the kth.
    On hub-heavy graphs (the shape the ×10 probe builds: 100 dst hubs at
    deg ~7000 over ~190-deg users) the bound fires at D ≈ 2k+hubs and the
    kernel touches ~D²/2 pairs instead of n²/2 — measured 66 s → ~2 s at
    ×10; on degree-uniform graphs the bound cannot fire and the final
    round IS the full kernel, which the DENSE_N_MAX gate keeps bounded.
    Counts are always over FULL bitmaps (all n nodes as potential common
    neighbors) — the pool restricts which PAIRS are scored, never the
    evidence, so results are exact."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = adj.sparkSession
    ids = [r["n"] for r in adj.select("n").distinct().orderBy("n").collect()]
    n = len(ids)
    idx_of = {v: i for i, v in enumerate(ids)}
    words = (n + 63) // 64
    b_idx = spark.sparkContext.broadcast(idx_of)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        imap = b_idx.value
        out = []
        for node, grp in pdf.groupby("n"):
            w = np.zeros(words, dtype=np.uint64)
            nb = np.fromiter((imap[v] for v in grp["nbr"]), dtype=np.int64)
            np.bitwise_or.at(w, nb // 64, np.uint64(1) << (nb % 64).astype(np.uint64))
            # signed view: LongType cannot carry uint64 values with the top
            # bit set; the collector views it back as uint64
            out.append((int(imap[node]), w.view(np.int64).tolist()))
        return pd.DataFrame(out, columns=["i", "bits"])

    bm_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("bits", T.ArrayType(T.LongType())),
        ]
    )
    rows = (
        adj.repartition(min(32, max(2, n // 64)), "n")
        .groupBy("n")
        .applyInPandas(lambda pdf: build(pdf), schema=bm_schema)
        .collect()  # n rows ≤ 16384 (gate-bounded), ≤ 32 MB
    )
    bm = np.zeros((n, words), dtype=np.uint64)
    for r in rows:
        bm[r["i"]] = np.array(r["bits"], dtype=np.int64).view(np.uint64)
    b_bm = spark.sparkContext.broadcast(bm)
    b_ids = spark.sparkContext.broadcast(ids)

    out_schema = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
            T.StructField("n_common", T.LongType()),
        ]
    )

    deg = _popcount(bm)  # per-row popcount -> node degrees
    # degree-descending pool order, id-ascending tiebreak (deterministic)
    pool_order = np.lexsort((np.arange(n), -deg))
    b_pool = spark.sparkContext.broadcast(pool_order)

    def make_kernel(D):
        def kernel(iterator):
            B = b_bm.value
            id_arr = np.asarray(b_ids.value, dtype=np.int64)
            pool = b_pool.value[:D]
            for pdf in iterator:
                xs_l, ys_l, cs_l = [], [], []
                for pi in pdf["id"]:
                    pi = int(pi)
                    if pi + 1 >= D:
                        continue
                    x = int(pool[pi])
                    ys = pool[pi + 1 :]
                    common = _popcount(np.bitwise_and(B[x], B[ys]))
                    # mask adjacent pairs (bit y of B[x]) and zero counts
                    adj_mask = (
                        B[x][ys // 64] >> (ys % 64).astype(np.uint64)
                    ).astype(np.uint64) & np.uint64(1)
                    keep = (common > 0) & (adj_mask == 0)
                    m_keep = int(keep.sum())
                    if m_keep:
                        xs_l.append(np.full(m_keep, x, dtype=np.int64))
                        ys_l.append(ys[keep])
                        cs_l.append(common[keep])
                if not xs_l:
                    yield pd.DataFrame({"x": [], "y": [], "n_common": []}).astype(
                        {"x": "int64", "y": "int64", "n_common": "int64"}
                    )
                    continue
                X = np.concatenate(xs_l)
                Y = np.concatenate(ys_l)
                C = np.concatenate(cs_l)
                # canonical pair order on ORIGINAL ids (pool order is by
                # degree, so x/y may arrive either way around)
                xi, yi = id_arr[X], id_arr[Y]
                lo, hi = np.minimum(xi, yi), np.maximum(xi, yi)
                # local top-k under the GLOBAL ordering (count desc, x, y)
                order = np.lexsort((hi, lo, -C))[:k]
                yield pd.DataFrame(
                    {"x": lo[order], "y": hi[order], "n_common": C[order]}
                )

        return kernel

    D = max(4 * k, 512)
    while True:
        D = min(D, n)
        cand = (
            spark.range(0, D, numPartitions=min(32, max(2, D // 64)))
            .mapInPandas(make_kernel(D), schema=out_schema)
        )
        top = (
            cand.orderBy(F.col("n_common").desc(), F.col("x"), F.col("y"))
            .limit(k)
            .transform(_barrier, eager=True)
        )
        if D >= n:
            return top
        rows = top.collect()  # k rows, bounded
        kth = rows[-1]["n_common"] if len(rows) == k else -1
        # every unscored pair has one endpoint outside the pool, so its
        # count is bounded by that endpoint's degree.  Strict inequality:
        # an unscored pair tying the kth count could still outrank it
        # under the (n_common desc, x asc, y asc) tiebreak, so on equality
        # we must keep growing the pool.
        if kth > int(deg[pool_order[D]]):
            return top
        D *= 4


# ---------------------------------------------------------------------------
# registry queries + oracles
def graph_triangles(spark, sf_dir):
    return triangle_counts(undirected_edges(spark, sf_dir))


_SQL_EDGES = f"""
edges AS (
  SELECT DISTINCT user_id AS src, event_id % {PR_MOD} AS dst
  FROM events WHERE user_id <> event_id % {PR_MOD}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
  WHERE src <> dst
)
"""

GRAPH_TRIANGLES_SQL = f"""
WITH {_SQL_EDGES},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node ORDER BY node
"""


def graph_common_neighbors(spark, sf_dir):
    return common_neighbor_pairs(undirected_edges(spark, sf_dir), k=TOP_PAIRS)


GRAPH_COMMON_NEIGHBORS_SQL = f"""
WITH {_SQL_EDGES},
adj AS (
  SELECT a AS n, b AS nbr FROM und
  UNION ALL SELECT b, a FROM und
),
pairs AS (
  SELECT a1.nbr AS x, a2.nbr AS y, CAST(count(*) AS BIGINT) AS n_common
  FROM adj a1 JOIN adj a2 ON a1.n = a2.n
  WHERE a1.nbr < a2.nbr
  GROUP BY a1.nbr, a2.nbr
)
SELECT p.x, p.y, p.n_common
FROM pairs p
ANTI JOIN und ON und.a = p.x AND und.b = p.y
ORDER BY p.n_common DESC, p.x, p.y LIMIT {TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# k-core peeling / onion decomposition
KCORE_ORACLE_DEPTH = 16  # unroll budget; > observed peel depth (≤5) at every
#                          sweep SF — a deeper peel would HASH-MISMATCH (the
#                          Spark side is depth-independent), never pass silently


#  Doubled-edge row count at or under which the graph loops run on a
#  single stats-clamped partition (~12 MB of edge rows): exchange-free
#  hinted hash joins, one narrow job per sweep — the plans/la.py /
#  dedup.cc_converged pattern.  Corpus-scale graphs keep the partitioned
#  paths (the gate is an actual row count, never a guess).
GRAPH_SINGLE_PARTITION_EDGE_LIMIT = 1 << 19


def kcore_layers(
    und: DataFrame, k: int, n_parts: int = 32, m: int | None = None
) -> DataFrame:
    """Onion decomposition by k-core peeling: repeatedly remove every node
    with fewer than ``k`` ALIVE neighbors; a node's ``layer`` is the round
    that removed it (1-based), survivors — the k-core — get layer 0.

    The convergence-checked production form (same operational shape as
    dedup's ``cc_converged``): each sweep is one co-partitioned
    edges⋈alive⋈alive join + one degree aggregation, shuffle width scoped
    per-frame via explicit ``repartition(n_parts)`` (never the session
    conf), alive set checkpointed per sweep, exit when a sweep removes
    nothing.  Sweep count = peel depth (graph-dependent, typically
    O(log n) on heavy-tailed graphs); the alive frame only shrinks, so
    per-sweep cost falls monotonically."""
    spark = und.sparkSession
    # edges live partitioned by the NEIGHBOR endpoint v: the per-sweep
    # alive-filter join (on v) is then co-partitioned and exchange-free,
    # and the only shuffle a sweep pays is the degree groupBy on u.  The
    # earlier u-partitioned layout filtered u first and paid two more
    # edge-sized exchanges per sweep (re-hash on v, then back on u);
    # filtering dead u's is NOT needed before the groupBy — their degree
    # rows are dropped by the alive-side join below, and the bytes they
    # add to the one shuffle are less than the exchanges they saved.
    ee = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    small = m is not None and 2 * m <= GRAPH_SINGLE_PARTITION_EDGE_LIMIT
    if small:
        # single-partition regime: every sweep join/aggregate plans zero
        # exchanges (hinted hash join over stats-clamped SinglePartition
        # frames; limit(2m) is an identity — the doubled edge list is
        # exactly 2m rows, alive/layer frames at most that), so a sweep
        # is ONE narrow job (its exit count) instead of an AQE stage
        # cascade per checkpoint.
        cap = 2 * int(m)
        e = ee.coalesce(1).transform(_barrier, eager=True).coalesce(1).limit(cap)
        alive = (
            e.select(F.col("u").alias("node")).distinct()
            .transform(_barrier).coalesce(1).limit(cap)
        )
    else:
        e = ee.repartition(n_parts, "v").transform(_barrier, eager=True)
        alive = (
            e.select(F.col("u").alias("node")).distinct()
            .repartition(n_parts, "node")
            .transform(_barrier, eager=True)
        )
    layers = None
    r = 0
    while True:
        r += 1
        alive_v = alive.select(F.col("node").alias("v"))
        deg = (
            e.join(alive_v.hint("shuffle_hash") if small else alive_v, "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # ONE materializing action per sweep (the cc_converged fusion
        # pattern): annotate every alive node with its keep/remove verdict
        # in a single lazily-checkpointed frame — the exit-check count is
        # the job that materializes it, and the next sweep's alive plus
        # this sweep's removed layer are both cheap filters over the
        # persisted RDD.  The previous shape re-executed the whole
        # degree join a second time per sweep (removed.count() for the
        # exit check, then the eager alive checkpoint recomputing
        # alive⋈keep from scratch).  Nodes with zero alive neighbors are
        # absent from deg — the left join's coalesce(0) removes them.
        degn = deg.select(F.col("u").alias("node"), "d")
        ann = alive.join(
            degn.hint("shuffle_hash") if small else degn, "node", "left"
        ).select(
            "node", (F.coalesce(F.col("d"), F.lit(0)) >= k).alias("keep")
        )
        if small:
            ann = ann.transform(_barrier).coalesce(1).limit(cap)
        else:
            ann = ann.repartition(n_parts, "node").transform(_barrier)
        n_removed = ann.filter(~F.col("keep")).count()
        if n_removed == 0:
            break
        removed = ann.filter(~F.col("keep")).select(
            "node", F.lit(r).cast("long").alias("layer")
        )
        if layers is None:
            layers = removed
        elif small:
            layers = (
                layers.unionByName(removed)
                .coalesce(1).transform(_barrier).coalesce(1).limit(cap)
            )
        else:
            layers = layers.unionByName(removed).transform(_barrier)
        alive = ann.filter(F.col("keep")).select("node")
    core = alive.select("node", F.lit(0).cast("long").alias("layer"))
    out = core if layers is None else layers.unionByName(core)
    return out.orderBy("node")


def graph_kcore(spark, sf_dir):
    """Onion layers of the events graph at k = mean degree: k and the peel
    loop run engine-side; only the 2-number (m, n) aggregate reaches the
    driver to fix k (bounded collect, the k-means pattern)."""
    und = undirected_edges(spark, sf_dir).transform(_barrier, eager=True)
    # one job for BOTH scalars: edge count = half the endpoint rows,
    # node count = exact distinct endpoints (was two sequential counts)
    mn = (
        und.select(F.col("a").alias("x"))
        .unionAll(und.select(F.col("b").alias("x")))
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("m"),
            F.count_distinct(F.col("x")).alias("n"),
        )
        .first()
    )
    k = int(2 * mn["m"] / mn["n"])
    return kcore_layers(und, k, m=int(mn["m"]))


def _kcore_oracle_sql(depth: int = KCORE_ORACLE_DEPTH) -> str:
    ctes = [
        "e AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und)",
        "alive0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM e)",
        "kk AS MATERIALIZED (SELECT CAST(FLOOR(2.0 * (SELECT count(*) FROM und)"
        " / (SELECT count(*) FROM alive0)) AS BIGINT) AS k)",
    ]
    for r in range(1, depth + 1):
        ctes.append(
            f"alive{r} AS MATERIALIZED (\n"
            f"  SELECT u AS node FROM (\n"
            f"    SELECT e.u, count(*) AS d FROM e\n"
            f"    JOIN alive{r - 1} x ON e.u = x.node\n"
            f"    JOIN alive{r - 1} y ON e.v = y.node\n"
            f"    GROUP BY e.u)\n"
            f"  WHERE d >= (SELECT k FROM kk))"
        )
    removed = "\nUNION ALL\n".join(
        f"SELECT node, CAST({r} AS BIGINT) AS layer FROM alive{r - 1}\n"
        f"WHERE node NOT IN (SELECT node FROM alive{r})"
        for r in range(1, depth + 1)
    )
    return (
        f"WITH {_SQL_EDGES},\n"
        + ",\n".join(ctes)
        + f"\n{'SELECT node, layer FROM ('}{removed}\n"
        + f"UNION ALL SELECT node, CAST(0 AS BIGINT) FROM alive{depth})\n"
        + "ORDER BY node"
    )


GRAPH_KCORE_SQL = _kcore_oracle_sql()


# ---------------------------------------------------------------------------
# single-source shortest paths (BFS hop distance)
SSSP_ORACLE_DEPTH = 32  # oracle recursion bound; > observed eccentricity at
#                         every sweep SF — a deeper BFS level would surface
#                         as rows the oracle lacks (hash mismatch), never
#                         pass silently.  The Spark side is depth-independent.


def sssp_hops(
    und: DataFrame, src: int, n_parts: int = 32, m: int | None = None
) -> DataFrame:
    """Hop distances from ``src`` by frontier BFS — the convergence-checked
    production loop (same shape as ``kcore_layers``): per level, one
    co-partitioned frontier⋈edges join expands the frontier, one anti-join
    against the visited set removes known nodes; exit when a level adds
    nothing.  Level count = the source's eccentricity (small-world graphs:
    O(log n)); the per-level join is frontier-sized, never graph-sized, and
    both frames are explicitly repartitioned on their key — the session
    shuffle conf is never touched.  Unreachable nodes are absent (standard
    BFS contract)."""
    spark = und.sparkSession
    ee = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    small = m is not None and 2 * m <= GRAPH_SINGLE_PARTITION_EDGE_LIMIT
    if small:
        # single-partition regime (see kcore_layers); the seed frame is
        # range-based so its stats are truthful from the start.
        cap = 2 * int(m)
        e = ee.coalesce(1).transform(_barrier, eager=True).coalesce(1).limit(cap)
        dist = spark.range(1).select(
            F.lit(src).cast("long").alias("node"),
            F.lit(0).cast("long").alias("dist"),
        ).coalesce(1)
    else:
        e = ee.repartition(n_parts, "u").transform(_barrier, eager=True)
        dist = (
            spark.createDataFrame([(src, 0)], "node long, dist long")
            .repartition(n_parts, "node")
            .transform(_barrier, eager=True)
        )
    frontier = dist
    prev_frontier = None
    level = 0
    while True:
        level += 1
        # BFS locality (undirected graph): a neighbor of a distance-L node
        # has distance in {L-1, L, L+1}, so the "already visited" check
        # only needs the CURRENT and PREVIOUS frontiers — two
        # frontier-sized co-partitioned anti-joins — never the whole dist
        # accumulation (whose growing union carried UnknownPartitioning
        # and re-shuffled every level).  Per level: one exchange (the
        # expansion distinct); the expansion join, both anti-joins and
        # the exit count ride the pinned hash(node) layout, and the lazy
        # checkpoint makes the exit count the level's only action.
        fu = frontier.select(F.col("node").alias("u"))
        nxt = (
            e.join(fu.hint("shuffle_hash") if small else fu, "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        if not small:
            nxt = nxt.repartition(n_parts, "node")
        fa = frontier.select("node")
        nxt = nxt.join(
            fa.hint("shuffle_hash") if small else fa, "node", "left_anti"
        )
        if prev_frontier is not None:
            pa = prev_frontier.select("node")
            nxt = nxt.join(
                pa.hint("shuffle_hash") if small else pa, "node", "left_anti"
            )
        nxt = (
            nxt.select("node", F.lit(level).cast("long").alias("dist"))
            .transform(_barrier)
        )
        if small:
            nxt = nxt.coalesce(1).limit(cap)
        if nxt.count() == 0:  # one bounded action per level — the exit check
            break
        dist = dist.unionByName(nxt)
        prev_frontier = frontier
        frontier = nxt
    return dist


def graph_sssp(spark, sf_dir):
    """BFS level profile from the minimum node id of the events graph:
    per-distance node count + id extrema.  The full (node, dist) frame
    stays engine-side; only the eccentricity-sized histogram is returned
    (what a reachability dashboard actually renders), so result size is
    O(diameter) at any corpus scale."""
    und = undirected_edges(spark, sf_dir).transform(_barrier, eager=True)
    # one job for BOTH scalars: the BFS source and the edge count that
    # gates the single-partition loop regime
    pr = und.agg(F.min("a").alias("src"), F.count(F.lit(1)).alias("m")).collect()[0]
    d = sssp_hops(und, int(pr["src"]), m=int(pr["m"]))
    return (
        d.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )


GRAPH_SSSP_SQL = f"""
WITH RECURSIVE
{_SQL_EDGES.strip().rstrip()},
e AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
),
walk(node, dist) AS (
  SELECT (SELECT min(a) FROM und), CAST(0 AS BIGINT)
  UNION
  SELECT e.v, w.dist + 1 FROM e JOIN walk w ON e.u = w.node
  WHERE w.dist < {SSSP_ORACLE_DEPTH}
)
SELECT dist, count(*)::BIGINT AS n_nodes, min(node) AS min_node, max(node) AS max_node
FROM (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
GROUP BY dist ORDER BY dist
"""


QUERIES = {
    "graph_triangles": graph_triangles,
    "graph_common_neighbors": graph_common_neighbors,
    "graph_kcore": graph_kcore,
    "graph_sssp": graph_sssp,
}

ORACLE = {
    "graph_triangles": GRAPH_TRIANGLES_SQL,
    "graph_common_neighbors": GRAPH_COMMON_NEIGHBORS_SQL,
    "graph_kcore": GRAPH_KCORE_SQL,
    "graph_sssp": GRAPH_SSSP_SQL,
}


# ---------------------------------------------------------------------------
# synchronous label propagation (community detection)
LPA_ROUNDS = 4  # FIXED round count so the oracle unrolls the identical
#                 arithmetic; deterministic tie-break (max count, then min
#                 label) makes every round reproducible cross-engine.


def lpa_labels(
    und: DataFrame, rounds: int = LPA_ROUNDS, n_parts: int = 32,
    m: int | None = None,
) -> DataFrame:
    """Synchronous LPA: each round every node adopts its neighbors' most
    frequent label (ties -> smallest label).  Unlike connected components
    (pure min-propagation, finds CONNECTIVITY), frequency voting finds
    DENSER substructure inside a component.

    Scale shape: per round ONE co-partitioned edges⋈labels join + one
    (node, label)-count aggregation + one per-node argmax — all keyed on
    the node id, label frame checkpointed per round (the kcore/cc loop
    pattern); rounds are FIXED, not data-dependent."""
    # FIXED round count and every frame used exactly once downstream, so
    # the whole loop runs LAZILY: all checkpoints are eager=False and the
    # caller's single final action materializes the full 4-round chain in
    # ONE Spark job (each round's checkpoint persists as a byproduct,
    # keeping lineage shallow for any re-reference).  The previous
    # eager-per-round cadence paid rounds+2 sequential job launches for
    # identical work — pure fixed overhead on a reduced-size label frame.
    ee = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    small = m is not None and 2 * m <= GRAPH_SINGLE_PARTITION_EDGE_LIMIT
    if small:
        # single-partition regime (see kcore_layers): the 4-round lazy
        # chain plans zero exchanges, so the caller's one action runs it
        # as one narrow job cascade with no per-checkpoint AQE stage jobs.
        cap = 2 * int(m)
        e = ee.coalesce(1).transform(_barrier).coalesce(1).limit(cap)
        lab = (
            e.select(F.col("u").alias("node")).distinct()
            .select("node", F.col("node").alias("lbl"))
            .transform(_barrier).coalesce(1).limit(cap)
        )
    else:
        e = ee.repartition(n_parts, "v").transform(_barrier)
        lab = (
            e.select(F.col("u").alias("node")).distinct()
            .select("node", F.col("node").alias("lbl"))
            .repartition(n_parts, "node")
            .transform(_barrier)
        )
    for _ in range(rounds):
        lv = lab.select(F.col("node").alias("v"), "lbl")
        votes = (
            e.join(lv.hint("shuffle_hash") if small else lv, "v")
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (count desc, label asc): max(struct(c, -lbl))
        lab = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))).alias("s"))
            .select("node", (-F.col("s.neg")).alias("lbl"))
        )
        if small:
            lab = lab.transform(_barrier).coalesce(1).limit(cap)
        else:
            lab = lab.repartition(n_parts, "node").transform(_barrier)
    return lab


def graph_lpa(spark, sf_dir):
    """Community-size distribution after LPA_ROUNDS of label propagation:
    (community_size, n_communities) — the model-sized summary a community
    dashboard renders (per-node labels stay engine-side).  und is consumed
    exactly once (the edge build inside lpa_labels), so its checkpoint is
    lazy too — the query's one action runs everything."""
    und = undirected_edges(spark, sf_dir).transform(_barrier)
    # the count gates the single-partition loop regime AND materializes
    # und's lazy barrier, so the 4-round chain builds from persisted
    # blocks (one bounded job; the loop itself then runs exchange-free)
    m = und.count()
    lab = lpa_labels(und, m=m)
    sizes = lab.groupBy("lbl").agg(F.count(F.lit(1)).cast("long").alias("csize"))
    return (
        sizes.groupBy("csize")
        .agg(F.count(F.lit(1)).cast("long").alias("n_communities"))
        .orderBy("csize")
    )


def _lpa_oracle_sql(rounds: int = LPA_ROUNDS) -> str:
    ctes = [
        "e AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und)",
        "lab0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"lab{r} AS MATERIALIZED (\n"
            f"  SELECT node, lbl FROM (\n"
            f"    SELECT e.u AS node, l.lbl, count(*) AS c,\n"
            f"           row_number() OVER (PARTITION BY e.u\n"
            f"                              ORDER BY count(*) DESC, l.lbl ASC) AS rn\n"
            f"    FROM e JOIN lab{r - 1} l ON e.v = l.node\n"
            f"    GROUP BY e.u, l.lbl)\n"
            f"  WHERE rn = 1)"
        )
    return (
        f"WITH {_SQL_EDGES},\n" + ",\n".join(ctes)
        + f"""
SELECT csize, count(*)::BIGINT AS n_communities FROM (
  SELECT lbl, count(*)::BIGINT AS csize FROM lab{rounds} GROUP BY lbl
)
GROUP BY csize ORDER BY csize"""
    )


GRAPH_LPA_SQL = _lpa_oracle_sql()

QUERIES["graph_lpa"] = graph_lpa
ORACLE["graph_lpa"] = GRAPH_LPA_SQL
