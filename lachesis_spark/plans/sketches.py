"""Deterministic mergeable sketches: HyperLogLog and Count-Min.

``op_approx_sketches`` covers Spark's built-in approx aggregates
(HLL++ / quantile) but is rows-only: sketch internals aren't comparable
across engines.  These two queries close that gap by building the sketches
FROM SCRATCH out of cross-engine-deterministic md5 hashes
(:mod:`lachesis_spark.functions.hashing`), so every register / counter —
and therefore the estimate itself — is reproduced bit-for-bit by the DuckDB
oracle.  The estimates are then compared against exact counts in the same
plan, making the error measurable, not just trusted.

Scale notes
-----------
* ``sketch_hll`` (p=9, m=512 registers): registers are
  ``groupBy(bucket).max(rho)`` — Spark's partial aggregation IS the HLL
  merge, so a 1000-executor pass ships 512 rows per task, never values.
  The exact-count branch (for the error column) is the only
  value-distinct shuffle and exists purely for verification.
* ``sketch_cms`` (d=4 rows × w=256 buckets): the sketch is a
  4×-amplified token stream folded to 1024 cells by partial agg; heavy-
  hitter estimates then touch only (candidates × 4) cells.  On 100 TB the
  sketch build is one map-side-combined pass; nothing value-sized
  shuffles except the exact side kept for error measurement.

HLL per Flajolet et al. 2007 (the same algorithm behind Spark's
``approx_count_distinct``); CMS per Cormode & Muthukrishnan 2005.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.functions.hashing import h60, h60_seeded, sql_h60, sql_h60_seeded
from lachesis_spark.functions.text import tokens

from lachesis_spark.binding import base_table

from lachesis_spark.operators.core import barrier as _barrier

M_HLL = 512          # registers (p = 9)
W_BITS = 51          # value bits left after the bucket index (60 - 9)
CMS_D = 4            # hash rows
CMS_W = 256          # buckets per row
CMS_TOPK = 20


# ---------------------------------------------------------------------------
# 1. HyperLogLog distinct-count of orders.o_custkey, registers + estimate
#    reproduced exactly by the oracle, error vs exact in the same row.
def sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = base_table(spark, sf_dir, "orders")
    v = orders.select(F.col("o_custkey").cast("string").alias("v"))
    h = h60("v")
    # 60-bit value: bucket/value split MUST stay integral (a double division
    # would drop bits past 2^53), so shift/mask instead of divide.
    hashed = v.select(
        h.bitwiseAND(F.lit(M_HLL - 1)).alias("bucket"),
        F.shiftright(h, 9).alias("w"),
    )
    rho = F.when(F.col("w") == 0, W_BITS + 1).otherwise(
        W_BITS + 1 - F.length(F.bin(F.col("w")))
    )
    regs = (
        hashed.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    stats = regs.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("sum_inv_used"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / M_HLL)
    zeros = M_HLL - F.col("n_used")
    sum_inv = F.col("sum_inv_used") + zeros.cast("double")
    e_raw = F.lit(alpha * M_HLL * M_HLL) / sum_inv
    est = F.when(
        (e_raw <= 2.5 * M_HLL) & (zeros > 0),
        F.lit(float(M_HLL)) * F.log(F.lit(float(M_HLL)) / zeros.cast("double")),
    ).otherwise(e_raw)
    exact = v.agg(F.countDistinct("v").alias("exact"))
    return (
        stats.crossJoin(exact)
        .select(
            F.col("n_used").cast("long").alias("n_registers_used"),
            zeros.cast("long").alias("n_registers_zero"),
            F.round(est, 4).alias("hll_estimate"),
            F.col("exact").alias("exact_distinct"),
            F.round(F.abs(est - F.col("exact")) / F.col("exact"), 6).alias("rel_err"),
        )
    )


SKETCH_HLL_SQL = f"""
WITH v AS (
  SELECT CAST(o_custkey AS VARCHAR) AS v FROM orders
), hashed AS (
  SELECT {sql_h60("v")} % {M_HLL} AS bucket,
         {sql_h60("v")} // {M_HLL} AS w
  FROM v
), regs AS (
  SELECT bucket,
         max(CASE WHEN w = 0 THEN {W_BITS + 1}
                  ELSE {W_BITS + 1} - length(bin(w)) END) AS r
  FROM hashed GROUP BY bucket
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_used,
         sum(power(2.0, -r)) AS sum_inv_used
  FROM regs
), ex AS (
  SELECT CAST(count(DISTINCT v) AS BIGINT) AS exact FROM v
), calc AS (
  SELECT n_used, {M_HLL} - n_used AS zeros,
         (0.7213 / (1.0 + 1.079 / {M_HLL})) * {M_HLL} * {M_HLL}
           / (sum_inv_used + CAST({M_HLL} - n_used AS DOUBLE)) AS e_raw,
         exact
  FROM stats, ex
), est AS (
  SELECT n_used, zeros, exact,
         CASE WHEN e_raw <= 2.5 * {M_HLL} AND zeros > 0
              THEN CAST({M_HLL} AS DOUBLE)
                   * ln(CAST({M_HLL} AS DOUBLE) / CAST(zeros AS DOUBLE))
              ELSE e_raw END AS e
  FROM calc
)
SELECT n_used AS n_registers_used,
       CAST(zeros AS BIGINT) AS n_registers_zero,
       round(e, 4) AS hll_estimate,
       exact AS exact_distinct,
       round(abs(e - exact) / exact, 6) AS rel_err
FROM est
"""


# ---------------------------------------------------------------------------
# 2. Count-Min heavy hitters on the document token stream: build the 4×256
#    counter grid, then report estimate vs exact for the exact top-20 words
#    (overcount = est - exact >= 0 by construction — test-locked).
def _token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = base_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )


def sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus tokenize pass (guide §6): the vocabulary-sized exact
    # count frame feeds BOTH the sketch (each token's CMS_D cells
    # weighted by its exact count — sum of per-token counts per cell ==
    # count of token instances per cell, an integer identity) and the
    # top-k probe side.  The old form tokenized the corpus once for the
    # cell stream and AGAIN for the exact counts.
    toks = _token_stream(spark, sf_dir)
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .transform(_barrier)
    )
    cells = exact.select(
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("row_id"),
                        (h60_seeded("tok", s) % CMS_W).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).select("c.row_id", "c.bucket", "exact_n")
    sketch = cells.groupBy("row_id", "bucket").agg(
        F.sum("exact_n").alias("cnt")
    )
    top = exact.orderBy(F.col("exact_n").desc(), F.col("tok").asc()).limit(CMS_TOPK)

    probes = top.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("row_id"),
                        (h60_seeded("tok", s) % CMS_W).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).select("tok", "exact_n", "c.row_id", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "tok",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n")).alias("overcount"),
        )
    )


def _cms_cells_sql(src: str) -> str:
    parts = [
        f"SELECT tok, {s} AS row_id, {sql_h60_seeded('tok', s)} % {CMS_W} AS bucket FROM {src}"
        for s in range(CMS_D)
    ]
    return " UNION ALL ".join(parts)


SKETCH_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS tok
  FROM documents
), cells AS (
  {_cms_cells_sql("toks")}
), sketch AS (
  SELECT row_id, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY row_id, bucket
), exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY tok
), top AS (
  SELECT tok, exact_n FROM exact
  ORDER BY exact_n DESC, tok ASC LIMIT {CMS_TOPK}
), probes AS (
  {_cms_cells_sql("top")}
)
SELECT p.tok, t.exact_n, min(s.cnt) AS cms_estimate,
       min(s.cnt) - t.exact_n AS overcount
FROM probes p
JOIN top t ON p.tok = t.tok
JOIN sketch s ON p.row_id = s.row_id AND p.bucket = s.bucket
GROUP BY p.tok, t.exact_n
"""


# ---------------------------------------------------------------------------
# 3. Mergeable histogram quantile sketch: p50/p90/p99 of
#    lineitem.l_extendedprice from a fixed-B equi-width histogram, with the
#    exact percentiles and absolute errors in the same row.
#
#    Two phases, both trivially distributed:
#      phase 1: global min/max — a column-pruned agg (at 100 TB this is
#               answered from parquet footer statistics for most files;
#               Spark pushes Min/Max partial aggs map-side regardless);
#      phase 2: bin counts — groupBy(bin).count(), where partial
#               aggregation IS the sketch merge: every executor ships ≤ B
#               rows, never values.  Quantiles then interpolate inside the
#               target bin from B cumulative counts on the driver-sized
#               frame.
#
#    Bin assignment uses only IEEE-exact ops (subtract, divide, floor), so
#    DuckDB reproduces every bin — and therefore the estimate — exactly.
#    B = 1024 gives ≤ (max-min)/1024 absolute error per estimate (the
#    error columns make the bound observable rather than trusted); it also
#    caps the cumulative step's inequality self-join at ~1M cells — B=4096
#    measured 2.4–7.4 s run-to-run at sf0.1 from that join's 16.7M cells,
#    B=1024 is stable and the bound is still far below the data's spread.
Q_BINS = 1024
Q_PROBES = (0.5, 0.9, 0.99)


def _exact_quantiles_refined(spark: SparkSession, x: DataFrame, probes) -> DataFrame:
    """EXACT quantile_cont(p) of column ``x`` as a fully distributed
    histogram-refinement selection — the scale-safe replacement for
    Spark's ``percentile`` aggregate, which buffers every value of the
    group in executor memory (OOM'd the ×100 probe at 60 M rows; at
    100 TB it is not even a conversation).

    Three bounded passes, no value ever sorted globally:

      1. B-bin histogram (map-side combined, ≤ B rows shuffled) collected
         to the driver (≤ B rows) locates the level-1 bin of every needed
         order statistic;
      2. one filtered pass re-bins ONLY those ≤ 2·|probes| bins into B
         sub-bins each (≤ 2·|probes|·B rows, collected) — each target
         rank now sits in a leaf holding ~n/B² of the data;
      3. one filtered pass over the ≤ 2·|probes| leaves ranks rows inside
         each leaf (window partitioned per leaf — n/B² rows per
         partition, ~1 M rows at n = 10¹²) and keeps the target
         positions.

    Bin-membership expressions are REUSED verbatim between the counting
    and selection passes, so FP boundary rounding cannot leak a row
    between bins.  quantile_cont semantics (linear interpolation at rank
    1 + p·(n−1)) match DuckDB's, which keeps SKETCH_QUANTILE_SQL a
    binding oracle.  Returns a (p, exact) DataFrame."""
    import math as _math

    from pyspark.sql import Window

    # quantile_cont / percentile ignore NULLs; without this the rank base
    # n would count null rows the histogram groupBy drops, shifting every
    # order statistic (and a None bin would break the sorted() below).
    x = x.filter(F.col("x").isNotNull())
    mm_row = x.agg(F.min("x").alias("lo"), F.max("x").alias("hi")).first()
    lo, hi = float(mm_row["lo"]), float(mm_row["hi"])
    n = x.count()
    if n == 0:
        return spark.createDataFrame([], "p double, exact double")
    if hi == lo:
        return spark.createDataFrame(
            [(float(p), round(lo, 6)) for p in probes], "p double, exact double"
        )
    # needed 1-indexed order statistics: floor/ceil of rank 1 + p(n-1)
    need: dict[int, None] = {}
    rk = {}
    for p in probes:
        r = 1.0 + float(p) * (n - 1)
        rk[float(p)] = r
        need[int(_math.floor(r))] = None
        need[min(n, int(_math.floor(r)) + 1)] = None
    ranks = sorted(need)

    w1 = (hi - lo) / Q_BINS
    bin1 = F.least(F.lit(Q_BINS - 1), F.floor((F.col("x") - F.lit(lo)) / F.lit(w1))).cast("long")
    h1 = sorted(
        x.select(bin1.alias("b1")).groupBy("b1").count().collect(),
        key=lambda r: r["b1"],
    )
    # locate each rank's level-1 bin + count of rows before that bin
    loc1: dict[int, tuple[int, int]] = {}
    cum = 0
    hi_iter = iter(h1)
    cur = next(hi_iter)
    for r in ranks:
        while cum + cur["count"] < r:
            cum += cur["count"]
            cur = next(hi_iter)
        loc1[r] = (int(cur["b1"]), cum)
    bins1 = sorted({b for b, _ in loc1.values()})

    w2 = w1 / Q_BINS
    sub = F.greatest(
        F.lit(0),
        F.least(
            F.lit(Q_BINS - 1),
            F.floor((F.col("x") - F.lit(lo) - F.col("b1") * F.lit(w1)) / F.lit(w2)),
        ),
    ).cast("long")
    lvl2 = (
        x.select("x", bin1.alias("b1"))
        .filter(F.col("b1").isin(bins1))
        .select("x", "b1", sub.alias("b2"))
    )
    h2: dict[int, list] = {}
    for row in lvl2.groupBy("b1", "b2").count().collect():
        h2.setdefault(int(row["b1"]), []).append(row)
    loc2: dict[int, tuple[int, int, int]] = {}  # rank -> (b1, b2, before)
    for r, (b1v, before1) in loc1.items():
        cum2 = before1
        for row in sorted(h2[b1v], key=lambda q: q["b2"]):
            if cum2 + row["count"] >= r:
                loc2[r] = (b1v, int(row["b2"]), cum2)
                break
            cum2 += row["count"]
    leaves = sorted({(b1v, b2v) for b1v, b2v, _ in loc2.values()})
    targets = [  # (b1, b2, k_local, rank)
        (b1v, b2v, r - before, r) for r, (b1v, b2v, before) in loc2.items()
    ]

    leaf_pred = None
    for a, b in leaves:
        cond = (F.col("b1") == F.lit(a)) & (F.col("b2") == F.lit(b))
        leaf_pred = cond if leaf_pred is None else (leaf_pred | cond)
    leaf_rows = lvl2.filter(leaf_pred)
    wleaf = Window.partitionBy("b1", "b2").orderBy("x")
    ranked = leaf_rows.withColumn("k", F.row_number().over(wleaf))
    tgt = spark.createDataFrame(
        [(a, b, int(k), int(r)) for a, b, k, r in targets],
        "b1 long, b2 long, k int, rank long",
    )
    vals = {
        int(row["rank"]): float(row["x"])
        for row in ranked.join(F.broadcast(tgt), ["b1", "b2", "k"]).collect()
    }
    out = []
    for p in probes:
        r = rk[float(p)]
        k0 = int(_math.floor(r))
        k1 = min(n, k0 + 1)
        frac = r - k0
        v = vals[k0] * (1.0 - frac) + vals[k1] * frac
        out.append((float(p), round(v, 6)))
    return spark.createDataFrame(out, "p double, exact double")


def sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = base_table(spark, sf_dir, "lineitem")
    x = li.select(F.col("l_extendedprice").alias("x"))
    mm = x.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    binned = x.join(F.broadcast(mm)).select(
        F.least(
            F.lit(Q_BINS - 1),
            F.floor((F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / Q_BINS)),
        )
        .cast("long")
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).transform(_barrier)
    # cumulative counts via a bounded inequality self-join: the histogram
    # is ≤ Q_BINS rows by construction, so the broadcast b.bin <= a.bin
    # join is a CONSTANT ≤ B² cells at any corpus scale — no global-sort
    # window, no single-partition data movement of row-sized frames.
    cum = (
        hist.select(F.col("bin").alias("abin"))
        .join(F.broadcast(hist), F.col("bin") <= F.col("abin"))
        .groupBy("abin")
        .agg(F.sum("cnt").alias("cum"))
    )
    n = hist.agg(F.sum("cnt").alias("n"))
    probes = spark.createDataFrame([(p,) for p in Q_PROBES], "p double")
    # first bin whose cumulative count reaches rank = p * n
    est = (
        cum.join(F.broadcast(n))
        .join(F.broadcast(probes))
        .filter(F.col("cum") >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("abin").alias("qbin"))
        .join(F.broadcast(mm))
        .select(
            "p",
            F.round(
                F.col("lo") + (F.col("qbin") + F.lit(0.5)) * ((F.col("hi") - F.col("lo")) / Q_BINS),
                6,
            ).alias("estimate"),
        )
    )
    exact = _exact_quantiles_refined(spark, x, Q_PROBES)
    return (
        est.join(F.broadcast(exact), "p")
        .select("p", "estimate", "exact", F.round(F.abs(F.col("estimate") - F.col("exact")), 6).alias("abs_err"))
        .orderBy("p")
    )


SKETCH_QUANTILE_SQL = f"""
WITH x AS (
  SELECT l_extendedprice AS x FROM lineitem
), mm AS (
  SELECT min(x) AS lo, max(x) AS hi FROM x
), binned AS (
  SELECT least({Q_BINS - 1},
               CAST(floor((x.x - mm.lo) / ((mm.hi - mm.lo) / {Q_BINS})) AS BIGINT)) AS bin
  FROM x, mm
), hist AS (
  SELECT bin, count(*)::BIGINT AS cnt FROM binned GROUP BY bin
), cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         sum(cnt) OVER () AS n
  FROM hist
), probes AS (
  SELECT unnest([{", ".join(str(p) for p in Q_PROBES)}]) AS p
), est AS (
  SELECT p.p, min(c.bin) AS qbin
  FROM cum c JOIN probes p ON c.cum >= p.p * c.n
  GROUP BY p.p
), ex AS (
  SELECT p.p,
         CASE p.p {"".join(f"WHEN {p} THEN quantile_cont(x.x, {p}) " for p in Q_PROBES)}END AS exact
  FROM x, probes p GROUP BY p.p
)
SELECT p, estimate, exact, round(abs(estimate - exact), 6) AS abs_err
FROM (
  SELECT e.p,
         round(mm.lo + (e.qbin + 0.5) * ((mm.hi - mm.lo) / {Q_BINS}), 6) AS estimate,
         round(ex.exact, 6) AS exact
  FROM est e JOIN ex ON e.p = ex.p, mm
)
ORDER BY p
"""


# ---------------------------------------------------------------------------
# 4. HLL merge property, made observable: per-source sketches of the
#    distinct document vocabulary are MERGED (register-wise max) and the
#    union estimate is derived from the merged registers — the exact
#    workflow of per-day / per-shard sketches folded into a corpus-wide
#    cardinality without re-scanning values.  ``regsum_merged`` vs
#    ``regsum_direct`` are integer register checksums of the merged
#    sketch and of a sketch built directly over the union stream: they are
#    IDENTICAL by the max-of-max algebra — the invariant in the output,
#    bit-exact, no float tolerance needed.  At 100 TB each source/day
#    keeps 512 registers; the merge is a 512-row-per-source agg.
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = base_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.lower(F.col("text")))).alias("v")
    )
    h = h60("v")
    hashed = toks.select(
        "source",
        h.bitwiseAND(F.lit(M_HLL - 1)).alias("bucket"),
        F.shiftright(h, 9).alias("w"),
    )
    rho = F.when(F.col("w") == 0, W_BITS + 1).otherwise(
        W_BITS + 1 - F.length(F.bin(F.col("w")))
    )
    per_src = (
        hashed.select("source", "bucket", rho.alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = per_src.groupBy("bucket").agg(F.max("r").alias("r"))
    direct = (
        hashed.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    m_stats = merged.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("r").cast("long").alias("regsum_merged"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("sum_inv_used"),
    )
    d_sum = direct.agg(F.sum("r").cast("long").alias("regsum_direct"))
    n_src = docs.agg(F.countDistinct("source").cast("long").alias("n_sources"))
    alpha = 0.7213 / (1.0 + 1.079 / M_HLL)
    zeros = M_HLL - F.col("n_used")
    sum_inv = F.col("sum_inv_used") + zeros.cast("double")
    e_raw = F.lit(alpha * M_HLL * M_HLL) / sum_inv
    est = F.when(
        (e_raw <= 2.5 * M_HLL) & (zeros > 0),
        F.lit(float(M_HLL)) * F.log(F.lit(float(M_HLL)) / zeros.cast("double")),
    ).otherwise(e_raw)
    exact = toks.agg(F.countDistinct("v").alias("exact"))
    return (
        m_stats.crossJoin(d_sum)
        .crossJoin(n_src)
        .crossJoin(exact)
        .select(
            "n_sources",
            "regsum_merged",
            "regsum_direct",
            F.round(est, 4).alias("hll_estimate"),
            F.col("exact").alias("exact_distinct"),
            F.round(F.abs(est - F.col("exact")) / F.col("exact"), 6).alias("rel_err"),
        )
    )


SKETCH_HLL_MERGE_SQL = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS v
  FROM documents
), hashed AS (
  SELECT source, {sql_h60("v")} % {M_HLL} AS bucket,
         {sql_h60("v")} // {M_HLL} AS w
  FROM toks
), rhos AS (
  SELECT source, bucket,
         CASE WHEN w = 0 THEN {W_BITS + 1}
              ELSE {W_BITS + 1} - length(bin(w)) END AS rho
  FROM hashed
), per_src AS (
  SELECT source, bucket, max(rho) AS r FROM rhos GROUP BY source, bucket
), merged AS (
  SELECT bucket, max(r) AS r FROM per_src GROUP BY bucket
), direct AS (
  SELECT bucket, max(rho) AS r FROM rhos GROUP BY bucket
), m_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_used,
         CAST(sum(r) AS BIGINT) AS regsum_merged,
         sum(power(2.0, -r)) AS sum_inv_used
  FROM merged
), d_sum AS (
  SELECT CAST(sum(r) AS BIGINT) AS regsum_direct FROM direct
), srcs AS (
  SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM documents
), ex AS (
  SELECT CAST(count(DISTINCT v) AS BIGINT) AS exact FROM toks
), calc AS (
  SELECT n_used, {M_HLL} - n_used AS zeros,
         regsum_merged,
         (0.7213 / (1.0 + 1.079 / {M_HLL})) * {M_HLL} * {M_HLL}
           / (sum_inv_used + CAST({M_HLL} - n_used AS DOUBLE)) AS e_raw
  FROM m_stats
), est AS (
  SELECT regsum_merged,
         CASE WHEN e_raw <= 2.5 * {M_HLL} AND zeros > 0
              THEN CAST({M_HLL} AS DOUBLE)
                   * ln(CAST({M_HLL} AS DOUBLE) / CAST(zeros AS DOUBLE))
              ELSE e_raw END AS e
  FROM calc
)
SELECT srcs.n_sources, est.regsum_merged, d_sum.regsum_direct,
       round(est.e, 4) AS hll_estimate,
       ex.exact AS exact_distinct,
       round(abs(est.e - ex.exact) / ex.exact, 6) AS rel_err
FROM est, d_sum, srcs, ex
"""


QUERIES = {
    "sketch_hll": sketch_hll,
    "sketch_cms": sketch_cms,
    "sketch_quantile": sketch_quantile,
    "sketch_hll_merge": sketch_hll_merge,
}

ORACLE = {
    "sketch_hll": SKETCH_HLL_SQL,
    "sketch_cms": SKETCH_CMS_SQL,
    "sketch_quantile": SKETCH_QUANTILE_SQL,
    "sketch_hll_merge": SKETCH_HLL_MERGE_SQL,
}


# ---------------------------------------------------------------------------
# 5. Count-Min join-size estimation (AGMS/CM inner product): |A ⋈ B| on a
#    key equals Σ_v fA(v)·fB(v), which the CM sketches of the two key
#    streams estimate as min_d Σ_b A_d[b]·B_d[b] — the upper-bound
#    estimate a cost-based join planner consults BEFORE shuffling
#    anything.  Each side folds to its d×w counter grid in one map-side-
#    combined pass; the estimate touches d·w cells.  The exact join size
#    is computed in the same plan so the error is observable.  This is the
#    sketch-driven statistic behind recommend_join_strategy-style
#    decisions at 100 TB: the sketches are mergeable across partitions /
#    days exactly like sketch_hll_merge's registers.
def _cm_cells(df: DataFrame, col: str) -> DataFrame:
    v = df.select(F.col(col).cast("string").alias("v"))
    return (
        v.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("row_id"),
                            (h60_seeded("v", s) % CMS_W).alias("bucket"),
                        )
                        for s in range(CMS_D)
                    ]
                )
            ).alias("c")
        )
        .select("c.row_id", "c.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def sketch_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = base_table(spark, sf_dir, "orders")
    cust = base_table(spark, sf_dir, "customer")
    a = _cm_cells(orders, "o_custkey")
    b = _cm_cells(cust, "c_custkey")
    est = (
        a.join(b.withColumnRenamed("cnt", "bcnt"), ["row_id", "bucket"])
        .groupBy("row_id")
        .agg(F.sum(F.col("cnt") * F.col("bcnt")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("cm_estimate"))
    )
    exact = (
        orders.select(F.col("o_custkey").alias("k"))
        .join(cust.select(F.col("c_custkey").alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_join_size"))
    )
    return est.crossJoin(exact).select(
        "cm_estimate",
        "exact_join_size",
        F.round(
            (F.col("cm_estimate") - F.col("exact_join_size"))
            / F.col("exact_join_size"),
            6,
        ).alias("rel_overcount"),
    )


def _cm_cells_sql_for(table: str, col: str) -> str:
    parts = [
        f"SELECT {s} AS row_id, {sql_h60_seeded(f'CAST({col} AS VARCHAR)', s)} % {CMS_W} AS bucket"
        f" FROM {table}"
        for s in range(CMS_D)
    ]
    inner = " UNION ALL ".join(parts)
    return f"SELECT row_id, bucket, count(*)::BIGINT AS cnt FROM ({inner}) GROUP BY row_id, bucket"


SKETCH_JOIN_SIZE_SQL = f"""
WITH a AS ({_cm_cells_sql_for("orders", "o_custkey")}),
b AS ({_cm_cells_sql_for("customer", "c_custkey")}),
est AS (
  SELECT CAST(min(ip) AS BIGINT) AS cm_estimate FROM (
    SELECT a.row_id, sum(a.cnt * b.cnt) AS ip
    FROM a JOIN b ON a.row_id = b.row_id AND a.bucket = b.bucket
    GROUP BY a.row_id
  )
), ex AS (
  SELECT count(*)::BIGINT AS exact_join_size
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT est.cm_estimate, ex.exact_join_size,
       round((est.cm_estimate - ex.exact_join_size)
             / ex.exact_join_size::DOUBLE, 6) AS rel_overcount
FROM est, ex
"""

QUERIES["sketch_join_size"] = sketch_join_size
ORACLE["sketch_join_size"] = SKETCH_JOIN_SIZE_SQL
