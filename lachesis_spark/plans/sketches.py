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

M_HLL = 512          # registers (p = 9)
W_BITS = 51          # value bits left after the bucket index (60 - 9)
CMS_D = 4            # hash rows
CMS_W = 256          # buckets per row
CMS_TOPK = 20


# ---------------------------------------------------------------------------
# 1. HyperLogLog distinct-count of orders.o_custkey, registers + estimate
#    reproduced exactly by the oracle, error vs exact in the same row.
def sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
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
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )


def sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _token_stream(spark, sf_dir)
    cells = toks.select(
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
        ).alias("c")
    ).select("c.row_id", "c.bucket")
    sketch = cells.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
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


def sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
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
    ).localCheckpoint(eager=False)
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
    exact = li.agg(
        *[
            F.expr(f"percentile(l_extendedprice, {p})").alias(f"e{i}")
            for i, p in enumerate(Q_PROBES)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("p"), F.col(f"e{i}").alias("exact"))
                    for i, p in enumerate(Q_PROBES)
                ]
            )
        ).alias("s")
    ).select("s.p", F.round("s.exact", 6).alias("exact"))
    return (
        est.join(exact, "p")
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
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
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
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
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
