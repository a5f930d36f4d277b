"""ANALYZE-style table profiling — the statistics a cost-based placement
or join-strategy decision consumes.

``profile_table`` computes, in ONE scan of the source, per-column:
row count, null count, exact distinct count, numeric min/max.  Multiple
``count(DISTINCT ...)`` aggregates in one Aggregate make Catalyst plan a
single pass with an Expand (one input row fans to one row per distinct
aggregate) — the same shape Spark's own ``ANALYZE TABLE ... COMPUTE
STATISTICS FOR COLUMNS`` uses, and the distributed analog of the
reference's per-set statistics collection.

Scale: the Expand multiplies the scanned rows by the number of profiled
columns before the partial aggregation absorbs them — still one scan and
one shuffle of (column × value-partials), no driver collect.  Profile 100
columns of a 100 TB table in column batches if the Expand factor matters;
each batch remains a single pass.

The profile feeds :func:`lachesis_spark.advisor.recommender.
recommend_join_strategy` via ``HistoryDB.record_job(key_stats=...)`` —
NDV + table bytes decide broadcast vs bucket vs plain shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.binding import base_table

PROFILE_COLS = [
    "o_orderstatus",
    "o_orderpriority",
    "o_custkey",
    "o_totalprice",
    "o_orderkey",
]


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column stats in one scan: (col, n_rows, n_nulls, n_distinct,
    min_num, max_num).  Non-numeric columns get NULL min/max (TRY_CAST)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.expr(f"try_cast({c} AS DOUBLE)")).alias(f"{c}__mn"),
            F.max(F.expr(f"try_cast({c} AS DOUBLE)")).alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = base_table(spark, sf_dir, "orders")
    return profile_table(orders, PROFILE_COLS)


def _profile_sql(table: str, cols: list[str]) -> str:
    parts = [
        f"""
  SELECT '{c}' AS col,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
         min(TRY_CAST({c} AS DOUBLE)) AS min_num,
         max(TRY_CAST({c} AS DOUBLE)) AS max_num
  FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


STATS_PROFILE_SQL = _profile_sql("orders", PROFILE_COLS)


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix in ONE scan — the dependence map a
# feature-selection / data-drift monitor reads.  For k columns, the single
# Aggregate carries k sums + k sums-of-squares + k(k-1)/2 cross-product
# sums; every one is a map-side partial, so a 1000-executor pass ships
# O(k²) doubles per task and the matrix assembles from one 1-row frame.
# The same sum-based estimator is mirrored verbatim in the oracle (rather
# than calling each engine's corr()) so both engines run identical
# arithmetic, not merely equivalent formulas.
CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = base_table(spark, sf_dir, "lineitem")
    cols = CORR_COLS
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast("double")).alias(f"{c}__s"))
        aggs.append(F.sum(F.col(c).cast("double") * F.col(c).cast("double")).alias(f"{c}__ss"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(f"{a}__{b}__sp")
            )
    one = li.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("__n")
        cov = F.col(f"{a}__{b}__sp") - F.col(f"{a}__s") * F.col(f"{b}__s") / n
        va = F.col(f"{a}__ss") - F.col(f"{a}__s") * F.col(f"{a}__s") / n
        vb = F.col(f"{b}__ss") - F.col(f"{b}__s") * F.col(f"{b}__s") / n
        return F.round(cov / F.sqrt(va * vb), 6)

    structs = [
        F.struct(F.lit(a).alias("c1"), F.lit(b).alias("c2"), _corr(a, b).alias("corr"))
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .orderBy("c1", "c2")
    )


def _corr_matrix_sql(table: str, cols: list[str]) -> str:
    aggs = ["CAST(count(*) AS DOUBLE) AS __n"]
    for c in cols:
        aggs.append(f"sum(CAST({c} AS DOUBLE)) AS {c}__s")
        aggs.append(f"sum(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE)) AS {c}__ss")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(f"sum(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE)) AS {a}__{b}__sp")
    sel = " UNION ALL ".join(
        f"""
  SELECT '{a}' AS c1, '{b}' AS c2,
         round(({a}__{b}__sp - {a}__s * {b}__s / __n)
               / sqrt(({a}__ss - {a}__s * {a}__s / __n)
                      * ({b}__ss - {b}__s * {b}__s / __n)), 6) AS corr
  FROM m"""
        for a, b in pairs
    )
    return f"WITH m AS (SELECT {', '.join(aggs)} FROM {table})\nSELECT * FROM ({sel}) ORDER BY c1, c2"


STATS_CORR_SQL = _corr_matrix_sql("lineitem", CORR_COLS)


# ---------------------------------------------------------------------------
# Deequ-style data-quality checks — the constraint suite a pipeline runs
# before shipping a batch: completeness, key uniqueness, value ranges,
# domain membership, cross-column consistency, referential integrity.
# Each intra-table metric folds into ONE multi-aggregate scan of its
# table (conditional sums — map-side combined, no shuffle of rows); the
# referential-integrity check is the one key-shuffle (anti-join on the
# FK), which is the minimum any orphan count costs.  Output is a
# constraint-sized report frame: (check, metric, passed).
DQ_MIN_PASS = {
    "orders.custkey_completeness": 1.0,
    "orders.orderkey_uniqueness": 1.0,
    "orders.totalprice_positive": 1.0,
    "orders.status_in_domain": 1.0,
    "lineitem.quantity_positive": 1.0,
    "lineitem.orderkey_ri": 1.0,
}


def stats_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = base_table(spark, sf_dir, "orders")
    li = base_table(spark, sf_dir, "lineitem")
    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("ck_nn"),
        F.countDistinct("o_orderkey").alias("ok_nd"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias("tp_pos"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("st_dom"),
    )
    l = li.agg(
        F.count(F.lit(1)).alias("ln"),
        F.sum(F.when(F.col("l_quantity") > 0, 1).otherwise(0)).alias("qty_pos"),
    )
    orphans = (
        li.select(F.col("l_orderkey").alias("k"))
        .join(orders.select(F.col("o_orderkey").alias("k")), "k", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    one = o.crossJoin(l).crossJoin(orphans)
    checks = [
        ("orders.custkey_completeness", F.col("ck_nn") / F.col("n")),
        ("orders.orderkey_uniqueness", F.col("ok_nd") / F.col("n")),
        ("orders.totalprice_positive", F.col("tp_pos") / F.col("n")),
        ("orders.status_in_domain", F.col("st_dom") / F.col("n")),
        ("lineitem.quantity_positive", F.col("qty_pos") / F.col("ln")),
        ("lineitem.orderkey_ri", F.lit(1.0) - F.col("n_orphans") / F.col("ln")),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("check_name"),
            F.round(expr.cast("double"), 6).alias("metric"),
            (F.round(expr.cast("double"), 6) >= DQ_MIN_PASS[name]).alias("passed"),
        )
        for name, expr in checks
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .orderBy("check_name")
    )


STATS_DQ_SQL = """
WITH o AS (
  SELECT count(*) AS n,
         count(o_custkey) AS ck_nn,
         count(DISTINCT o_orderkey) AS ok_nd,
         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS tp_pos,
         sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS st_dom
  FROM orders
), l AS (
  SELECT count(*) AS ln,
         sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS qty_pos
  FROM lineitem
), orph AS (
  SELECT count(*) AS n_orphans
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
), m AS (
  SELECT * FROM o, l, orph
)
SELECT check_name, metric, metric >= 1.0 AS passed FROM (
  SELECT 'orders.custkey_completeness' AS check_name, round(ck_nn / n::DOUBLE, 6) AS metric FROM m
  UNION ALL SELECT 'orders.orderkey_uniqueness', round(ok_nd / n::DOUBLE, 6) FROM m
  UNION ALL SELECT 'orders.totalprice_positive', round(tp_pos / n::DOUBLE, 6) FROM m
  UNION ALL SELECT 'orders.status_in_domain', round(st_dom / n::DOUBLE, 6) FROM m
  UNION ALL SELECT 'lineitem.quantity_positive', round(qty_pos / ln::DOUBLE, 6) FROM m
  UNION ALL SELECT 'lineitem.orderkey_ri', round(1.0 - n_orphans / ln::DOUBLE, 6) FROM m
)
ORDER BY check_name
"""


QUERIES = {
    "stats_profile": stats_profile,
    "stats_corr_matrix": stats_corr_matrix,
    "stats_dq_checks": stats_dq_checks,
}
ORACLE = {
    "stats_profile": STATS_PROFILE_SQL,
    "stats_corr_matrix": STATS_CORR_SQL,
    "stats_dq_checks": STATS_DQ_SQL,
}
