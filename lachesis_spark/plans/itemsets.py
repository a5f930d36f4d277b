"""Frequent-itemset mining over order baskets: pair co-occurrence counts
and association rules (support / confidence / lift).

Part of the beyond-reference analytics surface (SURVEY §2.8): the
reference's JoinComp+AggregateComp algebra (src/computations/headers/
JoinComp.h, AggregateComp.h) expresses exactly this self-join-then-count
shape; here it is the classic A-priori candidate-pair pass (Agrawal &
Srikant, VLDB'94) restated as two DataFrame joins.

Scale design — why this holds at 100 TB:

- **The quadratic term is per-basket, not per-table.** The pair
  generation is a self-join of (basket, item) keyed on the basket id, so
  each basket contributes |basket|² / 2 rows.  Retail-shaped baskets are
  small and bounded (TPC-H orders average ~4 line items; the cap is
  enforced by ``BASKET_CAP`` for adversarial inputs), so the join output
  is a small constant times the corpus — linear, co-partitioned on the
  basket key, no broadcast needed.
- **A-priori item pruning cuts the stream before the join.**  An item
  below the support floor cannot appear in a frequent pair, so both join
  sides are pre-filtered by a frequency semi-join (map-side with Spark's
  runtime bloom filter / broadcast when the frequent-item set is small).
  The floor is a FRACTION of basket count, not an absolute, so the same
  query text is meaningful at every scale factor.
- **Rule scoring touches only pair-survivors.**  Confidence/lift join the
  (tiny) frequent-pair frame back to the item-frequency frame — two
  broadcast-sized joins after aggregation, never a re-scan of baskets.

Oracle: the whole computation is plain SQL (self-join + GROUP BY + two
dim joins), mirrored verbatim in DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.binding import base_table

from lachesis_spark.operators.core import barrier as _barrier

TOP_K = 25
MIN_ITEM_FRAC = 0.0005   # item must appear in >= 0.05% of baskets
MIN_PAIR_COUNT = 2       # a pair seen once is noise at any scale
BASKET_CAP = 64          # defensive bound on the per-basket quadratic term


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(basket id, item) pairs: distinct parts per order, baskets larger
    than BASKET_CAP dropped (bounds the per-basket quadratic term; TPC-H
    baskets max out at 7, so the cap is dormant here and exists for
    adversarial distributions)."""
    li = base_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
    ).distinct()
    sizes = b.groupBy("oid").agg(F.count(F.lit(1)).alias("bsz"))
    return b.join(sizes.filter(F.col("bsz") <= BASKET_CAP).select("oid"), "oid")


def _frequent_items(b: DataFrame) -> DataFrame:
    """Items above the support floor (fraction of distinct baskets).

    The floor stays IN-PLAN: the 1-row basket-count aggregate broadcasts
    into the filter, so building the frame runs no driver action and the
    whole query stays lazy.  ``floor()`` (truncation) is explicit in both
    engines — a bare BIGINT cast truncates in Python but rounds in DuckDB,
    a divergence that would silently flip the threshold whenever
    n_baskets · frac lands on .5."""
    nb = b.select("oid").distinct().agg(
        F.greatest(
            F.lit(2).cast("long"),
            F.floor(F.count(F.lit(1)) * F.lit(MIN_ITEM_FRAC)).cast("long"),
        ).alias("floor")
    )
    return (
        b.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("item_cnt"))
        .join(F.broadcast(nb))
        .filter(F.col("item_cnt") >= F.col("floor"))
        .select("item", "item_cnt")
    )


def pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence counts of frequent-item pairs within baskets."""
    b = _baskets(spark, sf_dir).transform(_barrier)
    freq = _frequent_items(b)
    fb = b.join(freq.select("item"), "item")  # A-priori prune before the self-join
    left = fb.select("oid", F.col("item").alias("p1"))
    right = fb.select("oid", F.col("item").alias("p2"))
    return (
        left.join(right, "oid")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= MIN_PAIR_COUNT)
    )


def itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k co-occurring part pairs by basket count (deterministic order)."""
    return (
        pair_counts(spark, sf_dir)
        .orderBy(F.desc("pair_cnt"), "p1", "p2")
        .limit(TOP_K)
    )


def itemset_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules p1 -> p2 over the frequent pairs: support,
    confidence and lift, top-k by lift.

    Both directions of each unordered pair are emitted (confidence is
    asymmetric); support/lift are symmetric and repeat on both rows.
    """
    b = _baskets(spark, sf_dir).transform(_barrier)
    nb = b.select("oid").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    freq = _frequent_items(b).transform(_barrier)
    fb = b.join(freq.select("item"), "item")
    pairs = (
        fb.select("oid", F.col("item").alias("p1"))
        .join(fb.select("oid", F.col("item").alias("p2")), "oid")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= MIN_PAIR_COUNT)
    )
    both = pairs.unionAll(
        pairs.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"), "pair_cnt")
    )
    scored = (
        both.join(freq.select(F.col("item").alias("p1"), F.col("item_cnt").alias("c1")), "p1")
        .join(freq.select(F.col("item").alias("p2"), F.col("item_cnt").alias("c2")), "p2")
        .join(F.broadcast(nb))
        .select(
            "p1",
            "p2",
            "pair_cnt",
            F.round(F.col("pair_cnt") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("pair_cnt") / F.col("c1"), 6).alias("confidence"),
            F.round(
                (F.col("pair_cnt") * F.col("n_baskets")) / (F.col("c1") * F.col("c2")), 6
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "p1", "p2").limit(TOP_K)


def _oracle_common(topk: int = TOP_K) -> str:
    return f"""
WITH baskets0 AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem
), baskets AS (
  SELECT b.oid, b.item FROM baskets0 b
  JOIN (SELECT oid FROM baskets0 GROUP BY oid HAVING count(*) <= {BASKET_CAP}) ok
    ON b.oid = ok.oid
), n AS (
  SELECT count(DISTINCT oid) AS n_baskets FROM baskets
), freq AS (
  SELECT item, count(*)::BIGINT AS item_cnt
  FROM baskets GROUP BY item
  HAVING count(*) >= greatest(2, CAST(floor((SELECT n_baskets FROM n) * {MIN_ITEM_FRAC}) AS BIGINT))
), fb AS (
  SELECT b.oid, b.item FROM baskets b JOIN freq f ON b.item = f.item
), pairs AS (
  SELECT a.item AS p1, c.item AS p2, count(*)::BIGINT AS pair_cnt
  FROM fb a JOIN fb c ON a.oid = c.oid AND a.item < c.item
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_COUNT}
)"""


ORACLE_PAIRS = (
    _oracle_common()
    + f"""
SELECT p1, p2, pair_cnt FROM pairs
ORDER BY pair_cnt DESC, p1, p2 LIMIT {TOP_K}
"""
)

ORACLE_RULES = (
    _oracle_common()
    + f"""

, pboth AS (
  SELECT p1, p2, pair_cnt FROM pairs
  UNION ALL
  SELECT p2 AS p1, p1 AS p2, pair_cnt FROM pairs
)
SELECT b.p1, b.p2, b.pair_cnt,
       round(b.pair_cnt / (SELECT n_baskets FROM n)::DOUBLE, 6) AS support,
       round(b.pair_cnt / f1.item_cnt::DOUBLE, 6) AS confidence,
       round(b.pair_cnt * (SELECT n_baskets FROM n)::DOUBLE
             / (f1.item_cnt * f2.item_cnt), 6) AS lift
FROM pboth b
JOIN freq f1 ON b.p1 = f1.item
JOIN freq f2 ON b.p2 = f2.item
ORDER BY lift DESC, b.p1, b.p2 LIMIT {TOP_K}
"""
)


QUERIES = {
    "itemset_pairs": itemset_pairs,
    "itemset_rules": itemset_rules,
}

ORACLE = {
    "itemset_pairs": ORACLE_PAIRS,
    "itemset_rules": ORACLE_RULES,
}
