"""TPC-H workload suite — the reference's query set {01,02,03,04,06,12,13,14,
17,22} (reference src/tpch/headers/Query01.h .. Query22.h) rebuilt on the
operator algebra, plus a DuckDB oracle SQL string per query.

Column substitutions (driver testdata lacks partsupp and a few columns —
see FIXTURES.md): o_shippriority→o_orderpriority (q03), l_commitdate/
l_receiptdate→l_shipdate vs o_orderdate (q04), l_shipmode→l_returnflag (q12),
p_container→p_size (q17), c_phone country-code→c_nationkey (q22), and q02 is
re-anchored on supplier/nation/region min-acctbal-per-nation since partsupp
does not exist.  Shapes (join depth, agg structure, correlation pattern)
match the reference queries.

Every computed column is aliased identically in the Spark plan and the oracle
SQL — the driver's hash compare sorts columns by name.

Scale notes: dims (region/nation/supplier/part ≤ ~2M rows at 100 TB TPC-H
scale) broadcast; fact-fact joins (orders⋈lineitem) shuffle on the join key
and AQE handles skew.  No query here collects more than an aggregate's
result.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lachesis_spark.operators import core


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# ---------------------------------------------------------------------------
# Q01 — pricing summary report (reference src/tpch/headers/Query01.h:64-115:
# 6-field aggregate struct merged via operator+ → decomposed into native aggs;
# the map-side combiner is Spark partial aggregation).
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return core.aggregate(
        core.selection(li, F.col("l_shipdate") <= _ts("1998-09-02")),
        ["l_returnflag", "l_linestatus"],
        [
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ],
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q02 — min-cost supplier shape (reference src/tpch/headers/Query02.h uses
# partsupp min supplycost; driver data has no partsupp, so the correlated
# min is re-anchored: per nation in EUROPE, the supplier(s) with minimum
# s_acctbal).  Same shape: multi-join + correlated min + filter-to-min.
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = core.selection(_t(spark, sf_dir, "region"), F.col("r_name") == "EUROPE")
    joined = core.join(
        [sup, F.broadcast(nat), F.broadcast(reg)],
        equi=[
            F.col("s_nationkey") == F.col("n_nationkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ],
    )
    w = Window.partitionBy("n_nationkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("n_name", "s_name", F.col("s_acctbal").alias("min_acctbal"))
    )


Q02_SQL = """
WITH joined AS (
  SELECT n.n_nationkey, n.n_name, s.s_name, s.s_acctbal
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT n_name, s_name, s_acctbal AS min_acctbal
FROM joined
WHERE s_acctbal = (SELECT min(j2.s_acctbal) FROM joined j2
                   WHERE j2.n_nationkey = joined.n_nationkey)
"""


# ---------------------------------------------------------------------------
# Q03 — shipping priority (reference src/tpch/headers/Query03.h:48-175:
# customer(BUILDING) ⋈ orders ⋈ lineitem with date window, group by order,
# top-10 by revenue).  o_orderpriority stands in for o_shippriority.
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = core.selection(
        _t(spark, sf_dir, "customer"), F.col("c_mktsegment") == "BUILDING", ["c_custkey"]
    )
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        F.col("o_orderdate") < _ts("1998-03-15"),
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        F.col("l_shipdate") > _ts("1998-03-15"),
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = core.join(
        [li, orders, F.broadcast(cust)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        ],
    )
    agg = core.aggregate(
        joined,
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")],
    )
    return core.top_k(agg, 10, "revenue", tiebreak=["l_orderkey"])


Q03_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q04 — order priority checking (reference src/tpch/headers/Query04.h:
# orders with an EXISTS lineitem late-delivery probe, count per priority).
# l_shipdate > o_orderdate stands in for l_commitdate < l_receiptdate.
# Semi-join: Spark left_semi — the reference builds the same via join+distinct.
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        (F.col("o_orderdate") >= _ts("1996-07-01")) & (F.col("o_orderdate") < _ts("1996-10-01")),
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return core.aggregate(late, ["o_orderpriority"], [F.count(F.lit(1)).alias("order_count")])


Q04_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q06 — forecasting revenue change (reference src/tpch/headers/Query06.h:33-67:
# scan → conjunctive filter → global sum).  Single stage, no shuffle; the
# filter pushes down to the Parquet scan.
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    filtered = core.selection(
        li,
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24),
    )
    return core.aggregate(
        filtered, None, [F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")]
    )


Q06_SQL = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q06_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same query through the SQL entry point (spark.sql over registered
    views) — the front-end the reference lacks entirely (SURVEY.md §0: "no
    SQL parser").  The oracle text IS the query text: one ANSI-SQL string
    runs on both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(Q06_SQL)


# ---------------------------------------------------------------------------
# Q12 — shipping modes & order priority (reference src/tpch/headers/
# Query12.h:123-149: CASE-counting high/low priority per mode).
# l_returnflag stands in for l_shipmode.
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01")),
        ["l_orderkey", "l_returnflag"],
    )
    joined = core.join([li, orders], equi=[F.col("l_orderkey") == F.col("o_orderkey")])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return core.aggregate(
        joined,
        ["l_returnflag"],
        [
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        ],
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (reference src/tpch/headers/
# Query13.h).  Left outer join (beyond the reference's inner-only engine —
# the reference emulates it; Spark has it natively), two-level aggregation.
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        F.col("o_orderpriority") != "4-NOT SPECIFIED",
        ["o_orderkey", "o_custkey"],
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return core.aggregate(per_cust, ["c_count"], [F.count(F.lit(1)).alias("custdist")])


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                     AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect (reference src/tpch/headers/Query14.h: CASE share of
# revenue).  p_type='PROMO' matches driver data's categorical p_type.
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        (F.col("l_shipdate") >= _ts("1996-03-01")) & (F.col("l_shipdate") < _ts("1996-04-01")),
        ["l_partkey", "l_extendedprice", "l_discount"],
    )
    joined = core.join(
        [li, F.broadcast(part)], equi=[F.col("l_partkey") == F.col("p_partkey")]
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return core.aggregate(
        joined, None, [(100.0 * F.sum(promo) / F.sum(rev)).alias("promo_revenue")]
    )


Q14_SQL = """
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (reference src/tpch/headers/Query17.h:
# two-pass correlated aggregate: per-part avg quantity, then filter
# l_quantity < 0.2*avg).  p_size=5 stands in for p_container.
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = core.selection(
        _t(spark, sf_dir, "part"),
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 5),
        ["p_partkey"],
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = core.aggregate(
        li, ["l_partkey"], [(0.2 * F.avg("l_quantity")).alias("qty_threshold")]
    ).withColumnRenamed("l_partkey", "a_partkey")
    joined = core.join(
        [li, F.broadcast(part), F.broadcast(avg_qty)],
        equi=[
            F.col("l_partkey") == F.col("p_partkey"),
            F.col("l_partkey") == F.col("a_partkey"),
        ],
        theta=F.col("l_quantity") < F.col("qty_threshold"),
    )
    return core.aggregate(
        joined, None, [(F.sum("l_extendedprice") / 7.0).alias("avg_yearly")]
    )


Q17_SQL = """
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13' AND p.p_size <= 5
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (reference src/tpch/source/Query22/
# RunQuery22.cc:60: substring country code → here c_nationkey in-list),
# scalar subquery (avg positive balance) + anti-join (no orders).
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = core.selection(
        _t(spark, sf_dir, "customer"), F.col("c_nationkey").isin(nations)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        F.col("o_orderdate") >= _ts("1999-01-01"),
        ["o_custkey"],
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return core.aggregate(
        no_orders,
        ["c_nationkey"],
        [F.count(F.lit(1)).alias("numcust"), F.sum("c_acctbal").alias("totacctbal")],
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust, sum(c_acctbal) AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1,3,5,7,9,11,13)
  AND c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1,3,5,7,9,11,13))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


QUERIES = {
    "tpch_q01": q01,
    "tpch_q02": q02,
    "tpch_q03": q03,
    "tpch_q04": q04,
    "tpch_q06": q06,
    "tpch_q06_sql": q06_sql_frontend,
    "tpch_q12": q12,
    "tpch_q13": q13,
    "tpch_q14": q14,
    "tpch_q17": q17,
    "tpch_q22": q22,
}

ORACLE = {
    "tpch_q01": Q01_SQL,
    "tpch_q02": Q02_SQL,
    "tpch_q03": Q03_SQL,
    "tpch_q04": Q04_SQL,
    "tpch_q06": Q06_SQL,
    "tpch_q06_sql": Q06_SQL,
    "tpch_q12": Q12_SQL,
    "tpch_q13": Q13_SQL,
    "tpch_q14": Q14_SQL,
    "tpch_q17": Q17_SQL,
    "tpch_q22": Q22_SQL,
}
