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

Scale notes — broadcast policy: explicit ``broadcast()`` hints only on sides
that are provably bounded at ANY scale factor (region=5 rows, nation=25
rows, 1-row scalar aggregates).  customer/supplier/part and filtered or
pre-aggregated derivatives grow with SF, so they carry NO hint: AQE
broadcasts them at runtime while their measured size is under the
threshold and falls back to a shuffled join beyond it — a forced hint
would OOM the build side at 1000×.  Fact-fact joins (orders⋈lineitem)
shuffle on the join key and AQE handles skew.  No query here collects
more than an aggregate's result.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lachesis_spark.operators import core

from lachesis_spark.binding import base_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return base_table(spark, sf_dir, name)


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
        [li, orders, cust],
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
        [li, part], equi=[F.col("l_partkey") == F.col("p_partkey")]
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
        [li, part, avg_qty],
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


# ---------------------------------------------------------------------------
# Q05 — local supplier volume (TPC-H spec 2.8; beyond the reference's set —
# it stops at {01,02,03,04,06,12,13,14,17,22}).  Six-way join where customer
# and supplier must share a nation; classic star-join: region/nation/supplier
# broadcast, orders⋈lineitem shuffles on the order key.
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01")),
        ["o_orderkey", "o_custkey"],
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = core.selection(_t(spark, sf_dir, "region"), F.col("r_name") == "ASIA", ["r_regionkey"])
    joined = core.join(
        [li, orders, cust, sup, F.broadcast(nat), F.broadcast(reg)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ],
        theta=F.col("c_nationkey") == F.col("s_nationkey"),
    )
    return core.aggregate(
        joined,
        ["n_name"],
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")],
    )


Q05_SQL = """
SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Q07 — volume shipping between two nations (TPC-H spec 2.10).  The nation
# dimension joins twice under two roles (supplier side / customer side) with
# a symmetric pair predicate; grouped by both nations and ship year.
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01")),
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = core.join(
        [li, orders, cust, sup, F.broadcast(n1), F.broadcast(n2)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            F.col("s_nationkey") == F.col("n1_key"),
            F.col("c_nationkey") == F.col("n2_key"),
        ],
        theta=pair,
    )
    return core.aggregate(
        joined.withColumn("l_year", F.year("l_shipdate").cast("long")),
        ["supp_nation", "cust_nation", "l_year"],
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")],
    )


Q07_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q08 — national market share (TPC-H spec 2.11).  Eight-way join; the share
# is a conditional-sum-over-sum per order year.  p_type='ECONOMY' stands in
# for the spec's long type string.
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = core.selection(_t(spark, sf_dir, "part"), F.col("p_type") == "ECONOMY", ["p_partkey"])
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01")),
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    reg = core.selection(_t(spark, sf_dir, "region"), F.col("r_name") == "AMERICA", ["r_regionkey"])
    joined = core.join(
        [li, orders, cust, part, sup, F.broadcast(n1), F.broadcast(n2), F.broadcast(reg)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            F.col("c_nationkey") == F.col("n1_key"),
            F.col("s_nationkey") == F.col("n2_key"),
            F.col("n1_region") == F.col("r_regionkey"),
        ],
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return core.aggregate(
        joined.withColumn("o_year", F.year("o_orderdate").cast("long")),
        ["o_year"],
        [(F.sum(nation_vol) / F.sum(vol)).alias("mkt_share")],
    )


Q08_SQL = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CASE WHEN n2.n_name = 'NATION_5'
                THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)) AS mkt_share
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q09 — product type profit (TPC-H spec 2.12).  Driver data has no partsupp,
# so ps_supplycost is proxied as 0.1 * p_retailprice (FIXTURES.md); profit
# shape (revenue minus cost*qty, grouped by supplier nation and year) is
# unchanged.  p_type='STANDARD' stands in for p_name LIKE '%green%'.
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = core.selection(
        _t(spark, sf_dir, "part"), F.col("p_type") == "STANDARD", ["p_partkey", "p_retailprice"]
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = core.join(
        [li, orders, part, sup, F.broadcast(nat)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ],
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return core.aggregate(
        joined.withColumn("o_year", F.year("o_orderdate").cast("long")),
        ["n_name", "o_year"],
        [F.sum(profit).alias("sum_profit")],
    )


Q09_SQL = """
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(l.l_extendedprice * (1 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity) AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_type = 'STANDARD'
GROUP BY n.n_name, o_year
"""


# ---------------------------------------------------------------------------
# Q10 — returned item reporting (TPC-H spec 2.13).  Top-20 customers by
# lost revenue on returned items in a quarter.  c_phone/c_address/c_comment
# do not exist in driver data and are dropped from the projection.
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        (F.col("o_orderdate") >= _ts("1996-10-01")) & (F.col("o_orderdate") < _ts("1997-01-01")),
        ["o_orderkey", "o_custkey"],
    )
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        F.col("l_returnflag") == "R",
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = core.join(
        [li, orders, cust, F.broadcast(nat)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ],
    )
    agg = core.aggregate(
        joined,
        ["c_custkey", "c_name", "c_acctbal", "n_name"],
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")],
    )
    return core.top_k(agg, 20, "revenue", tiebreak=["c_custkey"])


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — important stock identification (TPC-H spec 2.14).  partsupp does not
# exist, so part value is re-anchored on shipped lineitem revenue for
# suppliers of one nation; the shape — per-key value vs a scalar fraction of
# the global total (group-by + HAVING over a scalar subquery) — is unchanged.
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = core.selection(
        _t(spark, sf_dir, "supplier"), F.col("s_nationkey") == 7, ["s_suppkey"]
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    joined = core.join([li, sup], equi=[F.col("l_suppkey") == F.col("s_suppkey")])
    per_part = core.aggregate(
        joined,
        ["l_partkey"],
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value")],
    )
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS part_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey = 7
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > 0.001 * (SELECT sum(part_value) FROM per_part)
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (TPC-H spec 2.18).  The spec's revenue VIEW is a CTE /
# derived DataFrame; suppliers whose quarterly revenue equals the max.
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01")),
        ["l_suppkey", "l_extendedprice", "l_discount"],
    )
    revenue = core.aggregate(
        li,
        ["l_suppkey"],
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")],
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (TPC-H spec 2.19).  partsupp is
# re-anchored on the distinct (l_partkey, l_suppkey) pairs actually shipped;
# the spec's complaints-supplier exclusion becomes s_acctbal < 0 (driver
# data has no s_comment).  Shape: anti-join exclusion + count-distinct per
# part attribute group.
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = core.distinct_by(
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey"),
        ["l_partkey", "l_suppkey"],
    )
    part = core.selection(
        _t(spark, sf_dir, "part"),
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45),
        ["p_partkey", "p_brand", "p_type", "p_size"],
    )
    bad_sup = core.selection(
        _t(spark, sf_dir, "supplier"), F.col("s_acctbal") < 0.0, ["s_suppkey"]
    )
    kept = pairs.join(
        bad_sup, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    joined = core.join([kept, part], equi=[F.col("l_partkey") == F.col("p_partkey")])
    return core.aggregate(
        joined,
        ["p_brand", "p_type", "p_size"],
        [F.countDistinct("l_suppkey").alias("supplier_cnt")],
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q18 — large volume customers (TPC-H spec 2.21).  Orders whose total
# quantity exceeds 300, joined back to customer; the HAVING subquery is a
# grouped aggregate semi-joined to the fact — no row explosion.
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = core.aggregate(
        li, ["l_orderkey"], [F.sum("l_quantity").alias("total_qty")]
    ).filter(F.col("total_qty") > 300.0)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = core.join(
        [orders, big, cust],
        equi=[
            F.col("o_orderkey") == F.col("l_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        ],
    )
    out = joined.select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    return core.top_k(out, 100, "o_totalprice", tiebreak=["o_orderkey"])


Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       t.total_qty
FROM orders o
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0) t
  ON o.o_orderkey = t.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (TPC-H spec 2.22).  Disjunction of three
# conjunctive brackets over part and lineitem attributes — the classic
# OR-of-ANDs join predicate Catalyst splits into a common equi-join plus a
# residual filter.  l_shipmode/l_shipinstruct don't exist and are dropped.
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    joined = core.join(
        [li, part], equi=[F.col("l_partkey") == F.col("p_partkey")], theta=bracket
    )
    return core.aggregate(
        joined,
        None,
        [F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")],
    )


Q19_SQL = """
SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (TPC-H spec 2.23).  partsupp availqty is
# re-anchored: (part, supplier) pairs whose shipped 1996 quantity exceeds a
# threshold stand in for ps_availqty > ½ yearly demand; the nested
# semi-join chain (supplier ← pairs ← part) is the spec's shape.
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_part = core.selection(
        _t(spark, sf_dir, "part"), F.col("p_type") == "SMALL", ["p_partkey"]
    )
    li = core.selection(
        _t(spark, sf_dir, "lineitem"),
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01")),
        ["l_partkey", "l_suppkey", "l_quantity"],
    )
    heavy_pairs = core.aggregate(
        li, ["l_partkey", "l_suppkey"], [F.sum("l_quantity").alias("qty_supplied")]
    ).filter(F.col("qty_supplied") > 50.0)
    promo_pairs = heavy_pairs.join(
        small_part, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    sup = core.selection(
        _t(spark, sf_dir, "supplier"), F.col("s_nationkey") == 3, ["s_suppkey", "s_name", "s_acctbal"]
    )
    return sup.join(
        promo_pairs, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier s
WHERE s.s_nationkey = 3
  AND s.s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
    GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > 50.0)
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (TPC-H spec 2.24).  "Late" is
# l_shipdate > o_orderdate + 90 days (no commit/receipt dates in driver
# data).  The spec's EXISTS(other supplier) / NOT EXISTS(other late
# supplier) pair is computed distributively as per-order distinct-supplier
# counts — one shuffle instead of two correlated self-joins.
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = core.selection(
        _t(spark, sf_dir, "orders"),
        F.col("o_orderstatus") == "F",
        ["o_orderkey", "o_orderdate"],
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = core.join([li, orders], equi=[F.col("l_orderkey") == F.col("o_orderkey")])
    lo = lo.withColumn(
        "is_late", (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).cast("int")
    )
    per_order = core.aggregate(
        lo,
        ["o_orderkey"],
        [
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
        ],
    )
    sole_late_orders = core.selection(
        per_order, (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1), ["o_orderkey"]
    ).withColumnRenamed("o_orderkey", "so_orderkey")
    late_lines = core.selection(lo, F.col("is_late") == 1, ["l_orderkey", "l_suppkey"])
    culprits = late_lines.join(
        sole_late_orders, F.col("l_orderkey") == F.col("so_orderkey"), "left_semi"
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    named = core.join(
        [culprits, sup],
        equi=[F.col("l_suppkey") == F.col("s_suppkey")],
        theta=F.col("s_nationkey") == 5,
    )
    numwait = core.aggregate(
        core.distinct_by(named.select("s_name", "l_orderkey"), ["s_name", "l_orderkey"]),
        ["s_name"],
        [F.count(F.lit(1)).alias("numwait")],
    )
    return core.top_k(numwait, 100, "numwait", tiebreak=["s_name"])


Q21_SQL = """
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY l_orderkey
)
SELECT s.s_name, count(*) AS numwait
FROM (SELECT DISTINCT lo.l_suppkey, lo.l_orderkey
      FROM lo JOIN per_order po ON lo.l_orderkey = po.l_orderkey
      WHERE lo.is_late = 1 AND po.n_supp >= 2 AND po.n_late_supp = 1) c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
WHERE s.s_nationkey = 5
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


QUERIES = {
    "tpch_q01": q01,
    "tpch_q02": q02,
    "tpch_q03": q03,
    "tpch_q04": q04,
    "tpch_q05": q05,
    "tpch_q06": q06,
    "tpch_q06_sql": q06_sql_frontend,
    "tpch_q07": q07,
    "tpch_q08": q08,
    "tpch_q09": q09,
    "tpch_q10": q10,
    "tpch_q11": q11,
    "tpch_q12": q12,
    "tpch_q13": q13,
    "tpch_q14": q14,
    "tpch_q15": q15,
    "tpch_q16": q16,
    "tpch_q17": q17,
    "tpch_q18": q18,
    "tpch_q19": q19,
    "tpch_q20": q20,
    "tpch_q21": q21,
    "tpch_q22": q22,
}

ORACLE = {
    "tpch_q01": Q01_SQL,
    "tpch_q02": Q02_SQL,
    "tpch_q03": Q03_SQL,
    "tpch_q04": Q04_SQL,
    "tpch_q05": Q05_SQL,
    "tpch_q06": Q06_SQL,
    "tpch_q06_sql": Q06_SQL,
    "tpch_q07": Q07_SQL,
    "tpch_q08": Q08_SQL,
    "tpch_q09": Q09_SQL,
    "tpch_q10": Q10_SQL,
    "tpch_q11": Q11_SQL,
    "tpch_q12": Q12_SQL,
    "tpch_q13": Q13_SQL,
    "tpch_q14": Q14_SQL,
    "tpch_q15": Q15_SQL,
    "tpch_q16": Q16_SQL,
    "tpch_q17": Q17_SQL,
    "tpch_q18": Q18_SQL,
    "tpch_q19": Q19_SQL,
    "tpch_q20": Q20_SQL,
    "tpch_q21": Q21_SQL,
    "tpch_q22": Q22_SQL,
}
