"""Operator-inventory queries — one driver-checkable (query, oracle) pair per
SURVEY.md §2.1 Computation, exercised on the driver testdata.

These are the parity probes for the reference's public algebra
(reference src/lambdas/headers/Computation.h): each query uses exactly one
operator (plus minimal scaffolding) so a failure localizes to that operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.operators import core

from lachesis_spark.binding import base_table

from lachesis_spark.operators.core import barrier as _barrier


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return base_table(spark, sf_dir, name)


# -- SelectionComp (reference SelectionComp.h:12-23) ------------------------
def op_selection(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return core.selection(
        li,
        (F.col("l_discount") > 0.05) & (F.col("l_quantity") < 10),
        [
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        ],
    )


OP_SELECTION_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 10
"""


# -- MultiSelectionComp + FLATTEN (reference MultiSelectionComp.h:15-24) ----
def op_multi_selection(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    exploded = core.multi_selection(
        docs,
        F.col("n_chars") > 200,
        F.split(F.col("text"), " "),
        extra_cols=["doc_id"],
        out_name="token",
    )
    return exploded.filter(F.col("token") != "")


OP_MULTI_SELECTION_SQL = """
SELECT doc_id, token FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE n_chars > 200
) WHERE token <> ''
"""


# -- AggregateComp with operator+ decomposition (reference Avg.h:11-35) -----
def op_aggregate(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return core.aggregate(
        cust,
        ["c_mktsegment"],
        [
            F.sum("c_acctbal").alias("total_bal"),
            F.count(F.lit(1)).alias("cnt"),
            F.avg("c_acctbal").alias("avg_bal"),
        ],
    )


OP_AGGREGATE_SQL = """
SELECT c_mktsegment, sum(c_acctbal) AS total_bal, count(*) AS cnt,
       avg(c_acctbal) AS avg_bal
FROM customer GROUP BY c_mktsegment
"""


# -- JoinComp: variadic multi-way with theta residue (JoinComp.h:43) --------
def op_join_multiway(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = core.join(
        [li, orders, F.broadcast(cust), F.broadcast(nation)],
        equi=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ],
        theta=F.col("l_shipdate") > F.col("o_orderdate"),
    )
    # total_price is rounded to cents: at sf>=0.1 the ~6e8 double sum differs
    # from the oracle's by one ULP (summation order), which is noise, not
    # semantics — same policy as tpch_q03's revenue column.
    return core.aggregate(
        joined,
        ["n_name"],
        [F.count(F.lit(1)).alias("n_lines"),
         F.round(F.sum("l_extendedprice"), 2).alias("total_price")],
    )


OP_JOIN_MULTIWAY_SQL = """
SELECT n_name, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS total_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY n_name
"""


# -- PartitionComp (PartitionComp.h:13-35): repartition is semantically
#    transparent; the query proves the partitioned stream aggregates
#    partition-locally to the same result.
def op_partition(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    parted = core.partition(li, ["l_suppkey"], num_partitions=16)
    return core.aggregate(
        parted, ["l_suppkey"], [F.count(F.lit(1)).alias("n_lines"),
                                F.sum("l_quantity").alias("total_qty")]
    )


OP_PARTITION_SQL = """
SELECT l_suppkey, count(*) AS n_lines, sum(l_quantity) AS total_qty
FROM lineitem GROUP BY l_suppkey
"""


# -- TopKComp global (TopKComp.h:21-37) -------------------------------------
def op_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return core.top_k(
        orders.select("o_orderkey", "o_totalprice"), 15, "o_totalprice",
        tiebreak=["o_orderkey"],
    )


OP_TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
"""


# -- grouped top-k (keyed TopKComp shape) -----------------------------------
def op_topk_grouped(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return core.top_k_per_group(
        cust.select("c_mktsegment", "c_custkey", "c_acctbal"),
        3, ["c_mktsegment"], "c_acctbal", tiebreak=["c_custkey"],
    )


OP_TOPK_GROUPED_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
) WHERE rk <= 3
"""


# -- Count (Count.h:16) -----------------------------------------------------
def op_count(spark, sf_dir):
    return core.count_all(_t(spark, sf_dir, "lineitem"))


OP_COUNT_SQL = "SELECT count(*) AS cnt FROM lineitem"


# -- distinct = group-by-key (SURVEY.md §2.8) -------------------------------
def op_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return core.distinct_by(li, ["l_returnflag", "l_linestatus"])


OP_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# -- TopJaccard similarity search (reference src/tpchBench/headers/
#    TopJaccard.h:15-37: per-customer part-set Jaccard vs a query part-set,
#    merged through TopKComp).  Query set = parts bought by customer 1.
def op_jaccard_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # cp feeds three consumers (q_size's count, the broadcast build of q,
    # and the scored side) — un-materialized, each re-ran the join +
    # distinct from the parquet scans.  The lazy localCheckpoint computes
    # the distinct pair set once; all three read the persisted RDD.
    cp = (
        core.join([li, orders], equi=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
        .transform(_barrier)
    )
    q = cp.filter(F.col("custkey") == 1).select(F.col("partkey").alias("q_partkey"))
    q_size = q.count()  # tiny driver-side scalar, same as the reference's query set
    scored = (
        cp.filter(F.col("custkey") != 1)
        .join(F.broadcast(q), F.col("partkey") == F.col("q_partkey"), "left")
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.count("q_partkey").alias("inter"),
        )
        .select(
            "custkey",
            (F.col("inter") / (F.col("sz") + F.lit(q_size) - F.col("inter"))).alias("jaccard"),
        )
    )
    return core.top_k(scored, 10, "jaccard", tiebreak=["custkey"])


OP_JACCARD_SQL = """
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
q AS (SELECT partkey FROM cp WHERE custkey = 1),
scored AS (
  SELECT cp.custkey,
         count(*) AS sz,
         count(CASE WHEN cp.partkey IN (SELECT partkey FROM q) THEN 1 END) AS inter
  FROM cp WHERE cp.custkey <> 1 GROUP BY cp.custkey
)
SELECT custkey,
       CAST(inter AS DOUBLE) / (sz + (SELECT count(*) FROM q) - inter) AS jaccard
FROM scored
ORDER BY jaccard DESC, custkey ASC LIMIT 10
"""


# -- nested object model round-trip: roll customer's orders into an array of
#    structs (reference nested model Customer.h:25-37 / Order.h:23-26), then
#    FLATTEN back and aggregate (CustomerMultiSelection.h:17-50 pipeline).
def op_nested_explode(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    nested = orders.groupBy("o_custkey").agg(
        F.collect_list(F.struct("o_orderkey", "o_totalprice")).alias("orders")
    )
    exploded = core.multi_selection(
        nested, None, "orders", extra_cols=["o_custkey"], out_name="o"
    )
    return core.aggregate(
        exploded,
        ["o_custkey"],
        [F.count(F.lit(1)).alias("n_orders"), F.sum("o.o_totalprice").alias("total_spend")],
    )


OP_NESTED_EXPLODE_SQL = """
SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spend
FROM orders GROUP BY o_custkey
"""


# -- two-level nested object model: Customer{ Vector<Order{ Vector<LineItem>
#    }> } (reference src/tpchBench/headers/Customer.h:25-37, Order.h:23-26)
#    built from the flat tables, then both levels FLATTENed back and
#    aggregated — the tpchBench UDF-centric pipeline shape.  The doubly
#    nested build costs two shuffles (lineitems→orders, orders→customers);
#    the explode side is shuffle-free.  At 100 TB the nested form is the
#    *storage* layout (one parquet struct column), so only the explode side
#    runs per query.
def op_nested_two_level(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Attach o_custkey FIRST (Catalyst broadcasts the 10× smaller orders
    # side at this scale; at 100 TB it sizes the join itself), then ONE
    # hash shuffle on o_custkey serves BOTH nesting levels: the
    # (o_custkey, o_orderkey) collect is satisfied by hash(o_custkey) —
    # ClusteredDistribution accepts a subset of the grouping keys — and
    # the customer-level collect rides the same partitioning.  The old
    # form shuffled lineitem-sized data twice (collect_list on
    # l_orderkey, then the order structs on o_custkey); this moves the
    # rows once (guide §2.4 — share one exchange between same-key ops).
    flat = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    order_nested = (
        flat.repartition("o_custkey")
        .groupBy("o_custkey", "o_orderkey")
        .agg(F.collect_list(F.struct("l_quantity", "l_extendedprice")).alias("lineItems"))
        .select("o_custkey", F.struct("o_orderkey", "lineItems").alias("order"))
    )
    cust_nested = order_nested.groupBy("o_custkey").agg(
        F.collect_list("order").alias("orders")
    )
    # FLATTEN twice: customers → orders → lineitems
    lvl1 = core.multi_selection(
        cust_nested, None, "orders", extra_cols=["o_custkey"], out_name="o"
    )
    lvl2 = core.multi_selection(
        lvl1, None, "o.lineItems", extra_cols=["o_custkey"], out_name="l"
    )
    return core.aggregate(
        lvl2,
        ["o_custkey"],
        [
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum("l.l_quantity").alias("sum_qty"),
            F.sum("l.l_extendedprice").alias("sum_price"),
        ],
    )


OP_NESTED_TWO_LEVEL_SQL = """
SELECT o.o_custkey, count(*) AS n_lineitems,
       sum(l.l_quantity) AS sum_qty, sum(l.l_extendedprice) AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey
"""


# -- Map<K,V> surface (reference PDBMap.h:16 / PairArray.h:53): parse the
#    events JSON payload into a MapType column, explode its entries, and
#    aggregate per key — the map round-trip the reference's PairArray hash
#    map supports, on engine types.
def op_map_explode(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    # single-file testdata scans as one split; floor the parallelism so the
    # JSON parse (the expensive part) uses every core — no-op at scale where
    # the scan already yields >= cores splits
    narrow = core.parallelism_floor(ev.select("event_type", "props"), spark)
    parsed = narrow.select(
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("m"),
    )
    entries = parsed.select(
        "event_type", F.explode("m").alias("key", "val")
    )
    return core.aggregate(
        entries,
        ["event_type", "key"],
        [F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val")],
    )


OP_MAP_EXPLODE_SQL = """
SELECT event_type, 'k' AS key, count(*) AS n,
       CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_val
FROM events GROUP BY event_type
"""


# -- CPlusPlusLambda / native-lambda paths (reference CPlusPlusLambda.h:240)
# These two run REAL Python (pandas UDF / mapInPandas) and are still
# oracle-gated: the driver proves the Python escape hatch computes the same
# answer as the declarative form.
def op_native_filter(spark, sf_dir):
    """SelectionComp whose predicate is a row-level Python closure over two
    columns (the reference's native_lambda predicate shape)."""
    from lachesis_spark.functions import lambdas as L

    li = _t(spark, sf_dir, "lineitem")
    pred = L.batch_lambda(
        lambda qty, disc: (qty < 10) & (disc > 0.05), "boolean",
        "l_quantity", "l_discount",
    )
    return core.selection(li, pred, [F.col("l_orderkey"), F.col("l_linenumber")])


OP_NATIVE_FILTER_SQL = """
SELECT l_orderkey, l_linenumber
FROM lineitem WHERE l_quantity < 10 AND l_discount > 0.05
"""


def op_flatmap_python(spark, sf_dir):
    """MultiSelectionComp whose projection is real Python over Arrow batches
    (core.flatten_map → mapInPandas): explode documents into tokens with a
    per-batch pandas function instead of a Catalyst explode."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            out_id, out_tok = [], []
            for r in pdf.itertuples(index=False):
                for tok in r.text.split(" "):
                    if tok:
                        out_id.append(r.doc_id)
                        out_tok.append(tok)
            yield pd.DataFrame({"doc_id": out_id, "token": out_tok})

    return core.flatten_map(docs, fn, "doc_id bigint, token string")


OP_FLATMAP_PYTHON_SQL = """
SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
FROM documents
"""


# -- salted join (skew mitigation; results identical to the plain join) ----
def op_join_salted(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = core.salted_join(li, sup, "l_suppkey", "s_suppkey", n_salts=8)
    return joined.groupBy("s_name").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


OP_JOIN_SALTED_SQL = """
SELECT s_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s_name
"""


QUERIES = {
    "op_join_salted": op_join_salted,
    "op_native_filter": op_native_filter,
    "op_flatmap_python": op_flatmap_python,
    "op_selection": op_selection,
    "op_multi_selection": op_multi_selection,
    "op_aggregate": op_aggregate,
    "op_join_multiway": op_join_multiway,
    "op_partition": op_partition,
    "op_topk": op_topk,
    "op_topk_grouped": op_topk_grouped,
    "op_count": op_count,
    "op_distinct": op_distinct,
    "op_jaccard_topk": op_jaccard_topk,
    "op_nested_explode": op_nested_explode,
    "op_nested_two_level": op_nested_two_level,
    "op_map_explode": op_map_explode,
}

ORACLE = {
    "op_join_salted": OP_JOIN_SALTED_SQL,
    "op_native_filter": OP_NATIVE_FILTER_SQL,
    "op_flatmap_python": OP_FLATMAP_PYTHON_SQL,
    "op_selection": OP_SELECTION_SQL,
    "op_multi_selection": OP_MULTI_SELECTION_SQL,
    "op_aggregate": OP_AGGREGATE_SQL,
    "op_join_multiway": OP_JOIN_MULTIWAY_SQL,
    "op_partition": OP_PARTITION_SQL,
    "op_topk": OP_TOPK_SQL,
    "op_topk_grouped": OP_TOPK_GROUPED_SQL,
    "op_count": OP_COUNT_SQL,
    "op_distinct": OP_DISTINCT_SQL,
    "op_jaccard_topk": OP_JACCARD_SQL,
    "op_nested_explode": OP_NESTED_EXPLODE_SQL,
    "op_nested_two_level": OP_NESTED_TWO_LEVEL_SQL,
    "op_map_explode": OP_MAP_EXPLODE_SQL,
}


# ---------------------------------------------------------------------------
# SURVEY §2.8 surface: operators the reference LACKS but Spark has natively —
# included in the engine's public surface as promised there (cube/rollup,
# outer/semi/anti joins, set operators, exact percentiles).
def op_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )


OP_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def op_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total")
    )


OP_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def op_grouping_sets(spark, sf_dir):
    """GROUPING SETS: the general form cube/rollup specialize — here the two
    single-column marginals without the (status, priority) cross, i.e.
    strictly less work than cube.  One Expand + one aggregate, same single
    shuffle as a plain groupBy."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))


OP_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def op_correlated_subquery(spark, sf_dir):
    """Correlated EXISTS + scalar subquery — the reference has no subquery
    machinery at all (SURVEY §4.1); Catalyst decorrelates both into joins:
    EXISTS → left-semi, the correlated scalar avg → an aggregate joined on
    the correlation key.  Expressed in SQL because subqueries are a SQL-text
    surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n_cust
        FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > (SELECT avg(o2.o_totalprice)
                                              FROM v_orders o2
                                              WHERE o2.o_orderstatus = o.o_orderstatus))
        GROUP BY c.c_mktsegment
        """
    )


OP_CORRELATED_SUBQUERY_SQL = """
SELECT c.c_mktsegment, count(*) AS n_cust
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > (SELECT avg(o2.o_totalprice)
                                      FROM orders o2
                                      WHERE o2.o_orderstatus = o.o_orderstatus))
GROUP BY c.c_mktsegment
"""


def op_range_window(spark, sf_dir):
    """Time-range window frame: each order's trailing-7-day spend per
    customer — RANGE frame over event time (frame bound by VALUE distance,
    not row count).  Ordered on epoch seconds because range frames need a
    numeric order key; one shuffle on the partition key, per-partition sort,
    no global sort."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum("o_totalprice").over(w).alias("trailing_7d_spend"),
    )


OP_RANGE_WINDOW_SQL = """
SELECT o_orderkey, o_custkey,
       sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS trailing_7d_spend
FROM orders
"""


def op_pivot(spark, sf_dir):
    """PIVOT: long→wide on a known value list.  The explicit value list
    matters at scale — without it Spark runs an extra distinct pass over the
    pivot column to discover values; with it the pivot is a single
    partial+final aggregate, same shuffle as a plain groupBy."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .withColumnsRenamed({"F": "total_f", "O": "total_o", "P": "total_p"})
    )


OP_PIVOT_SQL = """
SELECT o_orderpriority,
       sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS total_f,
       sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS total_o,
       sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS total_p
FROM orders GROUP BY o_orderpriority
"""


def op_unpivot(spark, sf_dir):
    """UNPIVOT (melt): wide→long without a union of scans — one pass emits
    all three measures per row (Spark Expand), vs the 3× scan the UNION ALL
    oracle spells out."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        "l_discount",
        "l_tax",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )


OP_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
       CAST(l_quantity AS DOUBLE) AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


def op_outer_join(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_matched"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("n_orderless"),
    )


OP_OUTER_JOIN_SQL = """
SELECT c.c_mktsegment, count(*) AS n_rows, count(o.o_totalprice) AS n_matched,
       CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


def op_semi_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000).select(
        "o_custkey"
    )
    semi = cust.join(big, cust["c_custkey"] == big["o_custkey"], "left_semi")
    anti = cust.join(big, cust["c_custkey"] == big["o_custkey"], "left_anti")
    return (
        semi.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit("has_big_order"))
        .unionByName(
            anti.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
            .withColumn("kind", F.lit("no_big_order"))
        )
    )


OP_SEMI_ANTI_SQL = """
WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
SELECT c_mktsegment, count(*) AS n, 'has_big_order' AS kind
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM big)
GROUP BY c_mktsegment
UNION ALL
SELECT c_mktsegment, count(*) AS n, 'no_big_order' AS kind
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM big)
GROUP BY c_mktsegment
"""


def op_set_ops(spark, sf_dir):
    """intersect / except over key sets: customers with orders vs customers
    with big orders."""
    with_orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    inter = with_orders.intersect(big).withColumn("src", F.lit("both"))
    only_small = with_orders.exceptAll(big).withColumn("src", F.lit("small_only"))
    return inter.unionByName(only_small)


OP_SET_OPS_SQL = """
WITH w AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000)
SELECT custkey, 'both' AS src FROM (SELECT custkey FROM w INTERSECT SELECT custkey FROM b)
UNION ALL
SELECT custkey, 'small_only' AS src FROM (SELECT custkey FROM w EXCEPT SELECT custkey FROM b)
"""


def op_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles (both engines implement the
    same continuous quantile definition)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )


OP_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag
"""


# -- global ORDER BY (§2.8 gap: the reference has no sort at all).  A full
#    sort is its own plan shape — RangePartitioning (sampled bounds) + per-
#    partition sort — distinct from top-k's TakeOrdered; at scale it's the
#    write-ordered-output path (ZORDER-ish layout prep, sorted exports).
def op_order_by(spark, sf_dir):
    nat = _t(spark, sf_dir, "nation")
    return nat.select("n_nationkey", "n_name", "n_regionkey").orderBy(
        F.col("n_regionkey").asc(), F.col("n_name").desc()
    )


OP_ORDER_BY_SQL = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation ORDER BY n_regionkey ASC, n_name DESC
"""


# -- date/interval arithmetic library (§2.8 gap: the reference open-codes
#    all date math in per-query C++).  Exercises truncation, diffs, interval
#    shifts, and component extraction against the same ANSI semantics.
def op_datetime(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.datediff(F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01"))).alias(
                "days_since_epoch_start"
            ),
            (F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")).alias("due_date"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
        )
        .filter(F.col("o_orderkey") % 100 == 0)
    )


OP_DATETIME_SQL = """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
         AS days_since_epoch_start,
       o_orderdate + INTERVAL 45 DAY AS due_date,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS o_dow
FROM orders WHERE o_orderkey % 100 = 0
"""


# -- approximate sketches (the 100 TB path: HLL++ distinct counts and
#    t-digest-style quantiles aggregate in fixed memory with partial merge,
#    where exact distinct is a full shuffle of the key universe).  Sketch
#    internals differ across engines, so no value-hash oracle — rows-only
#    driver check; test_ops asserts tolerance vs the exact answers.
def op_approx_sketches(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_p50"),
    )


QUERIES.update({
    "op_approx_sketches": op_approx_sketches,
    "op_order_by": op_order_by,
    "op_datetime": op_datetime,
    "op_cube": op_cube,
    "op_rollup": op_rollup,
    "op_pivot": op_pivot,
    "op_grouping_sets": op_grouping_sets,
    "op_correlated_subquery": op_correlated_subquery,
    "op_range_window": op_range_window,
    "op_unpivot": op_unpivot,
    "op_outer_join": op_outer_join,
    "op_semi_anti": op_semi_anti,
    "op_set_ops": op_set_ops,
    "op_percentiles": op_percentiles,
})

ORACLE.update({
    "op_order_by": OP_ORDER_BY_SQL,
    "op_datetime": OP_DATETIME_SQL,
    "op_cube": OP_CUBE_SQL,
    "op_rollup": OP_ROLLUP_SQL,
    "op_pivot": OP_PIVOT_SQL,
    "op_grouping_sets": OP_GROUPING_SETS_SQL,
    "op_correlated_subquery": OP_CORRELATED_SUBQUERY_SQL,
    "op_range_window": OP_RANGE_WINDOW_SQL,
    "op_unpivot": OP_UNPIVOT_SQL,
    "op_outer_join": OP_OUTER_JOIN_SQL,
    "op_semi_anti": OP_SEMI_ANTI_SQL,
    "op_set_ops": OP_SET_OPS_SQL,
    "op_percentiles": OP_PERCENTILES_SQL,
})


def op_window_analytics(spark, sf_dir):
    """Analytic window frames (absent from the reference — SURVEY §2.8):
    per-customer running order count/revenue in order-date order, plus the
    previous order's price.  One shuffle on the partition key; frames are
    evaluated inside the sorted partition."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("order_seq"),
        F.sum("o_totalprice").over(w).alias("running_revenue"),
        F.lag("o_totalprice", 1).over(wo).alias("prev_price"),
    )


OP_WINDOW_ANALYTICS_SQL = """
SELECT o_custkey, o_orderkey,
       count(*) OVER w_cum AS order_seq,
       sum(o_totalprice) OVER w_cum AS running_revenue,
       lag(o_totalprice, 1) OVER w_ord AS prev_price
FROM orders
WINDOW w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING),
       w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

QUERIES["op_window_analytics"] = op_window_analytics
ORACLE["op_window_analytics"] = OP_WINDOW_ANALYTICS_SQL


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (preference query): parts not strictly
# dominated on (minimize p_retailprice, maximize p_size).  A part is
# dominated iff some other part is strictly cheaper AND strictly larger;
# the frontier is what a cost/quality trade-off dashboard plots.
#
# Distributed formulation — NO global-sort window: prices are range-
# bucketed (SKY_BUCKETS equi-width bins off a 1-row min/max broadcast);
# dominance splits into (a) the max size among strictly-cheaper PRICES
# within the bucket — a per-bucket window over price-deduped rows, and
# (b) the max size over all LOWER buckets — a prefix-max over the
# SKY_BUCKETS-row per-bucket summary (tiny broadcast self-join).  Each
# window partition is one bucket, so the sort is bucket-local; the only
# corpus-wide shuffles are the bucket groupBys.  The same decomposition
# is exact at any scale because bucket order refines price order.
SKY_BUCKETS = 64


def op_skyline(spark, sf_dir):
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    mm = part.agg(F.min("price").alias("lo"), F.max("price").alias("hi"))
    b = part.join(F.broadcast(mm)).select(
        "p_partkey",
        "price",
        "size",
        F.least(
            F.lit(SKY_BUCKETS - 1),
            F.floor((F.col("price") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / SKY_BUCKETS)),
        )
        .cast("long")
        .alias("bkt"),
    ).transform(_barrier)
    # (a) per-(bucket, price) max size, then within-bucket strictly-cheaper
    #     running max over the deduped price rows
    from pyspark.sql import Window

    pm = b.groupBy("bkt", "price").agg(F.max("size").alias("mx"))
    w = (
        Window.partitionBy("bkt")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = pm.select("bkt", "price", F.max("mx").over(w).alias("in_bkt_cheaper"))
    # (b) prefix max over lower buckets: SKY_BUCKETS-row self-join
    bmax = b.groupBy("bkt").agg(F.max("size").alias("bmx"))
    prev = (
        bmax.select(F.col("bkt").alias("tb"))
        .join(F.broadcast(bmax), F.col("bkt") < F.col("tb"))
        .groupBy("tb")
        .agg(F.max("bmx").alias("prev_max"))
        .withColumnRenamed("tb", "bkt")
    )
    thresh = within.join(prev, "bkt", "left").select(
        "bkt",
        "price",
        F.greatest(
            F.coalesce(F.col("in_bkt_cheaper"), F.lit(-(1 << 62))),
            F.coalesce(F.col("prev_max"), F.lit(-(1 << 62))),
        ).alias("cheaper_max"),
    )
    return (
        b.join(thresh, ["bkt", "price"])
        .filter(F.col("size") >= F.col("cheaper_max"))
        .select("p_partkey", "price", "size")
        .orderBy("price", "p_partkey")
    )


OP_SKYLINE_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
         CAST(p_size AS BIGINT) AS size
  FROM part
), pm AS (
  SELECT price, max(size) AS mx FROM p GROUP BY price
), cm AS (
  SELECT price,
         max(mx) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cheaper_max
  FROM pm
)
SELECT p.p_partkey, p.price, p.size
FROM p JOIN cm USING (price)
WHERE cm.cheaper_max IS NULL OR p.size >= cm.cheaper_max
ORDER BY p.price, p.p_partkey
"""

QUERIES["op_skyline"] = op_skyline
ORACLE["op_skyline"] = OP_SKYLINE_SQL
