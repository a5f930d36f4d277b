"""NULL-semantics parity battery: Spark vs DuckDB on the edge cases the
driver's synthetic testdata (null-free) never exercises.

The engine's claim is ANSI-SQL-compatible behavior; three-valued logic is
where engines classically diverge.  Each case builds the same tiny table in
both engines and compares results with the driver-style canonical form:

- WHERE under three-valued logic (NULL predicate drops the row)
- join keys: NULL never equals NULL in an equi-join
- aggregates: sum/avg ignore NULLs; count(col) vs count(*); all-NULL
  group yields NULL sum; GROUP BY treats NULLs as one group
- DISTINCT and set ops treat NULLs as equal
- window frames running over NULL values
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

def canon(rows, colnames):
    """Null-safe canonical form (conftest.canon sorts raw values, which
    breaks on None-vs-int): columns sorted by name, every cell rendered as
    (is_null, str(value)) with doubles rounded, rows sorted."""
    import math

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return (1, "")
        if isinstance(v, float):
            return (0, "NaN" if math.isnan(v) else f"{round(v, 6):.6f}")
        return (0, str(v))

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

ROWS = [
    (1, 10.0), (2, None), (None, 5.0), (None, None), (2, 7.0), (3, None),
]
OTHER = [(1,), (None,), (3,), (4,)]


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    t = spark.createDataFrame(ROWS, "k int, v double")
    o = spark.createDataFrame(OTHER, "k int")
    def sql_lit(v):
        return "NULL" if v is None else repr(v)

    con = duckdb.connect()
    t_vals = ", ".join(f"({sql_lit(k)}, {sql_lit(v)})" for k, v in ROWS)
    o_vals = ", ".join(f"({sql_lit(k)},)".replace(",)", ")") for (k,) in OTHER)
    con.execute(
        f"CREATE TABLE t AS SELECT CAST(c0 AS INTEGER) AS k,"
        f" CAST(c1 AS DOUBLE) AS v FROM (VALUES {t_vals}) s(c0, c1)"
    )
    con.execute(
        f"CREATE TABLE o AS SELECT CAST(c0 AS INTEGER) AS k"
        f" FROM (VALUES {o_vals}) s(c0)"
    )
    yield t, o, con
    con.close()


def _same(spark_df, con, sql):
    srows, scols = spark_df.collect(), spark_df.columns
    res = con.execute(sql)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols)
    assert canon(srows, scols) == canon(drows, dcols)


def test_where_three_valued_logic(engines):
    t, _, con = engines
    _same(t.filter(F.col("v") > 6), con, "SELECT * FROM t WHERE v > 6")
    # NOT of NULL is NULL: still dropped
    _same(t.filter(~(F.col("v") > 6)), con, "SELECT * FROM t WHERE NOT (v > 6)")
    # IS DISTINCT FROM is null-safe on both engines
    _same(
        t.filter(F.col("v").eqNullSafe(F.lit(None).cast("double"))),
        con,
        "SELECT * FROM t WHERE v IS NOT DISTINCT FROM NULL",
    )


def test_join_null_keys_never_match(engines):
    t, o, con = engines
    _same(
        t.join(o, "k").select("k", "v"),
        con,
        "SELECT t.k, t.v FROM t JOIN o ON t.k = o.k",
    )
    # left join: null-keyed left rows survive unmatched
    _same(
        t.join(o.withColumnRenamed("k", "ok"),
               F.col("k") == F.col("ok"), "left").select("k", "v", "ok"),
        con,
        "SELECT t.k, t.v, o.k AS ok FROM t LEFT JOIN o ON t.k = o.k",
    )
    # null-safe equality joins DO match nulls, identically
    _same(
        t.join(o.withColumnRenamed("k", "ok"),
               F.col("k").eqNullSafe(F.col("ok"))).select("k", "v", "ok"),
        con,
        "SELECT t.k, t.v, o.k AS ok FROM t JOIN o"
        " ON t.k IS NOT DISTINCT FROM o.k",
    )


def test_aggregates_ignore_nulls(engines):
    t, _, con = engines
    _same(
        t.groupBy("k").agg(
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
            F.count("v").alias("nv"),
            F.count(F.lit(1)).alias("n"),
        ),
        con,
        "SELECT k, sum(v) AS s, avg(v) AS a, count(v) AS nv, count(*) AS n"
        " FROM t GROUP BY k",
    )


def test_distinct_and_set_ops_treat_nulls_equal(engines):
    t, _, con = engines
    _same(t.select("k").distinct(), con, "SELECT DISTINCT k FROM t")
    _same(
        t.select("k").exceptAll(t.select("k").limit(0)).distinct(),
        con, "SELECT DISTINCT k FROM t EXCEPT SELECT k FROM t WHERE 1=0",
    )
    _same(
        t.select("k").intersect(t.select("k")),
        con, "SELECT k FROM t INTERSECT SELECT k FROM t",
    )


def test_window_over_null_values(engines):
    from pyspark.sql import Window

    t, _, con = engines
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    _same(
        t.select("k", "v", F.sum("v").over(w).alias("run")),
        con,
        "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST"
        " ROWS UNBOUNDED PRECEDING) AS run FROM t",
    )
