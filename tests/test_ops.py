"""Operator-level unit tests — one per SURVEY.md §2.1 row, on tiny literal
DataFrames (the reference's Test*.cc style, but asserting values not counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lachesis_spark.operators import core
from lachesis_spark.operators.graph import (
    AggregateComp,
    DataFrameSource,
    JoinComp,
    SelectionComp,
    TopKComp,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_selection(spark):
    df = _df(spark, [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double")
    out = core.selection(df, F.col("v") > 15, [F.col("k"), (F.col("v") * 2).alias("v2")])
    assert sorted(tuple(r) for r in out.collect()) == [(2, 40.0), (3, 60.0)]


def test_multi_selection_flatten(spark):
    """MultiSelectionComp → explode (reference MultiSelectionComp.h:15-24,
    CustomerMultiSelection.h:17-50 unnest pattern)."""
    df = _df(spark, [(1, [10, 20]), (2, [30]), (3, [])], "k int, xs array<int>")
    out = core.multi_selection(df, F.col("k") < 3, "xs", extra_cols=["k"], out_name="x")
    assert sorted(tuple(r) for r in out.collect()) == [(1, 10), (1, 20), (2, 30)]


def test_aggregate_operator_plus_decomposition(spark):
    """The reference's Avg{total,count} operator+ state (Avg.h:11-35)
    decomposes into sum+count built-ins."""
    df = _df(spark, [("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double")
    out = core.aggregate(
        df, ["k"], [F.sum("v").alias("total"), F.count(F.lit(1)).alias("cnt")]
    )
    assert sorted(tuple(r) for r in out.collect()) == [("a", 4.0, 2), ("b", 5.0, 1)]


def test_global_aggregate(spark):
    df = _df(spark, [(1.0,), (2.0,)], "v double")
    assert core.aggregate(df, None, [F.sum("v").alias("s")]).collect()[0].s == 3.0


def test_count_all(spark):
    df = _df(spark, [(1,), (2,), (3,)], "v int")
    assert core.count_all(df).collect()[0].cnt == 3


def test_join_multiway_equi_plus_theta(spark):
    """Variadic join: equi subtrees → hash joins, non-equi residue → filter
    (reference JoinComp.h:43, CPlusPlusLambda.h:314-368)."""
    a = _df(spark, [(1, 5), (2, 6)], "k int, av int")
    b = _df(spark, [(1, 7), (2, 2)], "k2 int, bv int")
    c = _df(spark, [(1, 100), (2, 200)], "k3 int, cv int")
    out = core.join(
        [a, b, c],
        equi=[F.col("k") == F.col("k2"), F.col("k") == F.col("k3")],
        theta=F.col("av") < F.col("bv"),
        projection=["k", "cv"],
    )
    assert [tuple(r) for r in out.collect()] == [(1, 100)]


def test_approx_sketches_within_tolerance(spark):
    """HLL++ distinct counts within the configured rsd of exact; t-digest
    median within 2% of the exact percentile (no cross-engine hash oracle
    exists for sketch internals, so tolerance vs exact is the gate)."""
    from lachesis_spark.plans.ops_queries import op_approx_sketches
    from tests.conftest import SF_SMOKE

    got = {r["l_returnflag"]: r for r in op_approx_sketches(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, row in got.items():
        assert abs(row["approx_orders"] - exact[flag]["n"]) <= 0.05 * exact[flag]["n"]
        assert abs(row["approx_p50"] - exact[flag]["p50"]) <= 0.02 * exact[flag]["p50"]


def test_salted_join_equals_plain_join(spark):
    """Salting must not change results: every left row meets each matching
    right row exactly once, including duplicate keys on both sides."""
    left = _df(spark, [(1, i) for i in range(50)] + [(2, 99), (3, 7)], "k int, lv int")
    right = _df(spark, [(1, "hot"), (2, "warm"), (2, "dup"), (4, "miss")], "rk int, rv string")
    salted = core.salted_join(left, right, "k", "rk", n_salts=4)
    plain = left.join(right, F.col("k") == F.col("rk"), "inner")
    assert sorted(map(tuple, salted.select("k", "lv", "rv").collect())) == sorted(
        map(tuple, plain.select("k", "lv", "rv").collect())
    )


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 shuffle partition of the join."""
    left = _df(spark, [(1, i) for i in range(200)], "k int, lv int")
    right = _df(spark, [(1, "hot")], "rk int, rv string")
    salted = core.salted_join(left, right, "k", "rk", n_salts=8)
    # distinct salts actually assigned to the single hot key
    n_salts_used = (
        left.withColumn(
            "s",
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
        )
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts_used > 1
    assert salted.count() == 200


def test_join_cartesian_fallback(spark):
    a = _df(spark, [(1,), (2,)], "x int")
    b = _df(spark, [(10,), (20,)], "y int")
    out = core.join([a, b], equi=[], theta=F.col("x") * 10 == F.col("y"))
    assert sorted(tuple(r) for r in out.collect()) == [(1, 10), (2, 20)]


def test_partition_preserves_data(spark):
    df = _df(spark, [(i % 3, i) for i in range(30)], "k int, v int")
    out = core.partition(df, ["k"], num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert sorted(r.v for r in out.collect()) == list(range(30))


def test_top_k_deterministic_ties(spark):
    df = _df(spark, [(1, 5.0), (2, 5.0), (3, 1.0), (4, 9.0)], "id int, s double")
    out = core.top_k(df, 2, "s", tiebreak=["id"])
    assert [(r.id, r.s) for r in out.collect()] == [(4, 9.0), (1, 5.0)]


def test_top_k_per_group(spark):
    df = _df(spark, [("a", 1), ("a", 3), ("a", 2), ("b", 9)], "g string, v int")
    out = core.top_k_per_group(df, 1, ["g"], "v")
    assert sorted((r.g, r.v) for r in out.collect()) == [("a", 3), ("b", 9)]


def test_distinct_by(spark):
    df = _df(spark, [("x", 3), ("x", 1), ("y", 2)], "t string, id int")
    out = core.distinct_by(df, ["t"], keep={"id": F.min("id")})
    assert sorted(tuple(r) for r in out.collect()) == [("x", 1), ("y", 2)]


def test_graph_api_matches_functional(spark):
    """Computation graph wiring (setInput style) lowers to the same result."""
    a = DataFrameSource(_df(spark, [(1, 2.0), (2, 4.0), (3, 6.0)], "k int, v double"))
    sel = SelectionComp(pred=F.col("v") > 2.0).set_input(0, a)
    agg = AggregateComp(["k"], [F.sum("v").alias("s")]).set_input(0, sel)
    assert sorted(tuple(r) for r in agg.to_df(spark).collect()) == [(2, 4.0), (3, 6.0)]


def test_graph_join_topk(spark):
    left = DataFrameSource(_df(spark, [(1, "a"), (2, "b")], "k int, n string"))
    right = DataFrameSource(_df(spark, [(1, 10.0), (2, 30.0)], "k2 int, s double"))
    j = JoinComp(2, equi=[F.col("k") == F.col("k2")]).set_input(0, left).set_input(1, right)
    t = TopKComp(1, "s").set_input(0, j)
    assert [(r.n, r.s) for r in t.to_df(spark).collect()] == [("b", 30.0)]


def test_write_set_materializes_and_rescan(spark, tmp_path):
    """executeComputations with a WriteUserSet sink: the result set is
    persisted to the catalog and downstream consumers scan the materialized
    set (reference PDBClient.h:206-221 lifecycle)."""
    from lachesis_spark.catalog import Catalog
    from lachesis_spark.operators.graph import (
        AggregateComp,
        DataFrameSource,
        ScanSet,
        WriteSet,
        execute_computations,
    )

    cat = Catalog(spark, str(tmp_path))
    src = DataFrameSource(
        spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], "k int, v double")
    )
    agg = AggregateComp(key=["k"], values=[F.sum("v").alias("total")]).set_input(0, src)
    sink = WriteSet(cat, "out_db", "totals").set_input(0, agg)

    (result,) = execute_computations(spark, sink)
    assert cat.exists_set("out_db", "totals")
    # the returned frame scans the materialized set, not the lazy plan
    rescan = ScanSet(cat, "out_db", "totals").to_df(spark)
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, rescan.collect()))
    assert {tuple(r) for r in rescan.collect()} == {(1, 15.0), (2, 7.0)}


def test_skyline_is_exact_pareto_frontier(spark):
    """Brute-force cross-check at sf0.001: the bucketed two-phase plan
    returns exactly the strict-dominance frontier."""
    import pyspark.sql.functions as F

    from lachesis_spark.plans.ops_queries import _t, op_skyline

    sf = "/root/testdata/sf0.001"
    got = {
        (r.p_partkey, r.price, r.size)
        for r in op_skyline(spark, sf).collect()
    }
    pts = [
        (r.p_partkey, float(r.p_retailprice), int(r.p_size))
        for r in _t(spark, sf, "part").select(
            "p_partkey", "p_retailprice", "p_size"
        ).collect()
    ]
    want = {
        (k, p, s)
        for (k, p, s) in pts
        if not any(q[1] < p and q[2] > s for q in pts)
    }
    assert got == want
