"""Frequent-itemset mining invariants (plans/itemsets.py)."""

import pyspark.sql.functions as F
import pytest

from lachesis_spark.plans import itemsets

SF = "/root/testdata/sf0.001"


def test_pairs_canonical_and_bounded(spark):
    df = itemsets.itemset_pairs(spark, SF).toPandas()
    assert len(df) <= itemsets.TOP_K
    assert (df.p1 < df.p2).all()
    assert (df.pair_cnt >= itemsets.MIN_PAIR_COUNT).all()
    # descending by count, ties broken by (p1, p2)
    keys = list(zip(-df.pair_cnt, df.p1, df.p2))
    assert keys == sorted(keys)


def test_rules_metrics_consistent(spark):
    df = itemsets.itemset_rules(spark, SF).toPandas()
    assert len(df) > 0
    # confidence and support are probabilities; lift positive
    assert ((df.support > 0) & (df.support <= 1)).all()
    assert ((df.confidence > 0) & (df.confidence <= 1)).all()
    assert (df.lift > 0).all()
    # support is symmetric: both directions of a pair carry the same count
    sym = df.groupby(df.apply(lambda r: tuple(sorted((r.p1, r.p2))), axis=1)).pair_cnt.nunique()
    assert (sym == 1).all()


def test_apriori_prune_is_lossless(spark):
    """Item-frequency pruning must not remove any pair above the pair
    floor: a frequent pair's items are each at least pair-frequent."""
    b = itemsets._baskets(spark, SF)
    n_baskets = b.select("oid").distinct().count()
    floor = max(2, int(n_baskets * itemsets.MIN_ITEM_FRAC))
    # every item in a surviving pair must individually clear the floor —
    # i.e. re-checking pair members against raw item counts finds no
    # violation, proving the prune cannot have cut a qualifying pair.
    pairs = itemsets.pair_counts(spark, SF)
    raw_counts = b.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    viol = (
        pairs.select(F.col("p1").alias("item"))
        .unionAll(pairs.select(F.col("p2").alias("item")))
        .distinct()
        .join(raw_counts, "item")
        .filter(F.col("cnt") < floor)
        .count()
    )
    assert viol == 0


def test_basket_cap_enforced(spark):
    b = itemsets._baskets(spark, SF)
    mx = b.groupBy("oid").agg(F.count(F.lit(1)).alias("n")).agg(F.max("n")).collect()[0][0]
    assert mx <= itemsets.BASKET_CAP


def test_dq_checks_all_pass_on_clean_tpch(spark):
    from lachesis_spark.plans.profile import DQ_MIN_PASS, stats_dq_checks

    df = stats_dq_checks(spark, "/root/testdata/sf0.001").toPandas()
    assert set(df.check_name) == set(DQ_MIN_PASS)
    assert df.passed.all()  # synthetic TPC-H is constraint-clean
    assert ((df.metric >= 0) & (df.metric <= 1)).all()
