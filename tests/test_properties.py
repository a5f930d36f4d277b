"""Property-based operator tests (hypothesis) — the randomized coverage the
reference lacks (SURVEY.md §5.1: no property-based testing).  Each property
checks a distributed operator against a plain-Python model on small random
inputs; example counts are kept low because every example is a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from lachesis_spark.operators import core

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=40,
)


@SET
@given(data=rows, k=st.integers(min_value=1, max_value=10))
def test_top_k_matches_sorted_prefix(spark, data, k):
    df = spark.createDataFrame(data, "v int, g int")
    got = [
        (r["v"], r["g"])
        for r in core.top_k(df, k, "v", tiebreak=["g"]).collect()
    ]
    exp = sorted(data, key=lambda t: (-t[0], t[1]))[:k]
    assert got == exp


@SET
@given(data=rows)
def test_aggregate_matches_python_sums(spark, data):
    df = spark.createDataFrame(data, "v int, g int")
    got = {
        r["g"]: (r["s"], r["n"])
        for r in core.aggregate(
            df, ["g"], [F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")]
        ).collect()
    }
    exp: dict[int, tuple[int, int]] = {}
    for v, g in data:
        s, n = exp.get(g, (0, 0))
        exp[g] = (s + v, n + 1)
    assert got == exp


@SET
@given(data=rows)
def test_distinct_by_is_set_semantics(spark, data):
    df = spark.createDataFrame(data, "v int, g int")
    got = {r["g"] for r in core.distinct_by(df, ["g"]).collect()}
    assert got == {g for _, g in data}


@SET
@given(
    left=st.lists(st.integers(0, 8), min_size=1, max_size=20),
    right=st.lists(st.integers(0, 8), min_size=1, max_size=20),
)
def test_join_matches_python_multiset(spark, left, right):
    lf = spark.createDataFrame([(x,) for x in left], "k int")
    rf = spark.createDataFrame([(x,) for x in right], "k int")
    got = sorted(r["k"] for r in core.join([lf, rf], ["k"]).collect())
    exp = sorted(
        x for x in left for y in right if x == y
    )
    assert got == exp


@SET
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=4), min_size=0, max_size=12
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_shingle_count_and_content(spark, words, n):
    from lachesis_spark.functions import text as TX

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(TX.word_shingles("text", n).alias("sh")).first()["sh"]
    exp = [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ] if len(words) >= n else []
    assert list(got) == exp


@SET
@given(text=st.text(alphabet="abc XY.,!7\t", min_size=0, max_size=60))
def test_bpe_token_count_matches_python(spark, text):
    import re

    from lachesis_spark.functions import text as TX

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(TX.bpe_token_count("text").alias("n")).first()["n"]
    assert got == len(re.findall(TX.BPE_PATTERN, text))


@SET
@given(text=st.text(alphabet="abcd efg", min_size=1, max_size=80))
def test_rolling_fingerprint_matches_python(spark, text):
    import hashlib

    from lachesis_spark.functions import text as TX

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(TX.rolling_fingerprint("text", 16).alias("fp")).first()["fp"]

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n_windows = max(len(text) - 15, 1)
    exp = min(h(text[i : i + 16]) for i in range(n_windows))
    assert got == exp
