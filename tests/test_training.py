"""Tests for llm.training: BPE merge training, the GD quality classifier,
deterministic sharding, and the token-budget planner."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from lachesis_spark.llm import training as TR
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# BPE
def test_bpe_pair_counts_weighted(spark):
    # vocab: 'ab' ×3, 'abc' ×2  →  pair 'a b' count 5, 'b c' count 2
    vocab = spark.createDataFrame(
        [("a b", 3), ("a b c", 2)], ["seq", "c"]
    )
    rows = {r["pair"]: r["cnt"] for r in TR.bpe_pair_counts(vocab).collect()}
    assert rows == {"a b": 5, "b c": 2}


def test_bpe_single_symbol_words_yield_no_pairs(spark):
    vocab = spark.createDataFrame([("x", 7)], ["seq", "c"])
    assert TR.bpe_pair_counts(vocab).count() == 0


def test_bpe_train_round2_reflects_merge(spark):
    out = TR.tok_bpe_train(spark, SF_SMOKE).collect()
    r1 = [r for r in out if r["round"] == 1]
    r2 = [r for r in out if r["round"] == 2]
    assert len(r1) == TR.BPE_TOP and len(r2) == TR.BPE_TOP
    best1 = min(r1, key=lambda r: r["rnk"])
    # the merged pair can no longer occur in round 2 (replace is exhaustive
    # on single-char symbol sequences)
    assert all(r["pair"] != best1["pair"] for r in r2)


def test_bpe_merge_semantics_exact(spark):
    # corpus: 'aab' ×2, 'ab', 'aaa'  →  round-1 pairs:
    #   'a a': 2 (from aab) + 2 (from aaa, overlapping counts both adjacencies)
    #   'a b': 2 (aab) + 1 (ab)
    # winner 'a a' (4 > 3); greedy-left merge: aab→'aa b', aaa→'aa a'
    docs = spark.createDataFrame(
        [(1, "aab aab ab aaa", "en", "s", 14)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    p1, p2, best1, cached = TR.bpe_train_rounds(docs)
    p1d = {r["pair"]: r["cnt"] for r in p1.collect()}
    assert p1d == {"a a": 4, "a b": 3}
    b = best1.collect()[0]
    assert b["bp"] == "a a" and b["merged"] == "aa"
    p2d = {r["pair"]: r["cnt"] for r in p2.collect()}
    # aab(×1 distinct word, corpus count folded in wc: 'aab' appears 2×):
    # 'aa b' ×2; 'ab' stays 'a b' ×1; 'aaa' → 'aa a' ×1
    assert p2d == {"aa b": 2, "a b": 1, "aa a": 1}
    for df in cached:
        df.unpersist()


def _merge(spark, syms, p1, p2):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    return df.select(
        TR.bpe_merge_symbols(F.col("syms"), p1, p2).alias("m")
    ).collect()[0]["m"]


def test_bpe_merge_symbols_greedy_nonoverlap(spark):
    # greedy left-to-right: in 'a a a', positions 0-1 merge, 2 survives
    assert _merge(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge(spark, ["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge(spark, ["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    # symbol-aligned only: 'ba c' contains the SUBSTRING 'a c' but no
    # adjacent (a, c) symbol pair — string replace would corrupt this
    assert _merge(spark, ["ba", "c"], "a", "c") == ["ba", "c"]
    assert _merge(spark, ["b", "a", "c"], "a", "c") == ["b", "ac"]


def test_bpe_train_n_prefix_stable_and_conserves_symbols(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    merges, syms = TR.bpe_train_n(docs, 8)
    assert [m[0] for m in merges] == list(range(1, 9))
    # prefix-stable vs the 2-round oracle query: same first/second merge
    two = TR.tok_bpe_train(spark, SF_SMOKE).collect()
    best = {r["round"]: r["pair"] for r in two if r["rnk"] == 1}
    assert merges[0][1] == best[1] and merges[1][1] == best[2]
    # every merge of cnt weighted occurrences removes exactly cnt symbols:
    # final weighted symbol count = initial char count - sum(merge cnts)
    total_chars = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).where(F.col("w") != "").agg(F.sum(F.length("w"))).collect()[0][0]
    final = syms.agg(
        F.sum(F.col("c") * F.size("syms")).alias("n")
    ).collect()[0]["n"]
    assert final == total_chars - sum(m[3] for m in merges)
    assert all(m[3] > 0 for m in merges)


def test_bpe_train_n_deep_run_completes(spark):
    # 32 rounds (the scale-demo depth): checkpointing keeps lineage flat and
    # each round still selects a positive-count merge
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    merges, _ = TR.bpe_train_n(docs, 32)
    assert len(merges) == 32
    assert [m[0] for m in merges] == list(range(1, 33))
    assert all(m[2] == m[1].replace(" ", "") for m in merges)


# ---------------------------------------------------------------------------
# Quality classifier
def test_quality_classifier_learns_signal(spark):
    row = TR.quality_classifier(spark, SF_SMOKE).collect()[0]
    ws = [row[f"w{j}"] for j in range(4)]
    assert all(abs(w) < 100 for w in ws)
    assert any(w != 0.0 for w in ws)
    assert 0.0 <= row["train_acc"] <= 1.0
    assert row["n_rows"] > 0


# ---------------------------------------------------------------------------
# Sharding
def test_assign_shard_deterministic_and_complete(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    a = TR.assign_shard(docs).select("doc_id", "shard")
    b = TR.assign_shard(docs.repartition(13)).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    mm = a.agg(F.min("shard"), F.max("shard")).collect()[0]
    assert mm[0] >= 0 and mm[1] < TR.N_SHARDS


def test_write_shards_one_file_per_shard(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = str(tmp_path / "shards")
    TR.write_shards(docs, out, n_shards=8)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == 8
    for d in dirs:
        files = [f for f in glob.glob(os.path.join(d, "*.parquet"))]
        assert len(files) == 1, d
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # shard column round-trips as the partition column
    assert back.select(F.count_distinct("shard")).collect()[0][0] == 8


def test_shard_balance(spark):
    stats = TR.shard_corpus(spark, SF_SMOKE).collect()
    counts = [r["n_docs"] for r in stats]
    assert len(stats) <= TR.N_SHARDS
    # md5 sharding at sf0.001 (~600 docs over 32 shards): no empty-adjacent
    # catastrophic skew — max under 4× the mean
    mean = sum(counts) / len(counts)
    assert max(counts) <= 4 * mean


# ---------------------------------------------------------------------------
# Temperature mixture
def test_temperature_flattens_distribution(spark):
    rows = TR.sample_temperature(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert sum(r["p"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    # alpha<1 compresses: the head lang's p share must be strictly below its
    # raw token share, the tail lang's above
    total = sum(r["tokens"] for r in rows)
    head = max(rows, key=lambda r: r["tokens"])
    tail = min(rows, key=lambda r: r["tokens"])
    assert head["p"] < head["tokens"] / total
    assert tail["p"] > tail["tokens"] / total


# ---------------------------------------------------------------------------
# Token budget planner
def test_token_budget_rates(spark):
    rows = TR.sample_token_budget(spark, SF_SMOKE).collect()
    assert {r["source"] for r in rows} <= {s for s, _ in TR.MIX_WEIGHTS}
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        assert r["epochs"] == pytest.approx(
            r["weight"] * TR.TOKEN_BUDGET / r["tokens"], rel=1e-4
        )
        # keep_rate is the capped epochs
        assert r["keep_rate"] == pytest.approx(min(1.0, r["epochs"]), rel=1e-4)


def test_temperature_mixture_skips_zero_token_languages(spark):
    """ADVICE round-5: a language whose documents are all empty/null text
    yields zero (or NULL from size()=-1 sums) tokens — it must get no
    sampling mass instead of crashing the driver-side normalization with
    ZeroDivisionError/TypeError."""
    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta gamma"),
            (2, "en", "alpha beta"),
            (3, "zz", ""),           # tokenizes to zero tokens
            (4, "qq", None),         # null text -> NULL token sum
            (5, "fr", "un deux"),
        ],
        "doc_id bigint, lang string, text string",
    )
    rows = {r["lang"]: r for r in TR.temperature_mixture(spark, docs).collect()}
    assert set(rows) == {"en", "fr"}
    assert abs(sum(r["p"] for r in rows.values()) - 1.0) < 1e-6
    assert all(r["epochs"] > 0 for r in rows.values())


def test_bpe_batch_m1_degenerates_to_sequential(spark):
    """batch_m=1 must reproduce exact sequential BPE — same merges, same
    ordinals, same counts."""
    docs = TR._docs(spark, SF_SMOKE)
    seq, _ = TR.bpe_train_n(docs, 6)
    b1, _ = TR.bpe_train_batch(docs, 6, batch_m=1)
    assert b1 == seq


def test_bpe_multi_merge_is_order_independent():
    """The one-pass batch fold over pairwise symbol-disjoint rules equals
    sequential application of the same rules in EVERY order — the property
    the batched trainer's correctness rides on."""
    import itertools

    rules = {"a b": "ab", "c d": "cd", "x x": "xx"}
    streams = [
        ["a", "b", "c", "d", "a", "b"],
        ["x", "x", "x", "c", "d"],          # odd same-symbol run
        ["x", "x", "x", "x"],               # even run
        ["a", "c", "b", "d"],               # no matches
        ["a", "b", "a", "b", "x", "x", "c", "d", "x"],
        [],
    ]

    def seq_apply(stream, order):
        out = list(stream)
        for pair in order:
            p1, p2 = pair.split(" ")
            merged, acc = rules[pair], []
            for s in out:
                if acc and acc[-1] == p1 and s == p2:
                    acc[-1] = merged
                else:
                    acc.append(s)
            out = acc
        return out

    def batch_apply(stream):
        acc = []
        for s in stream:
            key = (acc[-1] + " " + s) if acc else None
            if key in rules:
                acc[-1] = rules[key]
            else:
                acc.append(s)
        return acc

    for stream in streams:
        got = batch_apply(stream)
        for order in itertools.permutations(rules):
            assert seq_apply(stream, order) == got, (stream, order)


def test_bpe_multi_merge_fold_matches_python_model(spark):
    """The Spark map-literal fold (bpe_merge_symbols_multi) computes the
    same result as the pure-Python batch model on real symbol arrays."""
    import pyspark.sql.functions as F

    rules = {"a b": "ab", "c c": "cc"}
    rows = [(1, ["a", "b", "c", "c", "c"]), (2, ["b", "a", "b", "a"]),
            (3, ["c", "c", "c", "c"]), (4, [])]
    df = spark.createDataFrame(rows, "id int, syms array<string>")
    got = {
        r["id"]: r["out"]
        for r in df.select(
            "id", TR.bpe_merge_symbols_multi(F.col("syms"), rules).alias("out")
        ).collect()
    }
    assert got == {
        1: ["ab", "cc", "c"],
        2: ["b", "ab", "a"],
        3: ["cc", "cc"],
        4: [],
    }


def test_select_noninteracting_defers_conflicts():
    ranked = [
        ("e r", 100),   # takes e, r, er
        ("r s", 90),    # shares r -> deferred
        ("t h", 80),    # takes t, h, th
        ("x e", 70),    # shares e -> deferred
        ("er a", 60),   # shares er (merged output!) -> deferred
        ("o n", 50),    # takes
    ]
    got = TR.select_noninteracting(ranked, 3)
    assert got == [("e r", "er", 100), ("t h", "th", 80), ("o n", "on", 50)]
    # batch size cap respected
    assert len(TR.select_noninteracting(ranked, 2)) == 2


def test_nb_learns_separable_vocabularies(spark):
    # constructed corpus with a real per-class vocabulary: NB must classify
    # every held-out doc correctly (the synthetic testdata corpus has no
    # lang<->token signal, so learnability is proved here and the registry
    # query doubles as a learnability diagnostic — see training.py notes)
    vocab = {"aa": "red green blue", "bb": "cat dog fox", "cc": "one two three"}
    rows = [
        (f"{cls}{i}", cls, f"{words} {words} shared")
        for cls, words in vocab.items()
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = TR.nb_confusion(docs).collect()
    assert out, "no held-out docs scored"
    assert all(r.lang_true == r.lang_pred for r in out), f"off-diagonal: {out}"
    assert {r.lang_true for r in out} == set(vocab)


def test_nb_langid_is_prior_dominated_on_signal_free_corpus(spark):
    # on the synthetic corpus (token distribution independent of lang) the
    # diagnostic must NOT hallucinate signal: accuracy stays near the
    # majority prior, and every predicted class is one of the true classes
    rows = TR.text_nb_langid(spark, SF_SMOKE).collect()
    totals = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows if r.lang_true == r.lang_pred)
    assert totals > 0
    assert correct / totals < 0.6, "suspicious accuracy on signal-free labels"


def test_nb_langid_split_is_disjoint_and_seeded(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    from lachesis_spark.functions import hashing as H

    h = docs.select(H.hash01(F.col("doc_id").cast("string"), TR.NB_SEED).alias("h"))
    n_train = h.where(F.col("h") < TR.NB_TRAIN_FRAC).count()
    n_test = h.where(F.col("h") >= TR.NB_TRAIN_FRAC).count()
    assert n_train + n_test == docs.count()
    assert n_train > 0 and n_test > 0
