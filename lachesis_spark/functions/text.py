"""Text-analysis function library (JVM-side expressions, no UDFs).

Covers the training-data-pipeline text ops: tokenization, token counting,
n-gram shingling, quality scoring, language-ID heuristics, fingerprinting.
Everything is a Column expression so a 100 TB corpus pass stays inside
whole-stage codegen; nothing here crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Real deployments would swap in fastText/CLD3 via a pandas UDF
# (see llm.multimodal for the UDF plumbing pattern); the heuristic keeps the
# hot path JVM-side.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "en"],
}


def tokens(col: Column | str, pattern: str = " ") -> Column:
    """Whitespace tokenization; empty tokens removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-style pre-tokenization pattern (ASCII-conservative so the Java and
# RE2-family regex engines agree): letter runs, single digits, or single
# non-alphanumeric non-space marks — the shape GPT-2-style tokenizers split
# on before byte-pair merging.
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def bpe_tokens(col: Column | str) -> Column:
    """Pre-tokenizer pieces under BPE_PATTERN (the unit an LLM token counter
    approximates; whitespace tokens over-merge punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


def avg_token_len(col: Column | str) -> Column:
    ts = tokens(col)
    return F.aggregate(
        ts, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.size(ts).cast("double")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric or space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[A-Za-z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(c).cast("double")


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` — the language-ID
    signal."""
    ts = tokens(col)
    hits = F.size(F.filter(ts, lambda t: F.lower(t).isin(STOPWORDS[lang])))
    return hits.cast("double") / F.size(ts).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length band + average token
    length band + low punctuation.  Mirrors the usual pretraining-corpus
    filters (length/punct/stopword ratios)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    len_ok = F.when((n >= 100) & (n <= 2000), 1.0).otherwise(0.5)
    atl = avg_token_len(c)
    atl_ok = F.when((atl >= 3.0) & (atl <= 10.0), 1.0).otherwise(0.5)
    punct_ok = 1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return (len_ok + atl_ok + punct_ok) / 3.0


def token_shingles(ts: Column, n: int) -> Column:
    """n-token shingles over an EXISTING token-array column.

    Built as zip_with over n shifted slices of the token array, NOT as a
    transform over an index sequence: an index-lambda would embed the token
    expression inside the lambda body, re-evaluating the whole tokenize per
    element (quadratic per document).  Slices evaluate the token array a
    constant number of times, keeping shingling linear.  Element i is the
    shingle STARTING at token i (0-based via posexplode)."""
    m = F.size(ts) - (n - 1)
    acc = F.slice(ts, 1, m)
    for k in range(1, n):
        acc = F.zip_with(
            acc, F.slice(ts, 1 + k, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(ts) >= n, acc).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """n-word shingles (the dedup unit).  Expression-only; see
    :func:`token_shingles` for the construction."""
    return token_shingles(tokens(col, sep), n)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: lexicographic min of per-token MD5s — a 1-perm
    MinHash, stable across engines (oracle uses min(md5(token)))."""
    return F.array_min(F.transform(tokens(col), lambda t: F.md5(t)))


def lang_trigram_profiles() -> dict[str, list[str]]:
    """Per-language character-trigram profiles derived deterministically
    from the stopword lists (within-word trigrams; short words kept whole)
    — the n-gram language-ID heuristic's reference data, no external
    models."""
    profiles: dict[str, list[str]] = {}
    for lang, words in STOPWORDS.items():
        tris: set[str] = set()
        for w in words:
            if len(w) < 3:
                tris.add(w)
            else:
                tris.update(w[i : i + 3] for i in range(len(w) - 2))
        profiles[lang] = sorted(tris)
    return profiles


def char_trigrams(col: Column | str) -> Column:
    """Distinct lowercase character trigrams.  IMPORTANT: pass an already-
    materialized (attribute) column — an inline expression would be
    re-evaluated per trigram position (see word_shingles note)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - 2, F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, 3))
    )


def rolling_fingerprint(col: Column | str, window: int = 16) -> Column:
    """Rolling character-window fingerprint (winnowing-style): hash every
    ``window``-char substring, keep the minimum — robust to token-boundary
    edits the way Rabin-Karp/winnowing schemes are.  The window hash is
    md5-based rather than an O(1)-update polynomial so both engines compute
    identical values; cost is O(len × window) expression work per document,
    still fully codegen."""
    c = F.col(col) if isinstance(col, str) else col
    n_windows = F.length(c) - (window - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(c, i, window)), 1, 15), 16, 10
        ).cast("long"),
    )
    return F.array_min(hashes)
