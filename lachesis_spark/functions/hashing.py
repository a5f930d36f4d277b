"""Deterministic cross-engine hashing.

Dedup/LSH operators need hash functions that (a) run JVM-side in Spark (no
Python in the hot path) and (b) can be reproduced bit-for-bit by the DuckDB
oracle.  MD5 is the one primitive both engines expose identically, so every
derived hash here is an MD5-prefix reinterpreted as an integer:

    h60(s)         = int(md5(s)[0:15], 16)          # 60-bit, fits BIGINT
    h60(s, seed)   = h60(seed || '|' || s)          # seeded family
    hash01(s,seed) = h60 / 2^60                     # uniform [0,1)

Each helper has a Spark Column builder and a SQL-text builder kept in sync;
tests assert equality on a corpus.

Scale: md5+conv are whole-stage-codegen expressions — a 100 TB dedup pass
stays JVM-side with zero Python serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)


# -- Spark column builders --------------------------------------------------
def h60(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_seeded(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return h60(F.concat(F.lit(f"{seed}|"), c))


def hash01(col: Column | str, seed: int = 0) -> Column:
    return h60_seeded(col, seed) / F.lit(TWO_60)


def hbit(col: Column | str, bit: int, seed: int = 0) -> Column:
    """Bit ``bit`` (0-based from LSB) of the seeded 60-bit hash."""
    return F.shiftright(h60_seeded(col, seed), bit).bitwiseAND(F.lit(1))


# -- DuckDB SQL text builders (same functions, same bits) -------------------
def sql_h60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_h60_seeded(expr: str, seed: int) -> str:
    return sql_h60(f"'{seed}|' || {expr}")


def sql_hash01(expr: str, seed: int = 0) -> str:
    return f"({sql_h60_seeded(expr, seed)} / {TWO_60!r})"


def sql_hbit(expr: str, bit: int, seed: int = 0) -> str:
    return f"((({sql_h60_seeded(expr, seed)}) >> {bit}) & 1)"
