"""Strict pandas-level mimic of the driver's correctness gate.

The driver compares Spark and DuckDB results after converting both to
dataframes, so dtype rendering differences that fetchall() hides become
hash mismatches there (e.g. DuckDB ``sum(BIGINT)`` -> HUGEINT -> float64
renders 99111.0 vs Spark's int64 99111).  This checker compares:

  * column names (sorted)
  * per-column pandas dtype KIND (int vs float vs object vs bool ...)
  * stringified cell values after canonical row sort (doubles rounded)

Usage:  python tools/check_oracle_strict.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lachesis_spark.catalog import TESTDATA_TABLES
from lachesis_spark.registry import ORACLE, QUERIES
from lachesis_spark.session import get_spark


def _cell(v):
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        r = round(v, 6)
        if r == int(r) and abs(r) < 2**53:
            return str(int(r))  # 99111.0 and 99111 hash alike ONLY here;
        return f"{r:.6f}"       # the driver does NOT do this — dtypes must
    return str(v)               # genuinely match; kinds are checked below.


def canon_frame(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    kinds = [df[c].dtype.kind for c in cols]
    rows = sorted(tuple(_cell(v) for v in row) for row in df.itertuples(index=False))
    return cols, kinds, rows


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)] or sorted(QUERIES)

    spark = get_spark("check_oracle_strict")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
            if name not in ORACLE:
                print(f"{name:28s} rows-only: {len(sdf)} rows  (no oracle)")
                continue
            odf = con.execute(ORACLE[name]).fetchdf()
            sc, sk, sr = canon_frame(sdf)
            oc, ok_, orows = canon_frame(odf)
            if sc != oc:
                print(f"{name:28s} COLUMN MISMATCH spark={sc} duck={oc}")
                failed.append(name)
            elif sk != ok_:
                bad = [(c, a, b) for c, a, b in zip(sc, sk, ok_) if a != b]
                print(f"{name:28s} DTYPE-KIND MISMATCH {bad}")
                failed.append(name)
            elif sr != orows:
                print(f"{name:28s} VALUE MISMATCH ({len(sr)} vs {len(orows)} rows)")
                shown = 0
                for a, b in zip(sr, orows):
                    if a != b and shown < 3:
                        print("   spark:", a)
                        print("   duck :", b)
                        shown += 1
                failed.append(name)
            else:
                print(f"{name:28s} OK ({len(sr)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} strict-pass")
    if failed:
        print("FAILED:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
