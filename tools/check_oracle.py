"""Local mimic of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, canonicalizes (sort columns by name, sort rows, round doubles
to 1e-6) and compares.  Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lachesis_spark.catalog import TESTDATA_TABLES
from lachesis_spark.registry import ORACLE, QUERIES
from lachesis_spark.session import get_spark


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return "<null>"
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, int):
            return v
        return str(v)

    # key=repr: a nullable numeric column yields tuples mixing "<null>"
    # (str) with floats at the same position, which plain tuple sort
    # cannot order; repr is total and both sides are normed identically.
    return sorted(
        (tuple(norm(r[i]) for i in order) for r in rows), key=repr
    )


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)] or sorted(QUERIES)

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in names:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in ORACLE:
                print(f"{name:28s} rows-only: {len(srows)} rows  (no oracle)")
                continue
            res = con.execute(ORACLE[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
            sc, dc = canon(srows, scols), canon(drows, dcols)
            if sorted(scols) != sorted(dcols):
                print(f"{name:28s} COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
                failed.append(name)
            elif sc == dc:
                print(f"{name:28s} OK ({len(srows)} rows)")
            else:
                print(f"{name:28s} VALUE MISMATCH ({len(sc)} vs {len(dc)} rows)")
                for a, b in list(zip(sc, dc))[:5]:
                    if a != b:
                        print("   spark:", a)
                        print("   duck :", b)
                if len(sc) != len(dc):
                    only_s = [r for r in sc if r not in dc][:3]
                    only_d = [r for r in dc if r not in sc][:3]
                    print("   only-spark:", only_s)
                    print("   only-duck :", only_d)
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
