"""Dump ``explain("formatted")`` for named registry queries to files.

Round-11 deliverable support: the judge checks plan claims against
committed ``plans/r11/<query>_{before,after}.txt`` files.  Usage:

    python tools/dump_plan.py <suffix> [sf_dir] q1 q2 ...

writes ``plans/r11/<query>_<suffix>.txt`` for each query.  The plan is
captured from the DataFrame the registry callable returns — the same
object bench.py times — so Exchange counts / join strategies / pushdown
in the file are the bench's plan, not a reconstruction.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lachesis_spark.registry import QUERIES
from lachesis_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = [a for a in rest if not os.path.isdir(a)]
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLAN_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt.splitlines())} lines, {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()
