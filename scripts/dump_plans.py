"""Dump .explain("formatted") for named queries to plans/r16/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> <q1,q2,...> [sf_dir]
The judge checks plan claims in OPTIMIZATION_r15.md against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pysparkdb.queries import load_all
    from pysparkdb.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
