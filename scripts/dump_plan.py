"""Dump `.explain("formatted")` for named queries to plans/<outdir>/.

Usage: python scripts/dump_plan.py <suffix> <query> [query ...]
Writes plans/r15/<query>_<suffix>.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pysparkdb.queries import load_all
    from pysparkdb.queries.base import tables
    from pysparkdb.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans", master="local[8]", extra_confs={
        "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tables(spark, sf_dir)
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    specs = load_all()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name, suffix, flush=True)


if __name__ == "__main__":
    main()
