"""A/B: pipeline_snapshot_curation with the compact/curate pool parallel
(new) vs forced serial (old semantics), interleaved; then oracle check."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import concurrent.futures as cf

_RealPool = cf.ThreadPoolExecutor


class SerialPool(_RealPool):
    def __init__(self, max_workers=None, **kw):
        super().__init__(max_workers=1, **kw)


def main():
    from pysparkdb.queries.base import tables
    from pysparkdb.session import get_spark
    import pysparkdb.queries.pipeline as qp

    sf_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_sc", master=f"local[{cpus}]", extra_confs={
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    tables(spark, sf_dir)

    def run(serial):
        cf.ThreadPoolExecutor = SerialPool if serial else _RealPool
        try:
            t0 = time.perf_counter()
            qp.pipeline_snapshot_curation(spark, sf_dir).collect()
            return time.perf_counter() - t0
        finally:
            cf.ThreadPoolExecutor = _RealPool

    run(True); run(False)  # warm
    ta, tb = [], []
    for _ in range(5):
        ta.append(run(True))
        tb.append(run(False))
    print(json.dumps({
        "case": "snapcur_overlap",
        "serial_reps": [round(x, 3) for x in ta],
        "parallel_reps": [round(x, 3) for x in tb],
        "serial_median": round(statistics.median(ta), 3),
        "parallel_median": round(statistics.median(tb), 3),
    }), flush=True)

    from pysparkdb.queries import load_all
    from oracle import compare, duckdb_conn
    specs = load_all()
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duckdb_conn(sf)
        df = specs["pipeline_snapshot_curation"].fn(spark, sf)
        compare(df, con, specs["pipeline_snapshot_curation"].oracle)
        print(f"oracle-match pipeline_snapshot_curation {sf}", flush=True)


if __name__ == "__main__":
    main()
