"""A/B: ev_stateful stream run at 32 vs 8 shuffle partitions, interleaved,
plus oracle check of the committed body at sf0.01 and sf0.1."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pysparkdb.queries.base import tables
from pysparkdb.session import get_spark
from pyspark.sql import functions as F


def run_variant(spark, sf_dir, parts):
    from pysparkdb import streaming as S
    from pysparkdb.queries.streaming import _events_stream_dir

    stream = S.read_events_stream(spark, _events_stream_dir(sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        out = S.run_to_memory(
            S.stateful_user_counter(stream), f"ev_sf_sink_{parts}",
            output_mode="update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return out.groupBy("user_id").agg(
        F.max("n_events").cast("long").alias("n_events"))


def main():
    sf_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_ev", master=f"local[{cpus}]", extra_confs={
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    tables(spark, sf_dir)

    # warm both
    run_variant(spark, sf_dir, 32).collect()
    run_variant(spark, sf_dir, 8).collect()
    ta, tb = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run_variant(spark, sf_dir, 32).collect(); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_variant(spark, sf_dir, 8).collect(); tb.append(time.perf_counter() - t0)
    print(json.dumps({
        "case": "ev_stateful_parts",
        "p32_reps": [round(x, 3) for x in ta],
        "p8_reps": [round(x, 3) for x in tb],
        "p32_median": round(statistics.median(ta), 3),
        "p8_median": round(statistics.median(tb), 3),
    }), flush=True)

    # oracle check of the committed body at both SFs
    from pysparkdb.queries import load_all
    from oracle import compare, duckdb_conn
    specs = load_all()
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duckdb_conn(sf)
        df = specs["ev_stateful"].fn(spark, sf)
        compare(df, con, specs["ev_stateful"].oracle)
        print(f"oracle-match ev_stateful {sf}", flush=True)


if __name__ == "__main__":
    main()
