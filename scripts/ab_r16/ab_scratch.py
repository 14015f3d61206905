"""A/B: ephemeral stream-checkpoint/snapshot scratch on disk (/tmp — the
pre-r16 behavior: Spark's implicit temp checkpoint and tempfile.mkdtemp
both land on java.io.tmpdir) vs scratch_root()'s tmpfs default
(/dev/shm). Interleaved ABAB in ONE session so host drift prices both
arms equally (the r15 methodology). PYSPARKDB_SCRATCH is read per call,
so the arms flip via the env var in-process.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_r16/ab_scratch.py [pairs]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pysparkdb.queries import load_all
    from pysparkdb.queries.base import tables
    from pysparkdb.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_scratch", master=f"local[{cpus}]", extra_confs={
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    tables(spark, sf_dir)
    specs = load_all()
    names = ["ev_stream_join", "ev_stateful", "pipeline_snapshot_curation",
             "pipeline_incremental_refresh", "pipeline_schema_evolution"]
    # warm both pools once
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long").count()
    out = {}
    for name in names:
        fn = specs[name].fn
        fn(spark, sf_dir).collect()  # warm (codegen, catalog) — untimed
        a_times, b_times = [], []
        for _ in range(pairs):
            for arm, bucket in (("/tmp", a_times), ("", b_times)):
                if arm:
                    os.environ["PYSPARKDB_SCRATCH"] = arm
                else:
                    os.environ.pop("PYSPARKDB_SCRATCH", None)
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                bucket.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "disk_tmp": a_times, "tmpfs": b_times,
            "median_disk": round(statistics.median(a_times), 3),
            "median_tmpfs": round(statistics.median(b_times), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
