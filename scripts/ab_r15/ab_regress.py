"""Interleaved A/B check: did f5a94e0 (winsorize fuse, cc lazy ckpt) or
7e4bef8 (repetition fuse) regress? Old module code is materialized from
git into /tmp/oldmods and imported standalone. Reps interleave ABAB so
host drift cancels. Prints one JSON line per case."""
import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def load_mod(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    from pysparkdb.queries.base import tables
    from pysparkdb.session import get_spark
    from pyspark.sql import functions as F

    # old module: git show f5a94e0^:pysparkdb/pipeline/cluster.py
    old_cluster = load_mod("/tmp/oldmods/cluster_old.py", "cluster_old")
    old_text = load_mod("/tmp/oldmods/text_old.py", "text_old")  # git show 7e4bef8^:pysparkdb/pipeline/text.py
    import pysparkdb.pipeline.cluster as new_cluster
    import pysparkdb.pipeline.text as new_text
    from pysparkdb.pipeline import dedup

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab", master=f"local[{cpus}]", extra_confs={
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    t = tables(spark, sf_dir)
    l, d = t["lineitem"], t["documents"]

    def wins_old():
        return l.groupBy("l_returnflag").agg(
            F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"))

    def wins_new():
        return l.groupBy("l_returnflag").agg(
            F.expr("percentile(l_extendedprice, array(0.05, 0.95))").alias("_pe")
        ).select("l_returnflag", F.col("_pe")[0].alias("p05"),
                 F.col("_pe")[1].alias("p95"))

    def rep_old():
        return old_text.repetition_metrics(d)

    def rep_new():
        return new_text.repetition_metrics(d)

    def cc_old():
        pairs = dedup.ngram_jaccard_pairs(d, threshold=0.5)
        return old_cluster.connected_components(pairs)

    def cc_new():
        pairs = dedup.ngram_jaccard_pairs(d, threshold=0.5)
        return new_cluster.connected_components(pairs)

    cases = [
        ("winsorize_pass1", wins_old, wins_new),
        ("repetition", rep_old, rep_new),
        ("cc_ngram", cc_old, cc_new),
    ]
    reps = int(os.environ.get("AB_REPS", "5"))
    for name, fa, fb in cases:
        ta, tb = [], []
        # warm both once
        fa().collect(); fb().collect()
        for _ in range(reps):
            t0 = time.perf_counter(); fa().collect(); ta.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); fb().collect(); tb.append(time.perf_counter() - t0)
        print(json.dumps({
            "case": name,
            "old_reps": [round(x, 3) for x in ta],
            "new_reps": [round(x, 3) for x in tb],
            "old_median": round(statistics.median(ta), 3),
            "new_median": round(statistics.median(tb), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
