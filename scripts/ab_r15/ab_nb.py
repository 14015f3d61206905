"""A/B: naive_bayes_predict old (HEAD, 7-scan) vs new (1-pass), interleaved,
result-identity check, and oracle compare of the registered query at 3 SFs."""
import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def load_mod(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    from pysparkdb.queries.base import tables
    from pysparkdb.session import get_spark
    import pysparkdb.pipeline.text as new_text

    old_text = load_mod("/tmp/oldmods/text_head.py", "text_head")  # git show fe9f2cb^:pysparkdb/pipeline/text.py

    sf_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_nb", master=f"local[{cpus}]", extra_confs={
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    d = tables(spark, sf_dir)["documents"]

    # result identity: full prediction frames must be row-identical
    a = old_text.naive_bayes_predict(d).orderBy("id").collect()
    b = new_text.naive_bayes_predict(d).orderBy("id").collect()
    assert a == b, f"prediction mismatch: {len(a)} vs {len(b)} rows"
    print(f"identity ok: {len(a)} prediction rows equal", flush=True)

    ta, tb = [], []
    for _ in range(5):
        t0 = time.perf_counter(); old_text.naive_bayes_predict(d).collect(); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); new_text.naive_bayes_predict(d).collect(); tb.append(time.perf_counter() - t0)
    print(json.dumps({
        "case": "naive_bayes",
        "old_reps": [round(x, 3) for x in ta],
        "new_reps": [round(x, 3) for x in tb],
        "old_median": round(statistics.median(ta), 3),
        "new_median": round(statistics.median(tb), 3),
    }), flush=True)

    from pysparkdb.queries import load_all
    from oracle import compare, duckdb_conn
    specs = load_all()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        con = duckdb_conn(sf)
        df = specs["text_naive_bayes"].fn(spark, sf)
        compare(df, con, specs["text_naive_bayes"].oracle)
        print(f"oracle-match text_naive_bayes {sf}", flush=True)


if __name__ == "__main__":
    main()
