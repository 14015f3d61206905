"""Per-query phase profiler for optimization rounds.

For each named query: REPEATS full fn().collect() timings (bench
methodology — warm caches across reps, median reported) plus one split
rep separating fn() construction (driver-side/eager work) from the
collect. Prints one JSON line per query so sweeps can be diffed.

Usage:
    python scripts/profile_queries.py q1 q6 ...            # sf from env
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python scripts/profile_queries.py --all-over 1.0
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pysparkdb.queries import load_all
    from pysparkdb.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("PROFILE_REPEATS", "3"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    specs = load_all()

    if "--all-over" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--all-over") + 1])
        ref = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_r15_open.json")))["queries"]
        names = [n for n, s in sorted(ref.items(), key=lambda x: -x[1])
                 if s >= thr and n in specs]
    else:
        names = args
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # mirror bench.py's session exactly (16 GiB driver heap — a 1 GiB
    # default heap inflates streaming/compaction queries 2-3x)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark = get_spark("profile", master=f"local[{cpus}]", extra_confs={
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    })
    spark.sparkContext.setLogLevel("ERROR")
    # warm: catalog + python worker pool (mirrors bench warm-up)
    from pysparkdb.queries.base import tables
    tables(spark, sf_dir)

    for name in names:
        spec = specs[name]
        out = {"name": name, "reps": []}
        for _ in range(repeats):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            out["reps"].append(round(time.perf_counter() - t0, 4))
        # split rep: fn() construction vs action
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_fn = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.collect()
        t_act = time.perf_counter() - t0
        out["median"] = round(sorted(out["reps"])[len(out["reps"]) // 2], 4)
        out["fn_sec"] = round(t_fn, 4)
        out["collect_sec"] = round(t_act, 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
