"""Predicate-transfer crossover measurement (VERDICT r3 #6 / r5 #10).

The CIDR-2024 pre-pass (pysparkdb.plans.predicate_transfer) costs a fixed
set of broadcast semi-join jobs and saves a fraction of the fact-side
shuffle. At sf0.1 every baseline is sub-second, so the pass can never pay
for itself there; the crossover lives where the fact shuffle dominates.
This script holds the pre-pass cost constant and scales the FACT side
k-fold (orders/lineitem replicated with offset orderkeys — dimension
selectivity, key distributions, and the join graph are unchanged), then
times the same multi-hop-selective query with and without the engine's
predicate_transfer auto mode.

Run:  python scripts/pred_transfer_crossover.py [k ...]   (default 1 8 32)
Writes one result line per k; the measured table lives in SCALE.md.
"""

import shutil
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pysparkdb import Engine  # noqa: E402
from pysparkdb.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
STAGE = Path(__file__).resolve().parent.parent / ".crossover_stage"

QUERY = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
                AS DOUBLE) AS revenue
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey AND n_name = 'NATION_7'
    GROUP BY n_name
"""


def stage(spark, k: int) -> str:
    """k-fold fact replication: orderkeys offset per copy so the orders to
    lineitem join stays key-unique; dims symlinked unchanged."""
    d = STAGE / f"k{k}"
    if (d / "_done").exists():
        return str(d)
    shutil.rmtree(d, ignore_errors=True)
    d.mkdir(parents=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        (d / f"{t}.parquet").symlink_to(f"{SRC}/{t}.parquet")
    off = 10**10
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    lineitem = spark.read.parquet(f"{SRC}/lineitem.parquet")
    for name, df, key in (("orders", orders, "o_orderkey"),
                          ("lineitem", lineitem, "l_orderkey")):
        copies = [df.withColumn(key, F.col(key) + F.lit(i * off)) for i in range(k)]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    (d / "_done").touch()
    return str(d)


def median_time(eng, pt, reps: int = 3) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        eng.sql(QUERY, predicate_transfer=pt).collect()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    # local[8] + 64 shuffle partitions models ONE executor's slice of a
    # large cluster: the fact shuffle is genuinely expensive relative to the
    # pre-pass's broadcast semi joins, which is the regime the CIDR paper
    # (and the reference's PRED_TRANS mode) targets.
    spark = get_spark(
        "pred-transfer-crossover", master="local[8]",
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "16g",
                     "spark.sql.shuffle.partitions": "64"},
    )
    for k in ks:
        d = stage(spark, k)
        eng = Engine(spark).attach(d, validate=False)
        base = median_time(eng, pt=False)
        pt = median_time(eng, pt=True)
        # cost-based third mode: should track min(baseline, transfer) at
        # every scale — off below the crossover, on above it
        auto = median_time(eng, pt="auto")
        rows = eng.sql(QUERY).count()
        print(f"k={k:3d} fact_rows~{600_000 * k:>9,}  baseline={base:6.2f}s  "
              f"transfer={pt:6.2f}s  auto={auto:6.2f}s  "
              f"ratio={pt / base:4.2f}  auto_ratio={auto / min(base, pt):4.2f}  "
              f"result_rows={rows}")


if __name__ == "__main__":
    main()
