"""Four-way execution-mode bench (VERDICT r7 #3).

The reference's principal demo is the SAME query run under its four
execution modes — PULL_UP / PUSHDOWN_ONLY / CACHING_ONLY / HYBRID
(fpdb-plan/include/fpdb/plan/Mode.h:13-18, exec.conf:4 MODE=; measured by
fpdb-main/test/HybridTest.cpp and CachingOnlyTest.cpp) — reporting how
pushdown and the segment cache each move the needle. This script runs that
experiment through Engine.set_mode/sql(mode=...) on TPC-H Q6 (selective
scan-aggregate, the reference's caching-bench query) and SSB 2.1 (star
join), cold then warm per mode:

- cold  = fresh segment cache, first touch (caching/hybrid pay admission);
- warm  = second run (caching/hybrid serve the working set from the
  InMemoryRelation; pullup/pushdown re-scan parquet).

Run:  python scripts/mode_bench.py   (sf0.1, local[32]; ~1 min)
The measured table lives in SCALE.md ("Mode axis").
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pysparkdb.engine import MODES, Engine  # noqa: E402
from pysparkdb.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

Q6 = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

def _ssb2_1_sql():
    """The registered ssb2_1 oracle text (queries/ssb.py) — ANSI-portable,
    so the same string drives Engine.sql here."""
    from pysparkdb.queries import load_all

    return load_all()["ssb2_1"].oracle


def run(eng, name, query):
    rows = {}
    times = {}
    for mode in MODES:
        # fresh cache per mode so each measures its own admission cost
        eng._segment_cache = None
        eng.set_mode(mode)
        for phase in ("cold", "warm"):
            t0 = time.perf_counter()
            rows[mode] = eng.sql(query).collect()
            times[(mode, phase)] = time.perf_counter() - t0
    eng.set_mode("pushdown")
    base = rows["pushdown"]
    for mode in MODES:
        assert rows[mode] == base, f"{name}: mode {mode} diverged"
    print(f"\n{name}  (all four modes returned identical results)")
    print(f"  {'mode':<10} {'cold s':>8} {'warm s':>8}")
    for mode in MODES:
        print(
            f"  {mode:<10} {times[(mode, 'cold')]:>8.3f}"
            f" {times[(mode, 'warm')]:>8.3f}"
        )
    return times


def main():
    spark = get_spark("mode-bench")
    eng = Engine(spark).attach(SF_DIR, validate=False)
    # warm the file-listing/JIT path once so cold numbers measure the mode,
    # not session startup
    eng.sql("SELECT COUNT(*) AS n FROM lineitem").collect()
    run(eng, "q6", Q6)
    run(eng, "ssb2_1", _ssb2_1_sql())


if __name__ == "__main__":
    main()
