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


def _registered_sql(name):
    """The registered oracle text (ANSI-portable, so the same string
    drives Engine.sql here) — always the exact registered query, never a
    drift-prone inline copy."""
    from pysparkdb.queries import load_all

    return load_all()[name].oracle


def run(eng, name, query):
    rows = {}
    times = {}
    for mode in MODES:
        # fresh cache per mode so each measures its own admission cost;
        # clear_segment_cache UNPERSISTS the previous mode's segments —
        # merely dropping the manager would leave the InMemoryRelation in
        # Spark's CacheManager and serve the next mode's "cold" run warm
        eng.clear_segment_cache()
        eng.set_mode(mode)
        for phase in ("cold", "warm"):
            t0 = time.perf_counter()
            rows[mode] = eng.sql(query).collect()
            times[(mode, phase)] = time.perf_counter() - t0
    eng.set_mode("pushdown")
    eng.clear_segment_cache()
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
    run(eng, "q6", _registered_sql("q6"))
    run(eng, "ssb2_1", _registered_sql("ssb2_1"))


if __name__ == "__main__":
    main()
