"""Pre-verify the DRIVER_WINDOW against the DuckDB oracle at sf0.01.

Run before each round's closing commit (round protocol). Mirrors the
driver's t2 check via tests/oracle.compare. Prints one line per query and a
final PASS/FAIL summary; exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from pysparkdb.queries import DRIVER_WINDOW, load_all
from oracle import compare, duckdb_conn


def main() -> int:
    sf_dir = os.environ.get("PYSPARKDB_SF_DIR", "/root/testdata/sf0.01")
    from pysparkdb.session import get_spark

    spark = get_spark()
    con = duckdb_conn(sf_dir)
    specs = load_all()
    failures = []
    for name in DRIVER_WINDOW:
        spec = specs[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                assert n >= 0
                status = f"rows-only ({n} rows)"
            else:
                compare(df, con, spec.oracle)
                status = "oracle-match"
            print(f"  OK   {name:32s} {time.time() - t0:6.2f}s  {status}", flush=True)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"  FAIL {name:32s} {time.time() - t0:6.2f}s  {e}", flush=True)
            traceback.print_exc()
    print(
        f"{len(DRIVER_WINDOW) - len(failures)}/{len(DRIVER_WINDOW)} green"
        + (f"  FAILURES: {failures}" if failures else ""),
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
