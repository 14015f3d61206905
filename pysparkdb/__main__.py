"""CLI: run any registered query and audit its plan.

    python -m pysparkdb q5                  # run at sf0.001, print rows
    python -m pysparkdb q5 --sf /root/testdata/sf0.01 --audit
    python -m pysparkdb --list              # list the registry

The interactive-client role of the reference (fpdb-main/src/Client.cpp
prints the result table and, with SHOW_SCAN_METRICS, scan evidence).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pysparkdb")
    p.add_argument("query", nargs="?", help="registered query name")
    p.add_argument("--sf", default="/root/testdata/sf0.001", help="data directory")
    p.add_argument("--audit", action="store_true", help="print the scan audit + plan")
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument("-n", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    from pysparkdb.queries import load_all

    specs = load_all()
    if args.list or not args.query:
        for name, spec in sorted(specs.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:24s} [{oracle}] {' '.join(spec.tags)}")
        return 0
    if args.query not in specs:
        print(f"unknown query {args.query!r}; --list shows the registry", file=sys.stderr)
        return 2

    from pysparkdb import Engine
    from pysparkdb.session import get_spark

    eng = Engine(get_spark("pysparkdb-cli"))
    eng.spark.sparkContext.setLogLevel("ERROR")
    df = specs[args.query].fn(eng.spark, args.sf)
    if args.audit:
        audit = eng.scan_audit(df)
        print("pushed_filters:", audit["pushed_filters"])
        print("read_columns:  ", audit["read_columns"])
        print("codegen_stages:", audit["codegen_stages"])
    t0 = time.perf_counter()
    df.show(args.n, truncate=False)
    print(f"[{args.query}] {time.perf_counter() - t0:.3f}s at {args.sf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
