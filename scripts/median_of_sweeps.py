#!/usr/bin/env python
"""Median-of-ok-sweeps combiner (BENCH_BASELINE.md round-14 protocol).

The per-round DEFINITIVE number used to be the best ("calm-window") of
the day's ok-gated sweeps — which biases the trend line down: a
round-over-round delta partly measures how lucky the closing day was
(VERDICT r13, "What's wrong" #3). This script combines several ok-gated
sweep JSONs from ONE round into a single JSON of per-query MEDIANS
(same shape as a bench.py record, "metric" marked median-of-sweeps), so
BENCH_BASELINE.md can record BOTH numbers and
scripts/baseline_staleness_audit.py can consume the unbiased median
series.

Usage:
    python scripts/median_of_sweeps.py OUT.json SWEEP1.json [SWEEP2.json ...]

Sweeps whose "phase" is not "ok" are refused (a degraded sweep must not
contaminate the median any more than it may become a record); pass
--allow-degraded to override deliberately (e.g. a round with a single
ok window).
"""

from __future__ import annotations

import json
import statistics
import sys


def main(argv: list[str]) -> int:
    allow_degraded = "--allow-degraded" in argv
    argv = [a for a in argv if a != "--allow-degraded"]
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    out_path, sweep_paths = argv[0], argv[1:]
    sweeps = []
    for p in sweep_paths:
        with open(p) as f:
            d = json.load(f)
        phase = d.get("phase", "unknown")
        if phase != "ok" and not allow_degraded:
            print(f"refusing {p}: phase={phase!r} (pass --allow-degraded "
                  f"to override)", file=sys.stderr)
            return 3
        sweeps.append(d)
    names = set()
    for d in sweeps:
        names.update(d["queries"])
    per_query = {}
    for n in sorted(names):
        reads = [d["queries"][n] for d in sweeps if n in d["queries"]]
        per_query[n] = round(statistics.median(reads), 4)
    out = {
        "metric": "pysparkdb headline queries total wall-clock "
                  "(median of ok-gated sweeps)",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "sf": sweeps[0].get("sf"),
        "n_sweeps": len(sweeps),
        "source_sweeps": sweep_paths,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(json.dumps({"value": out["value"], "n_sweeps": len(sweeps),
                      "out": out_path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
