#!/usr/bin/env python
"""Frozen-baseline staleness audit (BENCH_BASELINE.md protocol).

A frozen per-query row that drifts far ABOVE a query's healthy central
tendency is a dead tripwire: the 2x regression wire is armed relative to
the row, so a query can regress 3-4x between sweeps while its ratio to
the stale row stays under 2 (the round-11 `dedup_embedding` case: frozen
3.8766 from the round-3 protocol era, healthy readings 1.30-1.63 s, a
5.84 s reading passed as "1.51x"). A row far BELOW central tendency is
the opposite defect: every healthy sweep reads as a near-breach
(the pre-re-freeze `ev_interval_overlap` case).

This script compares every frozen row against the query's MEDIAN across
the recorded full-protocol sweeps passed on the command line (default:
the last three recorded rounds) and flags rows off by more than
AUDIT_RATIO in either direction. Flagged rows should be re-frozen from
current-protocol sweeps — with an explicit variance band when the
healthy pool warrants one (the ev_stateful / ev_interval_overlap
precedent) — and the audit output recorded in BENCH_BASELINE.md.

Parsing rules (same as the round-judge's independent parse):
- markdown table rows `| name | value |` anywhere in the file; a LATER
  occurrence of the same name supersedes an earlier one (round sections
  re-freeze rows by adding a new table);
- prose band re-freezes `**name X ± Y**`; the band row supersedes any
  table row for that name and carries its band into the report.

Usage:
    python scripts/baseline_staleness_audit.py [BENCH_json ...]
"""

from __future__ import annotations

import json
import re
import statistics
import sys

AUDIT_RATIO = 1.5
DEFAULT_SWEEPS = [
    "BENCH_r10_local.json",  # warm-pool protocol era starts at r10
    "BENCH_r11_local.json",
    "BENCH_r12_local.json",
]


def parse_frozen(path: str = "BENCH_BASELINE.md"):
    text = open(path).read()
    frozen: dict[str, float] = {}
    bands: dict[str, float] = {}
    # table rows carry one or two (name, value) pairs per line —
    # `| name | 0.123 | name | 0.456 |` — so split on pipes and walk
    # adjacent cells rather than regexing whole rows
    for line in text.splitlines():
        if "|" not in line:
            continue
        cells = [c.strip() for c in line.split("|")]
        for a, b in zip(cells, cells[1:]):
            if re.fullmatch(r"[a-z][a-z0-9_]*", a) \
                    and re.fullmatch(r"[0-9]+\.[0-9]+", b):
                frozen[a] = float(b)
    # prose band re-freezes: "ev_stateful 2.80 ± 0.5" /
    # "`ev_interval_overlap` 1.35 ± 0.7" (bold may wrap the sentence)
    for m in re.finditer(
            r"`?([a-z][a-z0-9_]+)`?\s+([0-9]+\.[0-9]+)\s*±\s*([0-9]+(?:\.[0-9]+)?)",
            text):
        frozen[m.group(1)] = float(m.group(2))
        bands[m.group(1)] = float(m.group(3))
    return frozen, bands


def main(argv: list[str]) -> int:
    sweep_paths = argv or [p for p in DEFAULT_SWEEPS]
    sweeps = []
    for p in sweep_paths:
        try:
            d = json.load(open(p))
        except FileNotFoundError:
            print(f"(skipping missing sweep {p})", file=sys.stderr)
            continue
        sweeps.append((p, d["queries"]))
    if len(sweeps) < 2:
        print("need at least two recorded sweeps", file=sys.stderr)
        return 2

    frozen, bands = parse_frozen()
    flagged = []
    for name, row in sorted(frozen.items()):
        reads = [q[name] for _, q in sweeps if name in q]
        if len(reads) < 2:
            continue
        med = statistics.median(reads)
        if med <= 0:
            continue
        ratio = row / med
        if ratio > AUDIT_RATIO or ratio < 1 / AUDIT_RATIO:
            flagged.append((name, row, bands.get(name), med, reads, ratio))

    print(f"frozen rows parsed: {len(frozen)} ({len(bands)} with bands); "
          f"sweeps: {', '.join(p for p, _ in sweeps)}")
    if not flagged:
        print(f"no frozen row off by >{AUDIT_RATIO}x from its "
              f"recorded-sweep median — no re-freeze needed")
        return 0
    print(f"rows off by >{AUDIT_RATIO}x (re-freeze candidates):")
    for name, row, band, med, reads, ratio in flagged:
        b = f" ± {band}" if band is not None else ""
        print(f"  {name}: frozen {row}{b} vs sweep median {med:.3f} "
              f"({'%.2f' % ratio}x; reads "
              f"{'/'.join('%.2f' % r for r in reads)})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
