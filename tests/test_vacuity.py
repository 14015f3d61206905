"""Vacuous-evidence guard over every registered oracle.

A query can be green against its oracle while proving nothing: both
engines agree on an EMPTY result, on a column that is zero for every row
(an IS NULL branch no row satisfies, a window bin that never advances, a
null counter on a null-free corpus), or on a certificate that is FALSE
everywhere. The ninth round-8 review wave added the empty-RESULT guard to
``oracle.compare``; this test is the stronger column-level sweep that
caught five more semi-vacuous kernels late in round 8 (op_expr_isnull,
text_pack, op_profile, mm_audio_features zero-crossings, mm_chunk_audio
framing): for every registered oracle at the driver's correctness SF, no
numeric output column may be zero/NULL for every row and no boolean
column FALSE for every row — unless the (query, column) pair is
explicitly adjudicated below.

DuckDB-only (no Spark session): the oracle is definitionally the same
values the Spark side must hash-match, so scanning it scans both.
"""

from __future__ import annotations

import numbers

import pytest

from pysparkdb.queries import load_all
from tests.oracle import duckdb_conn

# (query, column) pairs adjudicated as legitimately constant at sf0.01 —
# each with the reason the evidence is still real. Additions require the
# same adjudication, not a reflexive allowlisting.
ADJUDICATED: dict[tuple[str, str], str] = {
    # every synthetic day carries all 24 hours of events; the constant 24
    # (not 1) is itself the proof the daily grain aggregated hourly rows
    ("ev_rollup_cascade", "n_hours"): "uniform corpus: 24 hours every day",
}

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracles():
    con = duckdb_conn(SF_DIR)
    try:
        yield {
            name: spec.oracle
            for name, spec in load_all().items()
            if spec.oracle is not None
        }, con
    finally:
        con.close()


def test_no_oracle_is_column_vacuous(oracles):
    specs, con = oracles
    findings = []
    for name, sql in sorted(specs.items()):
        rel = con.sql(sql)
        rows = rel.fetchall()
        if not rows:
            # compare() itself rejects empty==empty unless a query opts
            # in; surfacing it here too names the query in one place
            findings.append(f"{name}: EMPTY result")
            continue
        for ci, col in enumerate(rel.columns):
            if (name, col) in ADJUDICATED:
                continue
            vals = [r[ci] for r in rows]
            non_null = [v for v in vals if v is not None]
            if non_null and all(isinstance(v, bool) for v in non_null):
                if not any(non_null):
                    findings.append(
                        f"{name}.{col}: boolean FALSE for all {len(rows)} rows"
                    )
                continue
            if all(
                (isinstance(v, numbers.Number) and v == 0) or v is None
                for v in vals
            ):
                findings.append(
                    f"{name}.{col}: zero/NULL for all {len(rows)} rows "
                    "(the kernel this column evidences never did real work "
                    "at the correctness SF — reshape the query to probe a "
                    "populated domain, or adjudicate it above)"
                )
    assert not findings, "\n".join(findings)
