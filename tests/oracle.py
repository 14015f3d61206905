"""DuckDB oracle comparison harness.

Mirrors the driver's t2 check: run the Spark query and the oracle SQL on the
same parquet tables, compare row count, column names, and order-insensitive
values (with small float tolerance in tests; the registered queries also
round on both sides so the driver's exact hash matches).
"""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # exact: registered queries are engineered for bit-equality
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (int,)):
        return int(v)
    return v


def rows_to_multiset(rows, columns):
    """Sort columns by name (driver convention), normalize values."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


def compare(spark_df, con, oracle_sql: str, *, allow_empty: bool = False) -> None:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(oracle_sql)
    o_rows = rel.fetchall()
    o_cols = rel.columns
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count {len(s_rows)} vs {len(o_rows)}"
    # Non-vacuity guard: two empty frames compare equal while exercising none
    # of the logic the comparison is cited as evidence for (truncated testdata,
    # a filter that matches nothing at this scale factor). Queries whose
    # correct answer is legitimately empty must opt in with allow_empty=True.
    if not allow_empty:
        assert s_rows, "oracle comparison is vacuous: both sides returned 0 rows"
    s_ms = rows_to_multiset([tuple(r) for r in s_rows], s_cols)
    o_ms = rows_to_multiset(o_rows, o_cols)
    mismatches = [
        (a, b) for a, b in zip(s_ms, o_ms) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
