"""Shared helpers for query definitions."""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysparkdb.catalog import Catalog

# One Catalog per (session, data_dir): parquet footers are read once.
# Weak-keyed on the session so a stopped/discarded SparkSession releases
# its catalogs (an id()-keyed dict would both pin every session forever
# and risk serving a STALE catalog to a new session that reuses the old
# object's id after gc).
_CATALOGS: "weakref.WeakKeyDictionary[SparkSession, dict[str, Catalog]]" = (
    weakref.WeakKeyDictionary()
)


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    per_session = _CATALOGS.setdefault(spark, {})
    if sf_dir not in per_session:
        from pysparkdb.session import apply_engine_confs

        apply_engine_confs(spark)  # driver may hand us an untuned session
        per_session[sf_dir] = Catalog(spark, sf_dir).register_all(validate=True)
    return per_session[sf_dir].tables


def r2(c) -> F.Column:
    """Round a per-row (not aggregated) double to 2 decimals."""
    return F.round(c, 2)


def dsum(c) -> F.Column:
    """Order-insensitive exact double sum.

    Rounding a double SUM is not hash-stable: summation order differs
    between engines/runs and TPC-H money values land exactly on .xx5
    boundaries. Casting each summand to DECIMAL(25,6) first makes the sum
    exact and associative — bit-identical across Spark and DuckDB — and the
    final cast back to double is deterministic. Oracle-side equivalent:
    CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE).

    Scale note: decimal sums hold to ~1e19 at scale 6 — ample for 100 TB
    fact tables; Spark's partial/final aggregation applies to decimals the
    same as doubles.
    """
    return F.sum(c.cast("decimal(25,6)")).cast("double")


def davg(c) -> F.Column:
    """Order-insensitive exact double average: exact decimal sum divided by
    count — a single deterministic double division on both sides.
    Oracle: CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(x)."""
    return dsum(c) / F.count(c)


def ts(s: str) -> F.Column:
    """UTC timestamp literal (testdata date columns are timestamps)."""
    return F.lit(s).cast("timestamp")


def bigint(c) -> F.Column:
    """Counts as BIGINT on both sides (DuckDB SUM(BIGINT) widens to HUGEINT)."""
    return c.cast("long")


# Re-export: the implementation moved to functions/local_rows.py (round 15)
# so engine code can use it without importing from the query registry; the
# seven reshaped certificate queries keep importing it from here.
from pysparkdb.functions.local_rows import jvm_rows_df  # noqa: E402, F401
