"""Shared helpers for query definitions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysparkdb.catalog import Catalog

# One Catalog per (session, data_dir): parquet footers are read once.
_CATALOGS: dict[tuple[int, str], Catalog] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CATALOGS:
        from pysparkdb.session import apply_engine_confs

        apply_engine_confs(spark)  # driver may hand us an untuned session
        _CATALOGS[key] = Catalog(spark, sf_dir).register_all(validate=True)
    return _CATALOGS[key].tables


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
