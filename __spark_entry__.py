"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — smoke: flagship query at sf0.001.
queries()      — every implemented operator/query from SURVEY.md §2, from the
                 pysparkdb query registry (pysparkdb/queries/*).
oracle_sql()   — matching DuckDB oracle SQL for the SQL-expressible subset;
                 registry entries with oracle=None get the weaker rows-only
                 check (documented per-query in their docstrings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 6-table join → group → sort) on
    /root/testdata/sf0.001."""
    from pysparkdb.queries import load_all

    return load_all()["q5"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pysparkdb.queries import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from pysparkdb.queries import load_all

    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
