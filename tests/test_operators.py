"""Operator-level queries hash-match the DuckDB oracle."""

import pytest

from pysparkdb.queries import load_all
from tests.oracle import compare, duckdb_conn

SPECS = [s for s in load_all().values() if "ops" in s.tags]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_operator_query(spark, sf_dir, con, spec):
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    compare(df, con, spec.oracle)


def test_join_type_validation(spark, sf_dir):
    from pysparkdb import operators as O
    from pysparkdb.queries.base import tables

    t = tables(spark, sf_dir)
    with pytest.raises(ValueError, match="join type"):
        O.hash_join(t["customer"], t["orders"], ["c_custkey"], "cross")


def test_date_extract_validation():
    from pysparkdb import functions as X

    with pytest.raises(ValueError, match="unit"):
        X.date_extract("o_orderdate", "WEEK")
