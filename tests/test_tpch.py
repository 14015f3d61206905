"""Every registered TPC-H-adapted query hash-matches the DuckDB oracle."""

import pytest

from pysparkdb.queries import load_all
from tests.oracle import compare, duckdb_conn

SPECS = [s for s in load_all().values() if "tpch" in s.tags]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_tpch_query(spark, sf_dir, con, spec):
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    compare(df, con, spec.oracle)
