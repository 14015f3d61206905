"""Every registered SSB-adapted query hash-matches the DuckDB oracle.

Mirrors the reference's SSB e2e suite (fpdb-main/test/SSBTest.cpp: all 13
queries through the full stack), with the DuckDB oracle replacing golden
result files (resources/result/ssb-sf0.01/).
"""

import pytest

from pysparkdb.queries import load_all
from tests.oracle import compare, duckdb_conn

SPECS = [s for s in load_all().values() if "ssb" in s.tags]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_all_13_flights_present():
    originals = [s for s in SPECS
                 if "generated" not in s.tags and "typed" not in s.tags]
    typed = [s for s in SPECS if "typed" in s.tags]
    assert len(originals) == 13  # 1.1-1.3, 2.1-2.3, 3.1-3.4, 4.1-4.3
    assert len(typed) == 13      # typed/ corpus: same flights, cast discipline
    assert len(SPECS) == 31      # + the 5 generated/ corpus variants


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_ssb_query(spark, sf_dir, con, spec):
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    compare(df, con, spec.oracle)
