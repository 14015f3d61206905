"""Operator-level queries hash-match the DuckDB oracle."""

import pytest

from pysparkdb.queries import load_all
from tests.oracle import compare, duckdb_conn

SPECS = [s for s in load_all().values() if "ops" in s.tags and s.oracle is not None]


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


class TestAsOfJoin:
    """as_of_join edge semantics (operators/asof.py)."""

    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, 100), (2, 10, 250), (3, 20, 150), (4, 30, 100)],
            "eid long, k long, t long",
        )
        right = spark.createDataFrame(
            [(10, 100, "a"), (10, 200, "b"), (20, 151, "c")],
            "rk long, rt long, tag string",
        )
        return left, right

    def test_backward_pick_and_outer_nulls(self, spark):
        from pysparkdb.operators import as_of_join

        left, right = self._frames(spark)
        out = {
            r.eid: (r.rt, r.tag)
            for r in as_of_join(left, right, "k", "rk", "t", "rt").collect()
        }
        assert out[1] == (100, "a")     # tie: rt == t is visible (inclusive)
        assert out[2] == (200, "b")     # most recent of two matches
        assert out[3] == (None, None)   # right row is later than t → no match
        assert out[4] == (None, None)   # key absent on right → left-outer null

    def test_no_row_multiplication(self, spark):
        from pysparkdb.operators import as_of_join

        left, right = self._frames(spark)
        assert as_of_join(left, right, "k", "rk", "t", "rt").count() == left.count()


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """HLL++ estimate within 5% of exact count distinct per group."""
    from pysparkdb.queries import load_all
    from pysparkdb.queries.base import tables
    import pyspark.sql.functions as F

    approx = {
        r.o_orderpriority: r.approx_customers
        for r in load_all()["op_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in tables(spark, sf_dir)["orders"]
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)
