"""Operator-level queries hash-match the DuckDB oracle."""

import pytest
from pyspark.sql import functions as F

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

    def test_null_keys_never_match(self, spark):
        """Join semantics: NULL keys don't equal NULL keys — a NULL-keyed
        left row stays unmatched even when a NULL-keyed right row exists."""
        from pysparkdb.operators import as_of_join

        left = spark.createDataFrame(
            [(1, None, 100), (2, 10, 250), (3, 10, None)],
            "eid long, k long, t long",
        )
        right = spark.createDataFrame(
            [(None, 50, "null-key"), (10, 200, "b"), (10, None, "null-ts")],
            "rk long, rt long, tag string",
        )
        out = {
            r.eid: (r.rt, r.tag)
            for r in as_of_join(left, right, "k", "rk", "t", "rt").collect()
        }
        assert out[1] == (None, None)   # NULL left key matches nothing
        assert out[2] == (200, "b")     # NULL-ts right row is not a match
        assert out[3] == (None, None)   # NULL left ts precedes everything
        assert len(out) == 3            # left-outer: all left rows kept


class TestRangeJoinBuckets:
    def test_pre_1970_timestamps(self, spark):
        """Bucket floor-division must align for negative epochs: truncating
        `div` sends -1us and +1us to the same bucket 0, splitting pairs that
        straddle more than one floor-bucket boundary."""
        from pysparkdb.operators.rangejoin import range_interval_join

        gap = 10_000_000  # 10s in micros
        lrows = [(1, -25_000_000), (1, -10_000_001), (1, -5_000_000)]
        rrows = [(1, -20_000_000), (1, -2_000_001), (1, 3_000_000)]
        l = spark.createDataFrame(lrows, "k long, lus long").withColumn(
            "l_ts", F.timestamp_micros("lus")
        )
        r = spark.createDataFrame(rrows, "k long, rus long").withColumn(
            "r_ts", F.timestamp_micros("rus")
        )
        got = {
            (x.lus, x.rus)
            for x in range_interval_join(
                l, r, key="k", left_ts="l_ts", right_ts="r_ts", max_gap_us=gap
            ).collect()
        }
        expect = {
            (lt, rt)
            for (_, lt) in lrows
            for (_, rt) in rrows
            if 0 < rt - lt <= gap
        }
        assert got == expect


def test_approx_percentile_within_error_bound(spark, sf_dir):
    """The self-certifying form asserts |approx − exact| ≤ 1.0 inside the
    query itself (GK accuracy 10000 → rank error ~n/10⁴, far inside a 1.0
    value bound on 1..50 quantities); here we check every certificate
    boolean is TRUE and that groups are non-trivial (a degenerate empty
    group-by would certify vacuously)."""
    from pysparkdb.queries import load_all

    rows = load_all()["op_approx_percentile"].fn(spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r.med_ok and r.p90_ok, r


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """HLL++ estimate within 5% of exact count distinct per group: the
    self-certifying form computes both sides in one aggregate; every
    within_bound must be TRUE and the exact counts must match a separately
    computed exact count-distinct."""
    from pysparkdb.queries import load_all
    from pysparkdb.queries.base import tables
    import pyspark.sql.functions as F

    got = {
        r.o_orderpriority: r
        for r in load_all()["op_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in tables(spark, sf_dir)["orders"]
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k].exact_customers == n
        assert got[k].within_bound, (k, got[k])


def test_registry_prefix_is_rotation_window():
    """Registration order is load-bearing: external correctness sweeps check
    the FIRST 50 registry entries, so the prefix must be exactly
    DRIVER_WINDOW — the rotation schedule of queries whose current form
    still needs a green driver row (new/reshaped/modified queries plus the
    oldest banked evidence). This inverts the former e2e-corpus pin: the
    TPC-H/SSB/events corpus banked green three consecutive rounds and has
    vacated the window. When editing a query or adding one, put its name in
    DRIVER_WINDOW (pysparkdb/queries/__init__.py) and retire an
    already-reverified name."""
    from pysparkdb.queries import DRIVER_WINDOW

    names = list(load_all())
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting is a pure distribution change: inner and left results must
    equal the unsalted join's exactly; right/full are rejected (small-side
    replication would duplicate unmatched build rows)."""
    from pysparkdb import operators as O
    from pysparkdb.queries.base import tables

    t = tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    o = t["orders"].select("o_orderkey", "o_orderstatus").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    for how in ("inner", "left"):
        plain = sorted(map(tuple, li.join(o, ["l_orderkey"], how).collect()))
        salted = sorted(
            map(tuple, O.salted_join(li, o, ["l_orderkey"], how, 8).collect())
        )
        assert salted == plain, how
    with pytest.raises(ValueError, match="salted join"):
        O.salted_join(li, o, ["l_orderkey"], "full")


def test_asof_tolerance_bounds_staleness(spark):
    """tolerance_s keeps a match at exactly the bound (inclusive) and
    nulls one just beyond it, leaving the left row present (left outer)."""
    from pyspark.sql import functions as F

    from pysparkdb.operators import as_of_join

    left = spark.createDataFrame(
        [(1, 10, 1000), (2, 10, 5000), (3, 20, 1000)], "eid long, k long, es long"
    ).withColumn("t", F.timestamp_seconds("es")).drop("es")
    right = spark.createDataFrame(
        [(10, 900, "fresh"), (20, 0, "stale")], "rk long, rs long, tag string"
    ).withColumn("rt", F.timestamp_seconds("rs")).drop("rs")
    out = {
        r.eid: r.tag
        for r in as_of_join(
            left, right, "k", "rk", "t", "rt", tolerance_s=100
        ).collect()
    }
    assert out[1] == "fresh"   # gap 100 == tolerance → inclusive keep
    assert out[2] is None      # gap 4100 > tolerance → nulled match
    assert out[3] is None      # gap 1000 > tolerance
    assert len(out) == 3       # left outer: every left row survives


def test_asof_date_columns_with_tolerance_and_nearest(spark):
    """DATE timestamp columns take the exact-microsecond branch: the
    numeric fallback's cast(date as double) is illegal and used to crash
    at analysis the moment tolerance_s or direction='nearest' was added
    (plain backward never referenced the cast and worked, masking it)."""
    from pyspark.sql import functions as F

    from pysparkdb.operators import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "2024-01-05"), (2, 10, "2024-03-01")], "eid long, k long, d string"
    ).withColumn("t", F.to_date("d")).drop("d")
    right = spark.createDataFrame(
        [(10, "2024-01-01", "near"), (10, "2023-01-01", "far")],
        "rk long, rd string, tag string",
    ).withColumn("rt", F.to_date("rd")).drop("rd")
    out = {
        r.eid: r.tag
        for r in as_of_join(
            left, right, "k", "rk", "t", "rt", tolerance_s=86400 * 30
        ).collect()
    }
    assert out[1] == "near"   # 4-day gap within the 30-day tolerance
    assert out[2] is None     # 60-day gap exceeds it
    nearest = {
        r.eid: r.tag
        for r in as_of_join(
            left, right, "k", "rk", "t", "rt", direction="nearest"
        ).collect()
    }
    assert nearest == {1: "near", 2: "near"}


def test_hash_join_rejects_unsatisfiable_broadcast(spark):
    """broadcast_right=True with a right/full outer join is a silently
    dropped hint in Catalyst (the preserved side cannot be the build
    side) — the operator must fail loudly instead of quietly paying the
    shuffle the caller believed was pinned away."""
    from pysparkdb.operators import hash_join

    a = spark.range(4).withColumnRenamed("id", "k")
    b = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full"):
        with pytest.raises(ValueError, match="broadcast_right"):
            hash_join(a, b, on=["k"], how=how, broadcast_right=True)
    # inner/left/semi keep the pinned broadcast
    plan = hash_join(
        a, b, on=["k"], how="left", broadcast_right=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_fractional_tolerance_inclusive(spark):
    """A fractional tolerance_s must round, not truncate, to microseconds:
    2.3 s is exactly representable as 2_300_000 µs only via round()
    (int() of 2.3*1e6 = 2_299_999 on binary floats), and the documented
    inclusive boundary must keep a match at exactly that gap."""
    from pyspark.sql import functions as F

    from pysparkdb.operators import as_of_join

    left = spark.createDataFrame(
        [(1, 10, 2_300_000)], "eid long, k long, us long"
    ).withColumn("t", F.timestamp_micros("us")).drop("us")
    right = spark.createDataFrame(
        [(10, 0, "boundary")], "rk long, rus long, tag string"
    ).withColumn("rt", F.timestamp_micros("rus")).drop("rus")
    out = as_of_join(
        left, right, "k", "rk", "t", "rt", tolerance_s=2.3
    ).collect()
    assert out[0].tag == "boundary"  # gap == tolerance exactly → kept


def test_asof_forward_picks_next_and_bounds(spark):
    """Forward as-of: the nearest FUTURE right row wins, an equal
    timestamp is inclusive, tolerance caps the look-ahead, and backward
    results are unaffected by the flipped order."""
    from pyspark.sql import functions as F

    from pysparkdb.operators import as_of_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 350), (3, 20, 100)], "eid long, k long, es long"
    ).withColumn("t", F.timestamp_seconds("es")).drop("es")
    right = spark.createDataFrame(
        [(10, 100, "same-ts"), (10, 400, "later"), (20, 900, "far")],
        "rk long, rs long, tag string",
    ).withColumn("rt", F.timestamp_seconds("rs")).drop("rs")
    fwd = {
        r.eid: r.tag
        for r in as_of_join(
            left, right, "k", "rk", "t", "rt",
            tolerance_s=100, direction="forward",
        ).collect()
    }
    assert fwd[1] == "same-ts"  # rt == t is inclusive
    assert fwd[2] == "later"    # gap 50 <= tolerance
    assert fwd[3] is None       # next is 800s away > tolerance
    assert len(fwd) == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, "k", "rk", "t", "rt", direction="sideways")


def test_asof_nearest_picks_closer_side_one_exchange(spark):
    """Nearest direction: closer candidate wins, exact tie goes backward,
    tolerance bounds both sides — and the dual-window evaluation plans
    over ONE exchange (never a self-join)."""
    from pyspark.sql import functions as F

    from pysparkdb.operators import as_of_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 210), (3, 10, 1000), (4, 20, 500)],
        "eid long, k long, es long",
    ).withColumn("t", F.timestamp_seconds("es")).drop("es")
    right = spark.createDataFrame(
        [(10, 90, "past"), (10, 220, "future"), (20, 400, "tie-past"),
         (20, 600, "tie-future")],
        "rk long, rs long, tag string",
    ).withColumn("rt", F.timestamp_seconds("rs")).drop("rs")
    df = as_of_join(left, right, "k", "rk", "t", "rt",
                    direction="nearest", tolerance_s=150)
    out = {r.eid: r.tag for r in df.collect()}
    assert out[1] == "past"        # 10s back vs 120s fwd → back
    assert out[2] == "future"      # 120s back vs 10s fwd → fwd
    assert out[3] is None          # 780s/∞ both beyond tolerance
    assert out[4] == "tie-past"    # 100s each way → backward bias
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan  # data + AQE read, no join
    assert "Join" not in plan, plan


def test_asof_null_left_ts_never_matches_any_direction(spark):
    """A NULL left timestamp precedes/follows nothing: every direction
    must yield null right columns (forward's descending sort would
    otherwise hand NULL-ts rows the minimum-ts right row)."""
    from pyspark.sql import functions as F

    from pysparkdb.operators import as_of_join

    left = spark.createDataFrame(
        [(1, 10, None), (2, 10, 250)], "eid long, k long, es long"
    ).withColumn("t", F.timestamp_seconds("es")).drop("es")
    right = spark.createDataFrame(
        [(10, 90, "early"), (10, 220, "late")], "rk long, rs long, tag string"
    ).withColumn("rt", F.timestamp_seconds("rs")).drop("rs")
    for direction in ("backward", "forward", "nearest"):
        out = {
            r.eid: r.tag
            for r in as_of_join(
                left, right, "k", "rk", "t", "rt", direction=direction
            ).collect()
        }
        assert out[1] is None, direction
        assert out[2] == ("late" if direction != "forward" else None), direction
        assert len(out) == 2, direction
