"""Property-based equivalence tests for the custom operators.

Each custom operator has a brute-force reference semantics; Hypothesis
drives randomized inputs (including ties, duplicates, empties) and the
operator must agree exactly. One shared SparkSession; small row counts
keep each example sub-second.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pysparkdb.operators import as_of_join, salted_group
from pysparkdb.operators.rangejoin import range_interval_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=-50, max_value=50)  # ties + pre-1970 epochs
VALS = st.integers(min_value=-100, max_value=100)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=30))
@settings(**_SETTINGS)
def test_salted_group_equals_plain_group(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, v long")
    plain = {
        (r.k, r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.k, r.s, r.n)
        for r in salted_group(
            df,
            ["k"],
            partial_aggs={"ps": F.sum("v"), "pn": F.count(F.lit(1))},
            aggs={"s": F.sum("ps"), "n": F.sum("pn")},
            salt_buckets=4,
        ).collect()
    }
    assert salted == plain


@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=0, max_size=15),
    right=st.lists(st.tuples(KEYS, TS), min_size=0, max_size=15),
)
@settings(**_SETTINGS)
def test_range_join_equals_naive_theta(spark, left, right):
    if not left or not right:
        return
    max_gap = 7_000_000  # 7s in micros; ts column below is seconds → micros
    l = spark.createDataFrame(
        [(k, t * 1_000_000) for k, t in left], "k long, lus long"
    ).withColumn("l_ts", F.timestamp_micros("lus"))
    r = spark.createDataFrame(
        [(k, t * 1_000_000) for k, t in right], "k long, rus long"
    ).withColumn("r_ts", F.timestamp_micros("rus"))
    got = {
        (x.k, x.lus, x.rus)
        for x in range_interval_join(
            l, r, key="k", left_ts="l_ts", right_ts="r_ts", max_gap_us=max_gap
        ).collect()
    }
    naive = {
        (lk, lt, rt)
        for (lk, lt) in ((k, t * 1_000_000) for k, t in left)
        for (rk, rt) in ((k, t * 1_000_000) for k, t in right)
        if lk == rk and 0 < rt - lt <= max_gap
    }
    assert got == naive


@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12),
    right=st.lists(st.tuples(KEYS, TS, VALS), min_size=0, max_size=12),
)
@settings(**_SETTINGS)
def test_asof_join_equals_argmax(spark, left, right):
    if not left:
        return
    # unique (key, ts) on the right: as-of tie-winner among duplicate
    # timestamps is documented as unspecified, so dedupe like callers must
    seen = {}
    for k, t, v in right:
        seen[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in seen.items()]

    l = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    if right_rows:
        r = spark.createDataFrame(right_rows, "rk long, rt long, v long")
    else:
        r = spark.createDataFrame([], "rk long, rt long, v long")

    got = {
        (x.lid, x.rt, x.v)
        for x in as_of_join(l, r, "k", "rk", "t", "rt").collect()
    }
    expect = set()
    for i, (k, t) in enumerate(left):
        matches = [(rt, v) for (rk, rt, v) in right_rows if rk == k and rt <= t]
        if matches:
            rt, v = max(matches)
            expect.add((i, rt, v))
        else:
            expect.add((i, None, None))
    assert got == expect
