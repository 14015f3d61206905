"""Multi-query concurrency — the MultiQueryTest analog.

The reference plans and executes several queries against one server
concurrently (fpdb-calcite/java/test/.../MultiQueryTest.java: N threads,
one CalciteServer; fpdb-main serves concurrent clients). A SparkSession is
likewise one shared server: these tests drive N registered queries and N
Engine.sql() calls — including the predicate-transfer mode, whose temp-view
swap is the one piece of global session state the facade mutates — from
concurrent threads and assert every result is byte-identical to its
single-threaded oracle/baseline.

Scheduler note: jobs from different threads interleave under Spark's
scheduler either way; per-thread `spark.scheduler.pool` local properties
are set the way a FAIR-mode deployment would (in local FIFO mode they are
accepted and ignored), so the test exercises the exact call pattern a
concurrent server uses.
"""

from concurrent.futures import ThreadPoolExecutor

from pysparkdb.queries import load_all
from tests.oracle import duckdb_conn, rows_to_multiset

# Four queries spanning the engine's surfaces: TPC-H aggregate join, SSB
# typed integer flight, events window function, pipeline dedup groupBy.
CONCURRENT = ("q6", "ssb_t2_1", "op_window_rank", "dedup_exact")


def _expected(spark, sf_dir, names):
    """Single-threaded DuckDB-oracle results per query (the ground truth
    the concurrent runs must reproduce)."""
    out = {}
    con = duckdb_conn(sf_dir)
    try:
        for n in names:
            rel = con.sql(load_all()[n].oracle)
            out[n] = rows_to_multiset(rel.fetchall(), rel.columns)
    finally:
        con.close()
    return out


def test_concurrent_registered_queries_match_oracles(spark, sf_dir):
    specs = load_all()
    expected = _expected(spark, sf_dir, CONCURRENT)

    def run(name):
        # the pool assignment a FAIR-scheduler deployment would make
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        try:
            df = specs[name].fn(spark, sf_dir)
            return name, rows_to_multiset(df.collect(), df.columns)
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=len(CONCURRENT)) as pool:
        results = dict(pool.map(run, CONCURRENT))
    for name in CONCURRENT:
        assert results[name] == expected[name], f"{name} diverged under concurrency"


def test_concurrent_engine_sql_with_predicate_transfer(spark, sf_dir):
    """Half the threads run Engine.sql with predicate_transfer=True (the
    mode that swaps temp views during resolution), half run the same text
    plain, all concurrently on one session. Every call must return the
    single-threaded answer — the racy-view-swap failure mode is a plain
    call resolving against another call's reduced views (fewer rows)."""
    from pysparkdb import Engine

    eng = Engine(spark)
    eng.attach(sf_dir, validate=False)
    q = """
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem, orders, customer, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
        GROUP BY n_name
    """
    baseline = sorted(map(tuple, eng.sql(q).collect()))

    def run(i):
        df = eng.sql(q, predicate_transfer=(i % 2 == 0))
        return sorted(map(tuple, df.collect()))

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(run, range(6)))
    for i, r in enumerate(results):
        mode = "transfer" if i % 2 == 0 else "plain"
        assert r == baseline, f"call {i} ({mode}) diverged under concurrency"
    # views restored for everyone afterwards
    assert sorted(map(tuple, eng.sql(q).collect())) == baseline


def test_concurrent_engine_sql_with_cache_routing(spark, sf_dir):
    """Concurrent Engine.sql in HYBRID mode — the third view-swapping
    resolution path (cache routing), completing the docstring's 'either
    mode' thread-safety claim. N threads run two different query texts
    through one Engine's SegmentCacheManager; the failure modes are (a) a
    call resolving against another call's routed (column-pruned) views —
    an AnalysisException or silently missing columns — and (b) cache-state
    races corrupting a served projection. Every result must match its
    single-threaded plain-mode baseline, both on first-seen working sets
    (admissions) and on repeats (InMemoryRelation hits), and the cache
    must end up actually serving hits (the routing really engaged)."""
    from pysparkdb import Engine

    eng = Engine(spark)
    eng.attach(sf_dir, validate=False)
    q_narrow = """
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem WHERE l_quantity < 25 GROUP BY l_returnflag
    """
    q_join = """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders, customer
        WHERE o_custkey = c_custkey GROUP BY c_mktsegment
    """
    baselines = {
        q: sorted(map(tuple, eng.sql(q).collect())) for q in (q_narrow, q_join)
    }
    eng.set_mode("hybrid")
    try:

        def run(i):
            q = q_narrow if i % 2 == 0 else q_join
            return q, sorted(map(tuple, eng.sql(q).collect()))

        with ThreadPoolExecutor(max_workers=6) as pool:
            results = list(pool.map(run, range(12)))  # repeats → cache hits
        for i, (q, r) in enumerate(results):
            assert r == baselines[q], f"call {i} diverged under hybrid routing"
        cache = eng._segment_cache
        assert cache is not None and cache.hit_count > 0, "routing never engaged"
    finally:
        eng.clear_segment_cache()  # never leak pins into the shared session
        eng.set_mode("pushdown")
    # views restored and mode reset for everyone afterwards
    for q, b in baselines.items():
        assert sorted(map(tuple, eng.sql(q).collect())) == b
