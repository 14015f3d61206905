"""Event-stream analytics queries (batch form) over the events table.

The reference has zero streaming surface (SURVEY §2.10); these are the
batch-equivalent semantics of the Structured Streaming operators in
pysparkdb.streaming — identical windowing logic runs under readStream with
watermarks (tested in tests/test_streaming.py). Registering the batch form
gives every streaming operator a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pysparkdb.queries import register
from pysparkdb.queries.base import bigint, dsum, tables

_DSUM_V = "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"


@register(
    "ev_tumbling",
    f"""
    SELECT date_trunc('hour', ts) AS ws, event_type,
           CAST(COUNT(*) AS BIGINT) AS n, {_DSUM_V} AS total
    FROM events GROUP BY ws, event_type
    """,
    "events", "window",
)
def ev_tumbling(spark, sf_dir):
    """Tumbling 1-hour window aggregation (F.window; streaming form adds
    withWatermark — see pysparkdb.streaming.windows.tumbling)."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(bigint(F.count(F.lit(1))).alias("n"), dsum(F.col("value")).alias("total"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    )


@register(
    "ev_sliding",
    """
    SELECT ws, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
          FROM events) x
    GROUP BY ws
    """,
    "events", "window",
)
def ev_sliding(spark, sf_dir):
    """Sliding window (1 hour, 30-minute slide): each event lands in two
    windows; oracle materializes both candidate starts explicitly."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(bigint(F.count(F.lit(1))).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )


@register(
    "ev_session",
    f"""
    WITH x AS (SELECT user_id, event_id, ts, value,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
               FROM events),
    y AS (SELECT *, CASE WHEN prev_ts IS NULL
                           OR prev_ts < ts - INTERVAL '30 minutes' THEN 1 ELSE 0 END AS ns
          FROM x),
    z AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM y)
    SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events,
           {_DSUM_V} AS total
    FROM z GROUP BY user_id, sid
    """,
    "events", "window", "session",
)
def ev_session(spark, sf_dir):
    """Sessionization (30-minute inactivity gap) via gaps-and-islands window
    functions — OVER/lag/running-sum are beyond-reference capabilities
    (SURVEY §2.10: the reference has no window functions at all). The
    streaming twin is session_window/applyInPandasWithState in
    pysparkdb.streaming."""
    e = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("prev_ts").isNull() | (
        F.col("prev_ts") < F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    )
    sess = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("ns", F.when(gap, 1).otherwise(0))
        .withColumn("sid", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        bigint(F.count(F.lit(1))).alias("n_events"),
        dsum(F.col("value")).alias("total"),
    ).drop("sid")


@register(
    "ev_json",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                         AS DECIMAL(25,6))) AS DOUBLE) AS sum_k
    FROM events GROUP BY event_type
    """,
    "events", "json",
)
def ev_json(spark, sf_dir):
    """Semi-structured props parsing (get_json_object) + aggregation —
    beyond-reference (no JSON functions in the reference, SURVEY §2.8)."""
    e = tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n"),
        dsum(k).alias("sum_k"),
    )


@register(
    "ev_asof",
    """
    WITH r AS (SELECT o_custkey, o_orderdate,
                      CAST(COUNT(*) AS BIGINT) AS n_orders,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS day_spend
               FROM orders GROUP BY o_custkey, o_orderdate)
    SELECT e.event_id, e.user_id, r.o_orderdate AS last_order_ts,
           r.n_orders, r.day_spend
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    "events", "asof_join",
)
def ev_asof(spark, sf_dir):
    """Point-in-time enrichment: each event joined to the user's most
    recent order-day state at event time (pysparkdb.operators.asof — the
    union-marker/window as-of join; oracle is DuckDB's native ASOF JOIN).
    Orders are pre-aggregated per (custkey, day) so (key, ts) is unique
    and ties are deterministic."""
    from pysparkdb.operators.asof import as_of_join

    t = tables(spark, sf_dir)
    daily = t["orders"].groupBy("o_custkey", "o_orderdate").agg(
        bigint(F.count(F.lit(1))).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("day_spend"),
    )
    e = t["events"].select("event_id", "user_id", "ts")
    joined = as_of_join(
        e, daily,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
    )
    return joined.select(
        "event_id", "user_id",
        F.col("o_orderdate").alias("last_order_ts"),
        "n_orders", "day_spend",
    )


@register(
    "ev_range_join",
    """
    SELECT a.event_id AS a_eid, b.event_id AS b_eid,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
    """,
    "events", "range_join",
)
def ev_range_join(spark, sf_dir):
    """Interval self-join: event pairs of the same user within 5 minutes
    (pysparkdb.operators.rangejoin — bucketed equi-join candidates, exact
    gap filter; the oracle states the naive inequality join)."""
    from pysparkdb.operators.rangejoin import range_interval_join

    e = tables(spark, sf_dir)["events"]
    a = e.select("user_id", F.col("event_id").alias("a_eid"), F.col("ts").alias("a_ts"))
    b = e.select("user_id", F.col("event_id").alias("b_eid"), F.col("ts").alias("b_ts"))
    j = range_interval_join(
        a, b, key="user_id", left_ts="a_ts", right_ts="b_ts",
        max_gap_us=300_000_000,
    )
    return j.select("a_eid", "b_eid", "gap_us")


@register(
    "ev_rollup",
    """
    SELECT COALESCE(date_trunc('day', ts), TIMESTAMP '1900-01-01') AS d,
           COALESCE(date_trunc('hour', ts), TIMESTAMP '1900-01-01') AS h,
           COALESCE(event_type, '(all)') AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts), event_type)
    """,
    "events", "rollup", "grouping_sets",
)
def ev_rollup(spark, sf_dir):
    """Time-hierarchy rollup (hypertable-style continuous-aggregate shape):
    counts/sums at (day, hour, type) → (day, hour) → (day) → () grains in
    one pass. Grouping sets are beyond-reference (SURVEY §2.5 'not
    present'); Spark computes the lattice with a single shuffle via the
    Expand operator."""
    e = tables(spark, sf_dir)["events"]
    sentinel = F.lit("1900-01-01 00:00:00").cast("timestamp")
    return (
        e.rollup(
            F.date_trunc("day", "ts").alias("_d"),
            F.date_trunc("hour", "ts").alias("_h"),
            F.col("event_type").alias("_et"),
        )
        .agg(bigint(F.count(F.lit(1))).alias("n"), dsum(F.col("value")).alias("total"))
        # rolled-up grains surface as NULL keys; coalesce to sentinels so
        # the oracle hash compare has totally-ordered, non-null key columns
        .select(
            F.coalesce(F.col("_d"), sentinel).alias("d"),
            F.coalesce(F.col("_h"), sentinel).alias("h"),
            F.coalesce(F.col("_et"), F.lit("(all)")).alias("event_type"),
            "n", "total",
        )
    )


# -- true Structured Streaming entries ------------------------------------
# file-stream sources need a directory: stage a symlink dir per sf_dir
_STAGED_EVENTS: dict = {}
def _click_purchase_frames(spark, sf_dir):
    """Shared prep for the three tolerance/direction as-of queries
    (ev_asof_tolerance / ev_conversion_lag / ev_asof_nearest): clicks with
    their identity, purchases pre-aggregated to ONE row per (user, ts) via
    max_by(value, event_id) — the right-side-uniqueness precondition of
    as_of_join that also makes equal-gap/equal-ts ties well-defined in
    both engines. One definition so a tie-break change cannot silently
    desynchronize the three directions."""
    e = tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"), F.col("ts").alias("pts"))
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    return clicks, purchases


def _events_stream_dir(sf_dir: str) -> str:
    d = _STAGED_EVENTS.get(sf_dir)
    if d is None:
        import atexit
        import os
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="pysparkdb_events_")
        # abspath: a symlink target resolves relative to the LINK's
        # directory, so a relative sf_dir would dangle from /tmp
        os.symlink(
            os.path.abspath(os.path.join(sf_dir, "events.parquet")),
            os.path.join(d, "events.parquet"),
        )
        # the staging dir must outlive every stream read in this process
        # (hence no finally-rmtree), but without an exit hook each process
        # leaked one tmpdir forever — 80 had accumulated over one bench day
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _STAGED_EVENTS[sf_dir] = d
    return d


@register(
    "ev_stateful",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    "events", "streaming", "stateful",
)
def ev_stateful(spark, sf_dir):
    """Custom stateful streaming operator THROUGH an actual stream run:
    applyInPandasWithState keeps a per-user running count
    (pysparkdb.streaming.stateful_user_counter); the events parquet is
    replayed as a file stream (Trigger.AvailableNow) into a memory sink
    and the final per-user counts must equal the batch GROUP BY — integer
    counts only, because float accumulation order across micro-batches is
    not oracle-reproducible."""
    from pysparkdb import streaming as S

    # the only registry query whose read path bypasses tables(); touch it
    # for its conf side effect (nanosAsLong, UTC session timezone) or a
    # bare driver session fails its first micro-batch on the testdata's
    # TIMESTAMP(NANOS) representation
    tables(spark, sf_dir)
    stream = S.read_events_stream(spark, _events_stream_dir(sf_dir))
    # run_to_memory owns the sink lifecycle (drops its view, returns
    # independent local rows), so a constant name is fine: availableNow
    # queries are inactive by return time and only ACTIVE query names
    # must be unique.
    # Size the state-store partition count to the STREAM's volume, the
    # ev_stream_join / pipeline_snapshot_curation convention: shuffle
    # partitions fix the number of state-store instances (open/commit per
    # instance per micro-batch) AND the number of Python workers the
    # applyInPandasWithState stage spins up — at this replay's volume 32
    # instances are pure per-instance overhead. Performance-only conf,
    # scoped to the stream run; a real deployment sizes it UP per ingest.
    # ADVICE r15: the set/restore mutates SESSION-global SQLConf — sound
    # under the sequential query harness (bench/driver run queries one at
    # a time, and the one intra-session thread pool in the registry,
    # pipeline_snapshot_curation's compact∥curate, starts only after its
    # own conf restore) — but a future caller planning OTHER queries
    # concurrently in this session would inherit the 8. If that pattern
    # spreads, run streams from spark.newSession() (shared context,
    # isolated SQLConf) instead.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        out = S.run_to_memory(
            S.stateful_user_counter(stream), "ev_stateful_sink",
            output_mode="update",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return out.groupBy("user_id").agg(
        bigint(F.max("n_events")).alias("n_events")
    )


@register(
    "ev_funnel",
    """
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events),
    s2 AS (
      SELECT user_id, ts, event_type, t1,
             MIN(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM s1),
    s3 AS (
      SELECT user_id, t1, t2,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM s2),
    u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
          FROM s3 GROUP BY user_id)
    SELECT CAST(COUNT(t1) AS BIGINT) AS n_signup,
           CAST(COUNT(t2) AS BIGINT) AS n_view_after,
           CAST(COUNT(t3) AS BIGINT) AS n_purchase_after
    FROM u
    """,
    "events", "funnel",
)
def ev_funnel(spark, sf_dir):
    """Ordered conversion funnel signup → view → purchase: per user, the
    first signup, the first view strictly after it, the first purchase
    strictly after that; report how many users reach each step. The
    sequential dependency (step k+1's filter references step k's result)
    chains three conditional window-MINs over the SAME partition spec —
    Catalyst plans ONE exchange + sort on user_id serving all three
    Window passes (no join, no self-union, asserted in
    test_plan_quality); the per-user rollup reuses that distribution and
    the final funnel row is a tiny global aggregate. At 100 TB this is
    one shuffle of (user_id, ts, type) triples."""
    e = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    ty = F.col("event_type")
    e1 = e.withColumn("t1", F.min(F.when(ty == "signup", t)).over(w))
    e2 = e1.withColumn(
        "t2", F.min(F.when((ty == "view") & (t > F.col("t1")), t)).over(w)
    )
    e3 = e2.withColumn(
        "t3", F.min(F.when((ty == "purchase") & (t > F.col("t2")), t)).over(w)
    )
    u = e3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return u.agg(
        bigint(F.count("t1")).alias("n_signup"),
        bigint(F.count("t2")).alias("n_view_after"),
        bigint(F.count("t3")).alias("n_purchase_after"),
    )


@register(
    "ev_retention",
    """
    WITH t AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort
      FROM events)
    SELECT cohort, CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM t GROUP BY cohort, day_offset
    """,
    "events", "retention",
)
def ev_retention(spark, sf_dir):
    """Retention cohort matrix: users grouped by first-seen day (their
    cohort), counted distinct on each subsequent active day offset — the
    standard DAU-retention triangle. The cohort assignment is a window
    MIN over user_id (one shuffle, no join-back); the matrix rollup is a
    distinct-count keyed by (cohort, offset) — at 100 TB swap the exact
    COUNT(DISTINCT) for approx_count_distinct per the op_approx_distinct
    pattern when the per-cell user sets outgrow the agg state."""
    e = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id")
    d = F.to_date("ts")
    cohort = F.min(d).over(w)
    return (
        e.select(F.col("user_id"), d.alias("d"), cohort.alias("cohort"))
        .groupBy("cohort", F.datediff("d", "cohort").cast("long").alias("day_offset"))
        .agg(bigint(F.countDistinct("user_id")).alias("n_active"))
    )


@register(
    "ev_rollup_cascade",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total,
           CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_hours
    FROM events GROUP BY d
    """,
    "events", "rollup", "cascade",
)
def ev_rollup_cascade(spark, sf_dir):
    """Cascading time rollup (the continuous-aggregate maintenance
    pattern): the DAILY grain is computed FROM THE HOURLY aggregate, not
    from raw events — at scale the hourly frame is orders of magnitude
    smaller than the event stream, so refreshing coarse grains from fine
    grains is the only affordable schedule (TimescaleDB/materialized-
    rollup practice, public design). Correctness hinges on
    re-aggregability: counts sum, and the value total stays DECIMAL
    through the cascade (decimal addition is associative, so
    sum-of-hourly-sums is bit-identical to the oracle's direct daily sum
    — a double intermediate would re-introduce order sensitivity).
    n_hours (= hourly rows folded per day) proves the daily row really
    went through the hourly grain."""
    e = tables(spark, sf_dir)["events"]
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("total_dec"),
        )
    )
    return (
        hourly.groupBy(F.date_trunc("day", "h").alias("d"))
        .agg(
            bigint(F.sum("n")).alias("n"),
            F.sum("total_dec").cast("double").alias("total"),
            bigint(F.count(F.lit(1))).alias("n_hours"),
        )
    )


@register(
    "ev_zscore_outliers",
    """
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS mu,
             (CAST(SUM(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE)
              - CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                * CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1) AS var
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.n_total,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_outliers
    FROM stats s LEFT JOIN events e
      ON e.event_type = s.event_type
     AND ABS(e.value - s.mu) > 2 * sqrt(s.var)
    GROUP BY s.event_type, s.n_total
    """,
    "events", "aggregate", "anomaly",
)
def ev_zscore_outliers(spark, sf_dir):
    """Z-score anomaly counts per event type — the data-quality monitor a
    pipeline runs over every metric stream. Two passes, both scan-shaped:
    per-type moments via the exact decimal formulation (op_variance's
    hash-stable trick — mean and variance come out bit-identical in both
    engines, and sqrt is IEEE correctly-rounded, so the outlier BOUNDARY
    is engine-exact), then an INNER broadcast join of the tiny stats
    frame onto events to count |value − μ| > 2σ map-side; zero-outlier
    types are restored by a tiny stats-side left join (events must be
    the stream side: Spark cannot broadcast-build the preserved side of
    a left outer join, so the outer-first formulation would shuffle the
    whole stream by type). At 100 TB: stats are |types| rows
    (broadcast), the second pass is map-side — two scans, no wide
    shuffle; a single-pass window formulation would shuffle the whole
    stream by type instead."""
    e = tables(spark, sf_dir)["events"]
    v = F.col("value")
    n = F.count(F.lit(1))
    stats = e.groupBy("event_type").agg(
        bigint(n).alias("n_total"),
        (dsum(v) / n).alias("mu"),
        ((dsum(v * v) - dsum(v) * dsum(v) / n) / (n - 1)).alias("var"),
    )
    # events stays the STREAM side of a broadcast join: Spark cannot build
    # the preserved side of a LEFT OUTER join, so a stats-left formulation
    # would silently shuffle the whole event stream by type. Inner-join
    # events against the broadcast stats to count outliers map-side, then
    # restore zero-outlier types with a tiny stats-frame left join.
    st = stats.alias("st")
    ev = e.alias("ev")
    outl = (
        ev.join(
            F.broadcast(st),
            (F.col("ev.event_type") == F.col("st.event_type"))
            & (F.abs(F.col("ev.value") - F.col("st.mu")) > 2 * F.sqrt(F.col("st.var"))),
        )
        .groupBy(F.col("st.event_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("_n_out"))
    )
    return (
        stats.select("event_type", "n_total")
        .join(outl, "event_type", "left")
        .select(
            "event_type", "n_total",
            bigint(F.coalesce(F.col("_n_out"), F.lit(0))).alias("n_outliers"),
        )
    )


@register(
    "ev_asof_tolerance",
    """
    WITH p AS (
      SELECT user_id, ts AS pts, max_by(value, event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    m AS (
      SELECT e.event_id, p.pts, p.purchase_value,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY p.pts DESC) AS rn
      FROM events e JOIN p
        ON e.user_id = p.user_id
       AND p.pts <= e.ts
       AND p.pts >= e.ts - INTERVAL 2 HOUR
      WHERE e.event_type = 'click'
    )
    SELECT e.event_id, e.user_id, m.pts AS purchase_ts, m.purchase_value
    FROM events e
    LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON e.event_id = m.event_id
    WHERE e.event_type = 'click'
    """,
    "events", "asof_join", "tolerance",
)
def ev_asof_tolerance(spark, sf_dir):
    """Attribution join: each click attached to the SAME user's most
    recent purchase within the last 2 hours — the tolerance-bounded
    (staleness-capped) as-of join of feature stores and attribution
    windows (pandas merge_asof tolerance semantics). Clicks whose latest
    purchase is older than the window keep null purchase columns. Same
    single-shuffle union-marker/window plan as ev_asof plus one
    post-window freshness comparison; the oracle replays it as a
    brute-force bounded range join + per-click argmax, both bounds
    inclusive in both engines. The purchase side is pre-aggregated to
    ONE row per (user, ts) — max_by(value, event_id) — honoring
    as_of_join's right-side-uniqueness precondition; without it,
    same-timestamp duplicate purchases would make the winner unspecified
    in both engines."""
    from pysparkdb.operators.asof import as_of_join

    clicks, purchases = _click_purchase_frames(spark, sf_dir)
    joined = as_of_join(
        clicks, purchases,
        left_on="user_id", right_on="p_user",
        left_ts="ts", right_ts="pts",
        tolerance_s=7200,
    )
    return joined.select(
        "event_id", "user_id",
        F.col("pts").alias("purchase_ts"), "purchase_value",
    )


@register(
    "ev_conversion_lag",
    """
    WITH p AS (
      SELECT user_id, ts AS pts, max_by(value, event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    m AS (
      SELECT e.event_id, p.pts, p.purchase_value,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY p.pts ASC) AS rn
      FROM events e JOIN p
        ON e.user_id = p.user_id
       AND p.pts >= e.ts
       AND p.pts <= e.ts + INTERVAL 2 HOUR
      WHERE e.event_type = 'click'
    )
    SELECT e.event_id, e.user_id, m.pts AS next_purchase_ts, m.purchase_value
    FROM events e
    LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON e.event_id = m.event_id
    WHERE e.event_type = 'click'
    """,
    "events", "asof_join", "tolerance", "forward",
)
def ev_conversion_lag(spark, sf_dir):
    """Conversion attribution, forward direction: each click attached to
    the SAME user's NEXT purchase within the following 2 hours —
    as_of_join(direction="forward", tolerance_s=7200), the time-reversed
    twin of ev_asof_tolerance (same single-shuffle union-marker/window
    plan with the sort flipped). Clicks with no purchase inside the
    window keep null columns; the oracle replays the bounded forward
    range join + per-click argmin. Purchase side pre-aggregated to one
    row per (user, ts) via max_by(value, event_id) — see
    ev_asof_tolerance for the determinism rationale."""
    from pysparkdb.operators.asof import as_of_join

    clicks, purchases = _click_purchase_frames(spark, sf_dir)
    joined = as_of_join(
        clicks, purchases,
        left_on="user_id", right_on="p_user",
        left_ts="ts", right_ts="pts",
        tolerance_s=7200, direction="forward",
    )
    return joined.select(
        "event_id", "user_id",
        F.col("pts").alias("next_purchase_ts"), "purchase_value",
    )


@register(
    "ev_asof_nearest",
    """
    WITH p AS (
      SELECT user_id, ts AS pts, max_by(value, event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    m AS (
      SELECT e.event_id, p.pts, p.purchase_value,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_us(p.pts) - epoch_us(e.ts)),
                        CASE WHEN p.pts <= e.ts THEN 0 ELSE 1 END) AS rn
      FROM events e JOIN p
        ON e.user_id = p.user_id
       AND p.pts BETWEEN e.ts - INTERVAL 2 HOUR AND e.ts + INTERVAL 2 HOUR
      WHERE e.event_type = 'click'
    )
    SELECT e.event_id, e.user_id, m.pts AS nearest_purchase_ts, m.purchase_value
    FROM events e
    LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON e.event_id = m.event_id
    WHERE e.event_type = 'click'
    """,
    "events", "asof_join", "nearest",
)
def ev_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of: each click attached to the SAME user's
    temporally CLOSEST purchase within ±2 hours, ties to the past — the
    third as_of_join direction (pandas merge_asof direction='nearest'),
    completing the registry's as-of surface beside backward
    (ev_asof_tolerance) and forward (ev_conversion_lag). Both candidates
    are evaluated in ONE exchange (two Window operators share the key
    partitioning — never a self-join); the oracle replays the bounded
    ±window range join with an abs-gap argmin and the same past-preferring
    tie-break. Purchase side pre-aggregated per (user, ts) via
    max_by(value, event_id) — the right-side-uniqueness precondition that
    also makes equal-gap ties well-defined (one candidate per side)."""
    from pysparkdb.operators.asof import as_of_join

    clicks, purchases = _click_purchase_frames(spark, sf_dir)
    joined = as_of_join(
        clicks, purchases,
        left_on="user_id", right_on="p_user",
        left_ts="ts", right_ts="pts",
        tolerance_s=7200, direction="nearest",
    )
    return joined.select(
        "event_id", "user_id",
        F.col("pts").alias("nearest_purchase_ts"), "purchase_value",
    )


@register(
    "ev_resample_ffill",
    """
    WITH b AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events WHERE user_id < 5 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS TIMESTAMP)
               AS hour
      FROM b
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS hourly_value
      FROM events WHERE user_id < 5 GROUP BY user_id, hour
    )
    SELECT g.user_id, g.hour,
           CASE WHEN h.hourly_value IS NULL THEN FALSE ELSE TRUE END AS observed,
           last_value(h.hourly_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour = h.hour
    """,
    "events", "timeseries", "resample",
)
def ev_resample_ffill(spark, sf_dir):
    """Time-series regularization: resample each user's event stream onto
    an hourly grid between their first and last event and FORWARD-FILL
    gaps with the last observed hourly total — the feature-engineering
    step every irregular event stream needs before windowed models.
    Shape: per-user bounds (one agg), sequence()-exploded grid (map-side
    fan-out, no shuffle beyond the bounds agg), hourly totals (one agg),
    a grid⋈hourly left join, and one last(ignorenulls) window — the
    same forward-carry primitive as the as-of join, on a regular grid.
    The first grid hour is always observed (the grid starts AT the first
    event), so the fill is total. Hourly totals use the exact decimal
    sum so the fill values hash-match; the grid itself is
    engine-portable but generate_series/sequence spell differently, so
    the oracle is DuckDB-dialect."""
    e = tables(spark, sf_dir)["events"].filter(F.col("user_id") < 5)
    b = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = b.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(dsum(F.col("value")).alias("hourly_value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id", "hour",
            F.col("hourly_value").isNotNull().alias("observed"),
            F.last("hourly_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "ev_interval_overlap",
    """
    WITH act AS (
      SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), camp(cid, cs, ce) AS (
      VALUES
        (1, TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-03 12:00:00'),
        (2, TIMESTAMP '2024-01-06 00:00:00', TIMESTAMP '2024-01-08 12:00:00'),
        (3, TIMESTAMP '2024-01-11 00:00:00', TIMESTAMP '2024-01-13 12:00:00'),
        (4, TIMESTAMP '2024-01-16 00:00:00', TIMESTAMP '2024-01-18 12:00:00'),
        (5, TIMESTAMP '2024-01-21 00:00:00', TIMESTAMP '2024-01-23 12:00:00'),
        (6, TIMESTAMP '2024-01-26 00:00:00', TIMESTAMP '2024-01-28 12:00:00')
    )
    SELECT CAST(cid AS BIGINT) AS cid,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(epoch_us(LEAST(e, ce)) - epoch_us(GREATEST(s, cs)))
                AS BIGINT) AS overlap_us
    FROM act JOIN camp ON s <= ce AND cs <= e
    GROUP BY cid ORDER BY cid
    """,
    "events", "interval_join",
)
def ev_interval_overlap(spark, sf_dir):
    """Interval × interval OVERLAP join — both sides are ranges, the shape
    ev_range_join's point-in-range and ev_asof's nearest-point do NOT
    cover (attribution windows, maintenance blackouts, ad flights vs
    session spans). Per-user DAILY activity intervals [min ts, max ts]
    overlap-join six fixed campaign windows; per campaign: overlapping
    user-days, distinct users, and the total overlap duration in exact
    integer microseconds (unix_micros BIGINTs — the double-epoch ulp trap
    the as-of family documents).

    Plan shape: the activity rollup is one partial-aggregated Exchange on
    (user, day); the interval set is tiny and BROADCAST, so the overlap
    predicate evaluates map-side (BroadcastNestedLoopJoin — the one
    NLJ-legitimate shape beside op_join_theta: 6 interval probes per row,
    no shuffle). The interval side is built from spark.range — a
    JVM-only plan — NOT a local-list DataFrame conversion, which
    routes through the Python-worker RDD path and put a
    Python worker dependency INSIDE this otherwise JVM-pure plan's
    broadcast job; intermittent worker-pool restarts (the documented
    2-7 s PythonWorkerFactory reaper artifact) were the last
    unattributed source of this query's in-sweep episodes after
    host-steal and GC were instrumented away (round-14 timelines:
    6.7/8.1 s readings with steal_d≤31, gc=0, calm neighbors). At
    100 TB with a LARGE interval side, bucket both sides onto a time
    grid (the ev_range_join pattern) so the range predicate joins
    equi-first on the grid key; the overlap math is unchanged."""
    e = tables(spark, sf_dir)["events"]
    act = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    camp = spark.range(1, 7).select(
        F.col("id").alias("cid"),
        F.to_timestamp(F.concat(
            F.lit("2024-01-"),
            F.lpad(((F.col("id") - 1) * 5 + 1).cast("string"), 2, "0"),
            F.lit(" 00:00:00"))).alias("cs"),
        F.to_timestamp(F.concat(
            F.lit("2024-01-"),
            F.lpad(((F.col("id") - 1) * 5 + 3).cast("string"), 2, "0"),
            F.lit(" 12:00:00"))).alias("ce"),
    )
    j = act.join(
        F.broadcast(camp),
        (F.col("s") <= F.col("ce")) & (F.col("cs") <= F.col("e")),
    )
    return (
        j.groupBy("cid")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_overlaps"),
            bigint(F.countDistinct("user_id")).alias("n_users"),
            F.sum(
                F.unix_micros(F.least("e", "ce"))
                - F.unix_micros(F.greatest("s", "cs"))
            ).cast("long").alias("overlap_us"),
        )
        .orderBy("cid")
    )


@register(
    "ev_stream_join",
    """
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS lag_us
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    GROUP BY c.user_id ORDER BY c.user_id
    """,
    "events", "streaming", "stream_stream_join",
)
def ev_stream_join(spark, sf_dir):
    """Stream-STREAM watermarked interval join through an actual stream
    run — clicks and purchases as two unbounded sides of one
    attribution join (streaming/windows.py:stream_interval_join — the
    registered, oracle-checked form of the two-sided-state shape; state
    on BOTH sides, evicted by watermark + interval bound). The events parquet replays as a file stream
    (Trigger.AvailableNow) and the emitted pairs must equal the batch
    interval join the oracle runs — exact because the staged landing dir
    is one file → one micro-batch → no cross-batch late-arrival drops
    (multi-file replays additionally exercise watermark eviction in
    tests/test_streaming.py). Pair lags aggregate as exact integer
    microseconds (unix_micros BIGINTs, the as-of family's convention)."""
    from pysparkdb import streaming as S

    tables(spark, sf_dir)  # conf side effect (nanosAsLong, UTC) — see ev_stateful
    stream = S.read_events_stream(spark, _events_stream_dir(sf_dir))
    pairs = S.stream_interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    # A stream-stream join keeps TWO state stores per shuffle partition,
    # and the partition count is fixed at first micro-batch — so size it
    # to the stream's volume, not the session's batch default (measured:
    # 32 partitions 11.6 s vs 8 partitions 4.1 s on this replay; at
    # real volume the same knob sizes UP). Performance-only conf, scoped
    # to the stream run (the skew-join convention).
    #
    # noDataMicroBatches off for THIS stream (r16): after the single data
    # batch, availableNow appended a trailing zero-row micro-batch whose
    # only job is watermark-driven STATE EVICTION — instrumented at
    # ~0.9-1.2 s (a full plan+execute of the join stages over empty
    # sources, ~40% of the query's calm floor) for state that the
    # drain-and-stop run discards with its checkpoint moments later. An
    # INNER stream-stream join emits pairs only in data batches (append
    # mode finalizes them on emission), so the emitted row set is
    # identical — oracle-verified at sf0.001/0.01/0.1. A watermark-
    # finalized APPEND AGGREGATION must keep no-data batches (they emit
    # its closed windows) — that is why the conf is scoped per-stream
    # here, never session-wide.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false")
        out = S.run_to_memory(pairs, "ev_stream_join_sink", output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata)
    return (
        out.groupBy("user_id")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_pairs"),
            F.sum(
                F.unix_micros(F.col("purchase_ts"))
                - F.unix_micros(F.col("click_ts"))
            ).cast("long").alias("lag_us"),
        )
        .orderBy("user_id")
    )
