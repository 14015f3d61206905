"""Structured Streaming operators produce batch-equivalent results.

Streams the events parquet through Trigger.AvailableNow into memory sinks
and compares against the batch computation on the same data.
"""

import pytest
from pyspark.sql import functions as F

from pysparkdb import streaming as S
from pysparkdb.queries.base import tables


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-stream sources need a directory; stage the events file into one
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    return str(d)


@pytest.fixture
def events_stream(spark, events_dir):
    return S.read_events_stream(spark, events_dir)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    got = S.run_to_memory(S.tumbling_agg(events_stream), "t_tumbling")
    batch = (
        tables(spark, sf_dir)["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.count() == batch.count()
    assert got.agg(F.sum("n")).first()[0] == tables(spark, sf_dir)["events"].count()


def test_sliding_stream_counts_twice(spark, sf_dir, events_stream):
    got = S.run_to_memory(S.sliding_counts(events_stream), "t_sliding")
    total_rows = tables(spark, sf_dir)["events"].count()
    # every event lands in exactly two (1h, 30m-slide) windows
    assert got.agg(F.sum("n")).first()[0] == 2 * total_rows


def test_session_stream_matches_gaps_and_islands(spark, sf_dir, events_stream):
    got = S.run_to_memory(S.session_agg(events_stream), "t_session")
    from pysparkdb.queries import load_all

    batch_sessions = load_all()["ev_session"].fn(spark, sf_dir)
    assert got.count() == batch_sessions.count()
    assert got.agg(F.sum("n_events")).first()[0] == tables(spark, sf_dir)["events"].count()


def test_stateful_counter_matches_batch_totals(spark, sf_dir, events_stream):
    got = S.run_to_memory(
        S.stateful_user_counter(events_stream), "t_stateful", output_mode="update"
    )
    # last update per user == final running total == batch group-by
    final = got.groupBy("user_id").agg(F.max("n_events").alias("n"))
    batch = (
        tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    diff = final.join(batch, "user_id").filter(final["n"] != batch["n"]).count()
    assert diff == 0
    assert final.count() == batch.count()


def test_stream_dedup_first_occurrence_wins(spark, sf_dir, events_dir):
    """Duplicated input stream → dedup restores the original row set."""
    # stage the same file twice: every event_id arrives twice
    import pathlib
    d2 = pathlib.Path(events_dir).parent / "events_stream_dup"
    if not d2.exists():
        d2.mkdir()
        (d2 / "a.parquet").symlink_to(f"{sf_dir}/events.parquet")
        (d2 / "b.parquet").symlink_to(f"{sf_dir}/events.parquet")
    doubled = S.read_events_stream(spark, str(d2))
    got = S.run_to_memory(S.stream_dedup(doubled), "t_dedup", output_mode="append")
    n = tables(spark, sf_dir)["events"].count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_stream):
    """Watermarked stream×stream interval join produces the same pair set
    as the batch bucketed range join (ev_range_join)."""
    got = S.run_to_memory(
        S.stream_interval_self_join(events_stream), "t_ssjoin", output_mode="append"
    )
    from pysparkdb.queries import load_all

    batch = load_all()["ev_range_join"].fn(spark, sf_dir)
    got_pairs = {(r.a_eid, r.b_eid) for r in got.collect()}
    batch_pairs = {(r.a_eid, r.b_eid) for r in batch.collect()}
    assert got_pairs == batch_pairs
