"""Query registry — the engine's executable capability inventory.

Every capability from SURVEY.md §2 registers here as a named QuerySpec:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the operation
is SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables. This mirrors the reference's e2e test strategy —
every TPC-H/SSB query through the full stack with golden outputs
(fpdb-main/test/TPCHTest.cpp, resources/result/tpch-sf0.01/) — but with an
automated oracle instead of manual diffing.

Conventions (required by the driver's order-insensitive value-hash compare):
- every computed/aggregate column is aliased identically on both sides;
- double aggregates are rounded (ROUND(x, N)) identically on both sides so
  summation-order nondeterminism cannot flip the hash;
- integer-typed aggregates are cast to BIGINT on both sides (DuckDB's
  SUM(BIGINT) would otherwise widen to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, *tags: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


# External correctness sweeps check the FIRST 50 registry entries each round,
# so prefix order is the rotation schedule for driver-verified evidence.
# Policy: the window holds every query whose CURRENT form lacks a green
# driver row — new queries, reshaped oracles, and anything whose DataFrame
# body changed since its last sweep — topped up with the queries whose banked
# evidence is oldest. Queries with fresh green rows vacate the window (the
# e2e TPC-H/SSB/events corpus banked green in rounds 3, 4 AND 5 and sits
# outside it this round). Rotate this list every round as sweeps bank.
#
# ROUND-10 WINDOW. CORRECTNESS_r09 banked all 50 r9-window rows green
# (new r9 registrations, the refactor consumers, the r2 bank, and the 10
# oldest r5 rows q1/q3-q10/q12). Evidence ages before this round were
# r5: 32 rows, r6: 34, r7: 32, r8: 44, r9: 50. Composition (8 + 2 + 32
# + 8 = 50 rows): the 8 round-10 NEW registrations first, then the 2
# round-10 reshaped bodies, then the 32 r5-banked rows staged by the
# round-9 comment (the oldest evidence anywhere — TPC-H tail, SSB flat
# core, events windows, relational op_ basics), topped up with the 8
# oldest r6-bank rows in registry order.
# The 26 remaining r6 rows roll to the round-11 queue: q_co_join,
# q9_jo2, q_co_join3, ssb_gen1, ssb_gen2, ssb_gen3, ssb_gen4, ssb_gen5,
# op_approx_percentile, op_approx_distinct, op_rollup,
# op_window_lead_lag, op_min_max_by, op_hash_sample, op_sessionize,
# op_pivot, op_histogram, op_collect_set, op_string_funcs,
# op_date_trunc, op_grouping_sets, op_window_analytics,
# text_stratified_sample, emb_norm_stats, text_inverted_index,
# text_tfidf (verify against the CORRECTNESS files when rotating).
#
# ROTATION ARITHMETIC AT 200 QUERIES: a 50-slot window fully dedicated
# to rotation refreshes the union every 4 rounds — exactly the "no
# evidence older than 4 rounds" bar with ZERO slots left for new or
# reshaped queries. Round 11 must take the 26 r6 rows above (age-5
# otherwise) plus as much of the 32-row r7 bank (age-4 by then) as
# fits; every new registration displaces one rotation slot and ages one
# banked row past the bar. Either cap new registrations per round (~8)
# and accept a 5-round worst-case freshness, or treat the 4-round bar
# as the cap on registry growth.
DRIVER_WINDOW: tuple[str, ...] = (
    # new round 10: the LIVE object-store round-trip (write/list/scan
    # through sources/arrow_s3.py against a real in-process S3 endpoint);
    # runtime AQE skew-join splitting with a plan-derived honesty flag;
    # interval×interval overlap join; relational Naive Bayes classifier
    # (train+inference as one plan, exact-decimal log scoring); null-safe
    # equi join; EXCEPT ALL / INTERSECT ALL bag semantics
    # (+ pipeline_token_budget: stratified token-budget curation with a
    # membership checksum and a pinned single-stratum-Exchange plan)
    # (+ ev_stream_join: stream-stream watermarked interval join through
    # a real micro-batch run, batch-oracle-checked)
    "s3_scan_roundtrip", "op_skew_join", "ev_interval_overlap",
    "text_naive_bayes", "op_null_safe_join", "op_bag_set_ops",
    "pipeline_token_budget", "ev_stream_join",
    # reshaped round 10: op_agg_pushdown narrowed its _RESOLVE_LOCK to
    # conf-set + planning (collect moved outside); ann_quantized's
    # quantized_topk_neighbors kernel gained the candidates bounding
    # parameter (unbounded path byte-identical, but any body reshape
    # re-enters the window per policy)
    "op_agg_pushdown", "ann_quantized",
    # r5-banked (oldest evidence in the union): TPC-H tail
    "q13", "q14", "q18", "q19", "q2", "q11", "q15", "q16", "q17", "q20",
    # r5-banked: SSB flat core
    "ssb1_1", "ssb1_2", "ssb1_3", "ssb2_1", "ssb2_2", "ssb2_3",
    "ssb3_1", "ssb3_2", "ssb4_1", "ssb4_2", "ssb4_3",
    # r5-banked: events windows + relational basics
    "ev_tumbling", "ev_sliding", "ev_session", "ev_json",
    "ev_range_join", "ev_rollup",
    "op_project", "op_sort_multikey", "op_limit_sort", "op_limit",
    "op_distinct",
    # top-up: the 8 oldest r6-bank rows, registry order
    "q21", "q2_orig", "q11_orig", "q16_orig", "q20_orig",
    "q5_jo1", "q5_jo2", "q9_orig",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so REGISTRY is fully populated, then order
    the result with DRIVER_WINDOW first.

    REGISTRY itself is insertion-ordered by module import; the returned dict
    re-orders it so the driver's 50-query prefix window lands on the queries
    that need fresh verification evidence (see DRIVER_WINDOW above).
    """
    from pysparkdb.queries import tpch, ssb, ssb_typed, streaming, ops, pipeline  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
