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
# ROUND-7 ROTATION QUEUE (registered late in round 6, window already full of
# never-swept forms): text_unigram_logprob, text_bm25, text_pii_scrub,
# text_dup_chunks, dedup_incremental, mm_image_dedup, op_cube, ev_funnel,
# ev_retention, op_upsert, op_scd2, op_weighted_sample, text_fuzzy_join,
# graph_pagerank, graph_bfs, op_profile, op_window_range_frame,
# ev_rollup_cascade, ev_zscore_outliers, emb_hard_negatives,
# ev_asof_tolerance, ev_conversion_lag, graph_lpa, graph_triangles,
# ev_resample_ffill, op_winsorize, op_unpivot — rotate these in as round-6
# rows bank.
DRIVER_WINDOW: tuple[str, ...] = (
    # reshaped round 6: self-certifying approx sketches
    "op_approx_percentile", "op_approx_distinct",
    # new round 6: original-form partsupp queries, join-order variants,
    # synthetic co-located join
    "q2_orig", "q11_orig", "q16_orig", "q20_orig",
    "q5_jo1", "q5_jo2", "q9_orig", "q9_jo2", "q_co_join", "q_co_join3",
    "ssb_gen1", "ssb_gen2", "ssb_gen3", "ssb_gen4", "ssb_gen5",
    "dedup_decontaminate", "text_repetition", "op_window_analytics",
    # new round 6 (late): duplicate clustering + text indexing + mixing/packing
    "dedup_cluster", "text_inverted_index", "text_tfidf",
    "text_domain_mix", "text_pack", "emb_quantize", "pipeline_clean_near",
    # modified round 6: broadcast removal / q21 reuse pin (dedup_embedding
    # and ann_topk vacated — the pair-scoring revert restored their banked
    # r1/r2 form exactly)
    "dedup_ngram_jaccard", "q21",
    # reshaped round 5 (self-certifying certificates), never swept in that form
    "dedup_minhash_lsh", "dedup_simhash", "ann_lsh", "ann_ivf",
    "mm_resize", "mm_audio_features",
    # never swept at all
    "op_rollup", "op_grouping_sets", "op_pivot", "op_sessionize",
    "op_collect_set", "op_hash_sample", "op_histogram", "op_min_max_by",
    "op_window_lead_lag", "op_string_funcs", "op_date_trunc",
    "text_chunk", "text_stratified_sample", "emb_norm_stats", "mm_chunk_audio",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so REGISTRY is fully populated, then order
    the result with DRIVER_WINDOW first.

    REGISTRY itself is insertion-ordered by module import; the returned dict
    re-orders it so the driver's 50-query prefix window lands on the queries
    that need fresh verification evidence (see DRIVER_WINDOW above).
    """
    from pysparkdb.queries import tpch, ssb, streaming, ops, pipeline  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
