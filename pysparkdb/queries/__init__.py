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
# ROUND-8 WINDOW. Two post-r7-snapshot commits (3e7212b ANN self-join
# pins; 2034133 NTZ as-of / capped-overlap / GC epoch) reshaped code whose
# consumers' banked r6/r7 rows therefore certify a superseded form —
# those queries re-enter first (VERDICT r7 #1), alongside round-8's new
# registrations and the consumers of round-8's own advice fixes
# (snapshot_diff update contract, as-of tolerance rounding,
# incremental-refresh orphan guard). Topped up with the oldest banked
# evidence (the round-2 bank) to 50. Twenty r2 rows roll to the round-9
# top-up (text_langid, text_quality, text_rolling_hash, text_tokens,
# text_tokens_bpe, op_variance, op_window_rank, pipeline_clean,
# text_fingerprint, op_join_theta, op_percentile, op_salted_agg,
# op_union_merge, op_join_semi, op_join_right, op_expr_substr_cast,
# op_group_multi, op_intersect, op_join_full, op_join_multikey,
# op_expr_datefuncs, op_except, op_count_distinct, op_cross_join — the
# last eight displaced by the ninth wave's de-vacuified group and the
# late-r8 additions below (pipeline_schema_evolution, the emb_quantize
# built-ins rework, the vacuity-straggler reshapes op_expr_isnull /
# text_pack / op_profile, which re-enter the window rather than rolling
# to the queue):
# the displacements are mid-round
# review-wave reshapes that take priority — ev_stateful (memory-sink
# cleanup), text_domain_mix / text_repetition / text_dup_chunks /
# text_chunk (third wave), q5_pred_trans (fourth wave's barrier-path
# edge-extraction rework — shared with the already-listed q5_auto), and
# mm_resize / mm_audio_features / mm_chunk_audio / mm_image_dedup
# (fourth wave's NULL-payload + byte-sample-helper rework; outputs are
# bit-identical on non-null data but the policy counts any body reshape).
DRIVER_WINDOW: tuple[str, ...] = (
    # new round 8: mode axis + cost-based predicate transfer; plus the
    # explicit-pass pin, whose extraction path the fourth wave reworked,
    # and q6_hybrid (eighth wave: weak-keyed session cache)
    "q6_modes", "q5_auto", "q5_pred_trans", "q6_hybrid",
    # similarity.py reshaped by 3e7212b (lsh/ivf self-join pins, bucket
    # guard, shared _spread/with_norm path); emb_quantize reshaped late r8
    # (pandas_udf → pure higher-order built-ins, deleting the
    # worker-restart bench artifact)
    "ann_lsh", "ann_ivf", "ann_topk", "dedup_embedding",
    "dedup_embedding_lsh", "emb_hard_negatives", "emb_quantize",
    # operators/asof.py reshaped by 2034133 (NTZ path) + r8 round() fix
    "ev_asof", "ev_asof_nearest", "ev_asof_tolerance", "ev_conversion_lag",
    "ev_resample_ffill",
    # pipeline/dedup.py reshaped by 2034133 (capped-overlap pre-stop
    # sizes, minhash/shingle pins) — all its consumers
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_decontaminate", "dedup_cluster", "dedup_incremental",
    "pipeline_clean_near", "text_fuzzy_join",
    # sources/versioned.py reshaped by 2034133 (GC epoch/sidecar) and r8
    # (snapshot_diff detect_updates; incremental-refresh orphan filter;
    # late-r8 manifest-recorded schema evolution — pipeline_schema_evolution
    # is NEW and certifies it; the other two consume the same module)
    "pipeline_snapshot_curation", "pipeline_incremental_refresh",
    "pipeline_schema_evolution",
    # functions/expressions.py case_when literal handling (2034133)
    "op_case_in_like",
    # queries/streaming.py reshaped round 8 (memory-sink cleanup)
    "ev_stateful",
    # de-vacuified round 8 (ninth wave + a late straggler): the first six
    # were structurally EMPTY at sf0.01 (every custkey has an order; the
    # old SSB city pairs name unpopulated cities), so their banked green
    # rows proved only 0 == 0; op_expr_isnull slipped the wave-9 guard by
    # returning one count=0 row — its IS NULL branch was never exercised.
    # All reshaped to probe populated domains (urgent-order probes; city
    # pairs chosen from the corpus's joint fact distribution) and need
    # fresh driver evidence.
    "op_join_anti", "q22", "ssb3_3", "ssb3_4", "ssb_t3_3", "ssb_t3_4",
    # late-r8 vacuity stragglers, found by the systematic all-zero-output
    # oracle scan: op_expr_isnull (IS NULL branch counted zero — one
    # count=0 row slipped the empty-RESULT guard), text_pack (2048-token
    # windows never advance past bin 0 at sf0.01 — repacked at 256),
    # op_profile (null-free corpus made every n_null zero — now profiles
    # a derived NULLIF column with real nulls)
    "op_expr_isnull", "text_pack", "op_profile",
    # pipeline/text.py reshaped round 8 (third review wave: NULL-domain
    # mixing, left-join repetition, cross-doc-only dup chunks, empty-doc
    # chunking)
    "text_domain_mix", "text_repetition", "text_dup_chunks", "text_chunk",
    # pipeline/multimodal.py reshaped round 8 (fourth review wave:
    # NULL-payload contract, shared byte-sample helper, eager validation)
    "mm_resize", "mm_audio_features", "mm_chunk_audio", "mm_image_dedup",
    # top-up: oldest banked evidence (round-2 rows, unchanged form since)
    "dedup_exact", "mm_binary_meta", "mm_frame_sample", "op_agg_scalar",
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
