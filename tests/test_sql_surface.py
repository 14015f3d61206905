"""engine.sql() parity: the SQL entry point runs the corpus directly.

The reference's primary interface is a SQL string through the full stack
(Client::executeQuery, fpdb-main/src/Client.cpp:94-158). Here the same
contract is `Engine.sql(text) -> DataFrame`: for every registered query
whose oracle SQL is ANSI enough for both engines, Spark executes the SAME
text DuckDB verifies against, and the result must row-match the DataFrame
form of the query. That closes the loop: DataFrame form ≡ Spark SQL form
≡ DuckDB — parser, analyzer and executor agree.

(Queries excluded below use DuckDB-only constructs in their oracles —
list lambdas, unnest literals, duck-style array indexing, json path
shorthands; their DataFrame forms are still oracle-checked in the other
suites.)
"""

import pytest

from pysparkdb import Engine
from pysparkdb.queries import load_all
from pysparkdb.queries.base import tables

# DuckDB-dialect oracles that Spark SQL cannot parse/run verbatim.
NOT_ANSI_PORTABLE = {
    "ann_topk",            # duck 1-based array indexing in the dot product
    "emb_hard_negatives",  # same duck dot-product idiom
    "dedup_embedding",     # same
    "dedup_ngram_jaccard", # same corpus of duck list ops
    "dedup_containment",   # same duck shingle list comprehension
    "dedup_exact",         # regexp_replace 'g' flag argument
    "text_fingerprint",    # same
    "ev_json",             # json_extract_string
    "ev_sliding",          # unnest([...]) window-start materialization
    "ev_resample_ffill",   # unnest(generate_series()) grid vs Spark sequence()
    "ev_asof",             # DuckDB-native ASOF JOIN syntax
    "ev_range_join",       # epoch_us() is DuckDB-only
    "ev_asof_nearest",     # epoch_us() in the abs-gap argmin
    "mm_binary_meta",      # encode(text) 1-arg form
    "mm_frame_sample",     # unnest literal list
    "text_langid",         # list_filter lambda
    "text_quality",        # list_filter / string_split
    "text_tokens",         # string_split
    "text_tokens_bpe",     # regexp_extract_all group-index defaults differ
    "text_rolling_hash",   # list comprehension + list_reduce are DuckDB-only
    "pipeline_clean",      # regexp_replace 'g' flag argument
    "op_sessionize",       # epoch() is DuckDB-only (Spark: unix_timestamp)
    "op_window_range_frame",  # epoch() again (same op_sessionize reason)
    "text_chunk",          # unnest(range()) offset materialization
    "emb_norm_stats",      # duck DOUBLE[] cast + list-comprehension dot
    "emb_centroid_shift",  # duck LATERAL unnest(range()) element explode
    "text_winnowing",      # duck list comprehension + list_reduce + LATERAL
    "op_collect_set",      # duck list()/list_sort vs Spark collect_set
    "op_min_max_by",       # duck {'k': v} struct literal for the total argmin key
    "dedup_minhash_lsh",   # duck list comprehension for minhash signature bands
    "dedup_decontaminate", # duck list-comprehension shingles
    "text_repetition",     # duck list-comprehension bigrams + unnest
    "mm_resize",           # ascii()/list ops in the byte-level value oracle
    "mm_audio_features",   # same ascii-bytes oracle idioms
    "mm_chunk_audio",      # unnest(range()) chunk-offset materialization
    "dedup_cluster",       # duck list-comprehension shingles + recursive-CTE closure
    "text_inverted_index", # duck list()/list_sort posting aggregation + string_split
    "text_pii_scrub",      # regexp_replace 'g' flag + regexp_extract_all defaults
    "dedup_incremental",   # regexp_replace 'g' flag normalization
    "mm_image_dedup",      # ascii()/list-comprehension byte oracle
    "ev_retention",        # date_diff('day', a, b) 3-arg form vs Spark datediff(b, a)
    "text_dup_chunks",     # unnest(range()) chunk-offset materialization
    "text_tfidf",          # string_split/unnest tokenization
    "text_domain_mix",     # string_split + duck '0x'-string hex cast
    "text_pack",           # string_split tokenization
    "emb_quantize",        # duck list comprehension + DOUBLE[] cast
    "pipeline_clean_near", # duck list-comprehension shingles + recursive-CTE closure
    "text_unigram_logprob", # string_split tokenization
    "text_bm25",           # string_split tokenization
    "pipeline_snapshot_curation",  # duck shingle comprehensions + recursive
                                   # CTE; the Spark side RUNS the pipeline,
                                   # the oracle only derives its counts
    "ev_interval_overlap",  # epoch_us() overlap duration (ev_range_join family)
    "text_naive_bayes",    # string_split/unnest tokenization
    "ev_stream_join",      # epoch_us() pair lags (as-of family convention)
    "pipeline_token_budget",  # string_split token counts + FILTER clause
}

SPECS = [
    s
    for s in load_all().values()
    if s.oracle is not None and s.name not in NOT_ANSI_PORTABLE
]


def test_portable_subset_is_large():
    # most of the corpus must stay SQL-portable; additions that silently
    # fall out of the ANSI subset should be a conscious decision
    assert len(SPECS) >= 48


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_sql_text_matches_dataframe_form(spark, sf_dir, spec):
    eng = Engine(spark)
    tables(spark, sf_dir)  # ensure temp views are registered
    via_sql = eng.sql(spec.oracle)
    via_df = spec.fn(spark, sf_dir)
    a = sorted(map(tuple, via_sql.collect()))
    b = sorted(map(tuple, via_df.collect()))
    assert a == b, f"{spec.name}: SQL-text result differs from DataFrame form"
