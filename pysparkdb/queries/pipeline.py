"""LLM-pipeline queries over documents/embeddings — registry entries.

Dedup, similarity search, text analysis, multimodal plumbing (SURVEY §7.2
M4, beyond-reference). SQL-expressible ops carry full DuckDB oracles; the
hash-based candidate generators (MinHash bands, SimHash bands, hyperplane
LSH) use xxhash64/seeded planes that DuckDB can't reproduce, so they get the
rows-only check — their *quality* is asserted against the exact baselines in
tests/test_pipeline.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkdb.pipeline import dedup, multimodal, similarity, text
from pysparkdb.queries import register
from pysparkdb.queries.base import bigint, tables

# DuckDB-side shingle expression (word 3-grams, distinct), mirroring
# pysparkdb.pipeline.text.word_shingles.
_DUCK_SHINGLES = (
    "list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])"
)

_DUCK_JACCARD = f"""
    WITH sh AS (SELECT doc_id,
                       unnest({_DUCK_SHINGLES}) AS s
                FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b, c / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE c / (sa.n + sb.n - c) >= {{t}}
"""

# DuckDB-side double dot product, sequential fold like Spark's aggregate().
def _duck_dot(a: str, b: str) -> str:
    return f"list_sum([{a}[i] * {b}[i] for i in range(1, 65)])"


@register(
    "dedup_exact",
    r"""
    SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY fp
    """,
    "pipeline", "dedup",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by normalized-text digest; survivor = min doc_id."""
    return dedup.exact_duplicates(tables(spark, sf_dir)["documents"])


@register(
    "dedup_ngram_jaccard",
    _DUCK_JACCARD.format(t=0.1),
    "pipeline", "dedup",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs at t=0.1 (shingle-collision
    join — only pairs sharing a shingle are materialized)."""
    return dedup.ngram_jaccard_pairs(tables(spark, sf_dir)["documents"], threshold=0.1)


@register(
    "dedup_minhash_lsh",
    None,  # xxhash64 signatures not reproducible in DuckDB → rows-only;
           # recall vs the exact baseline is asserted in tests/test_pipeline.py
    "pipeline", "dedup", "lsh",
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(32)+LSH(16 bands × 2 rows) candidates, exact-Jaccard-verified
    at t=0.5 — the scalable two-phase near-dup shape. max_doc_freq=256 is
    the stop-shingle fan-out guard: far above this corpus's max shingle
    doc-freq (25 at sf0.1, recall unaffected — asserted in
    tests/test_pipeline.py), it bounds the verify join against boilerplate
    shingles at real corpus scale."""
    return dedup.minhash_lsh_pairs(
        tables(spark, sf_dir)["documents"], threshold=0.5, max_doc_freq=256
    )


@register(
    "dedup_simhash",
    None,  # xxhash64-based fingerprint → rows-only + tests
    "pipeline", "dedup", "lsh",
)
def dedup_simhash(spark, sf_dir):
    """SimHash(32-bit) near-dup pairs at Hamming ≤ 3 via 8-bit band join."""
    return dedup.simhash_pairs(tables(spark, sf_dir)["documents"])


@register(
    "dedup_embedding",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({_duck_dot('v', 'v')}) AS nrm FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_duck_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_duck_dot('a.v', 'b.v')} / (a.nrm * b.nrm) > 0.4
    """,
    "pipeline", "dedup", "similarity",
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (> 0.4), exact brute force; double
    dot products fold sequentially on both sides → oracle-exact."""
    return similarity.cosine_pairs(tables(spark, sf_dir)["embeddings"], threshold=0.4)


@register(
    "ann_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({_duck_dot('v', 'v')}) AS nrm FROM e),
    scored AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                      {_duck_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cosine
               FROM n q JOIN n c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 50)
    SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, cid ASC) AS rnk
          FROM scored)
    WHERE rnk <= 1
    """,
    "pipeline", "similarity",
)
def ann_topk(spark, sf_dir):
    """Exact top-1 cosine neighbor for query vectors (vec_id < 50) — the
    brute-force baseline for similarity search; ties broken by cid."""
    return similarity.topk_neighbors(
        tables(spark, sf_dir)["embeddings"], k=1, query_filter=F.col("vec_id") < 50
    )


@register(
    "ann_lsh",
    None,  # seeded hyperplane literals impractical to mirror in SQL →
           # rows-only; recall vs ann_topk asserted in tests
    "pipeline", "similarity", "lsh",
)
def ann_lsh(spark, sf_dir):
    """Approximate top-1 neighbor via random-hyperplane LSH buckets (the
    scale path: per-query candidate set shrinks 2^nbits-fold)."""
    return similarity.lsh_topk_neighbors(
        tables(spark, sf_dir)["embeddings"], dim=64, k=1,
        query_filter=F.col("vec_id") < 50,
    )


@register(
    "text_tokens",
    "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",
    "pipeline", "text",
)
def text_tokens(spark, sf_dir):
    """Whitespace token counting (the BPE-regex variant would swap the
    splitter; counting shape is identical)."""
    d = tables(spark, sf_dir)["documents"]
    return d.select("doc_id", text.token_count("text").alias("n_tokens"))


@register(
    "text_quality",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           (length(text) - len(string_split(text, ' ')) + 1)
             / len(string_split(text, ' ')) AS avg_word_len,
           len(list_filter(string_split(text, ' '), t -> t = 'a' OR t = 'the'))
             / len(string_split(text, ' ')) AS stopword_ratio,
           (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN len(list_filter(string_split(text, ' '), t -> t = 'a' OR t = 'the'))
                        / len(string_split(text, ' ')) > 0.02 THEN 1.0 ELSE 0.0 END
            + CASE WHEN (length(text) - len(string_split(text, ' ')) + 1)
                        / len(string_split(text, ' ')) < 10 THEN 1.0 ELSE 0.0 END) / 3.0
             AS quality_score
    FROM documents
    """,
    "pipeline", "text",
)
def text_quality(spark, sf_dir):
    """Per-doc quality features (length/stopword/word-length heuristics)."""
    return text.quality_metrics(tables(spark, sf_dir)["documents"])


@register(
    "text_langid",
    """
    SELECT pred_lang, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN len(list_filter(string_split(text, ' '), t -> t = 'a' OR t = 'the'))
                       / len(string_split(text, ' ')) >= 0.08 THEN 'en'
                  WHEN len(string_split(text, ' ')) > 60 THEN 'und-long'
                  ELSE 'und' END AS pred_lang
      FROM documents) p
    GROUP BY pred_lang
    """,
    "pipeline", "text",
)
def text_langid(spark, sf_dir):
    """Heuristic n-gram/stopword language ID, aggregated by prediction."""
    d = tables(spark, sf_dir)["documents"]
    return (
        text.lang_id(d)
        .groupBy("pred_lang")
        .agg(bigint(F.count(F.lit(1))).alias("n"))
    )


@register(
    "text_fingerprint",
    r"""
    SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
    FROM documents
    """,
    "pipeline", "text",
)
def text_fingerprint(spark, sf_dir):
    """Normalized-text md5 fingerprint per document."""
    return text.fingerprint(tables(spark, sf_dir)["documents"])


@register(
    "mm_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    "pipeline", "multimodal",
)
def mm_binary_meta(spark, sf_dir):
    """Multimodal plumbing: pack text as an opaque binary payload, extract
    typed metadata via Arrow-batched mapInPandas (the real decode shape;
    codecs stubbed per pysparkdb.pipeline.multimodal)."""
    d = tables(spark, sf_dir)["documents"]
    packed = multimodal.to_binary_column(d)
    with_meta = multimodal.extract_metadata(packed)
    return with_meta.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


@register(
    "mm_resize",
    None,  # deterministic fake resampler; byte-level sampling is not
           # reasonably SQL-expressible → rows-only check
    "pipeline", "multimodal",
)
def mm_resize(spark, sf_dir):
    """Image-resize plumbing (STUBBED codec): binary payloads → 4×4 pixel
    grids via the deterministic fake resampler over mapInPandas. The
    registered projection digests the pixel array (md5 of the comma-joined
    values) so every emitted column is scalar-hashable for the rows-only
    check; the raw array<double> form stays a library output exercised by
    tests/test_pipeline.py."""
    d = tables(spark, sf_dir)["documents"]
    grids = multimodal.resize_image(multimodal.to_binary_column(d), fake=True)
    return grids.select(
        "doc_id",
        "width",
        "height",
        F.md5(F.concat_ws(",", F.col("pixels").cast("array<string>"))).alias(
            "pixel_md5"
        ),
    )


@register(
    "mm_frame_sample",
    """
    SELECT doc_id, CAST(idx AS INT) AS frame_idx,
           CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
    FROM documents, (SELECT UNNEST([0, 1, 2]) AS idx)
    """,
    "pipeline", "multimodal",
)
def mm_frame_sample(spark, sf_dir):
    """Frame-sampling fan-out (STUBBED codec): each payload yields 3 frame
    rows through mapInPandas; the oracle checks the fan-out shape
    (doc × frame_idx grid) plus the conserved payload size."""
    d = tables(spark, sf_dir)["documents"]
    frames = multimodal.sample_frames(multimodal.to_binary_column(d), fake=True)
    total = frames.groupBy("doc_id").agg(
        F.sum(F.octet_length("frame")).alias("total_bytes")
    )
    return frames.join(total, "doc_id").select(
        "doc_id", "frame_idx", F.col("total_bytes").cast("long").alias("total_bytes")
    )


@register(
    "text_tokens_bpe",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_tokens
    FROM documents
    """,
    "pipeline", "text",
)
def text_tokens_bpe(spark, sf_dir):
    """BPE-ish regex token counting (word / number / punctuation classes —
    the pre-tokenizer split most BPE vocabularies assume), the second
    counting mode the pipeline brief asks for next to whitespace tokens."""
    d = tables(spark, sf_dir)["documents"]
    n = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    return d.select("doc_id", n.cast("long").alias("n_tokens"))


@register(
    "mm_audio_features",
    None,  # byte-level signal math not reasonably SQL-expressible → rows-only
    "pipeline", "multimodal",
)
def mm_audio_features(spark, sf_dir):
    """Audio-feature plumbing (STUBBED codec): binary payloads → RMS +
    zero-crossing features via numpy-vectorized mapInPandas."""
    d = tables(spark, sf_dir)["documents"]
    return multimodal.decode_audio(multimodal.to_binary_column(d), fake=True)


@register(
    "ann_ivf",
    None,  # seeded k-means centroid literals impractical to mirror in SQL →
           # rows-only; recall vs ann_topk asserted in tests
    "pipeline", "similarity", "ivf",
)
def ann_ivf(spark, sf_dir):
    """Approximate top-1 neighbor via IVF cells (data-adaptive coarse
    quantizer, nprobe=2 of 8 cells) — the second ANN scale path next to
    ann_lsh; recall per probed fraction is higher on clustered corpora."""
    return similarity.ivf_topk_neighbors(
        tables(spark, sf_dir)["embeddings"], dim=64, k=1,
        query_filter=F.col("vec_id") < 50,
    )


@register(
    "text_rolling_hash",
    """
    SELECT doc_id,
           list_reduce(
             [CAST(ascii(c) AS BIGINT) FOR c IN string_split(text, '')],
             (acc, x) -> (acc * 31 + x) % 1000000007
           ) AS rhash
    FROM documents WHERE length(text) > 0
    """,
    "pipeline", "text", "fingerprint",
)
def text_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash document fingerprint (base 31 mod 1e9+7)
    over character codes — the incremental-update fingerprint the pipeline
    brief names next to the md5 digest (text_fingerprint). Exact integer
    math, so the fold is engine-reproducible; both engines seed with the
    first character's code and fold the rest."""
    d = tables(spark, sf_dir)["documents"].filter(F.length("text") > 0)
    rhash = F.expr(
        """
        aggregate(
          slice(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                2, size(split(text, '')) - 1),
          CAST(ascii(substring(text, 1, 1)) AS BIGINT),
          (acc, x) -> (acc * 31 + x) % 1000000007
        )
        """
    )
    return d.select("doc_id", rhash.alias("rhash"))


@register(
    "pipeline_clean",
    """
    WITH toks AS (
      SELECT doc_id, lang, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    quality AS (SELECT * FROM toks WHERE n_tokens BETWEEN 20 AND 1000),
    survivors AS (
      SELECT min(doc_id) AS doc_id, min(lang) AS lang
      FROM (SELECT doc_id, lang,
                   md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
            FROM quality)
      GROUP BY fp
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM survivors GROUP BY lang
    """,
    "pipeline", "dedup", "text", "composite",
)
def pipeline_clean(spark, sf_dir):
    """End-to-end cleaning pipeline in one plan: quality gate (token-count
    band) → exact dedup (survivor = min doc_id per normalized-text digest)
    → per-language survivor counts. The composition the LLM-data run
    chains nightly; every stage is the already-tested operator, fused by
    Catalyst into scan → hash-agg → hash-agg with no extra passes."""
    d = tables(spark, sf_dir)["documents"]
    quality = d.filter(text.token_count("text").between(20, 1000))
    survivors = (
        quality.select(
            F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fp"),
            "doc_id", "lang",
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.min("lang").alias("lang"))
    )
    return survivors.groupBy("lang").agg(bigint(F.count(F.lit(1))).alias("n_docs"))


@register(
    "text_chunk",
    """
    WITH idx AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(greatest(length(text) - 200, 0) / 150.0)
                             AS BIGINT) + 1)) AS i
      FROM documents
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           substr(text, CAST(i * 150 + 1 AS INTEGER), 200) AS chunk
    FROM idx
    """,
    "pipeline", "text", "chunk",
)
def text_chunk(spark, sf_dir):
    """Overlapping character chunking (size 200, stride 150) of every
    document — the context-window packing step before tokenization. Map-side
    explode, no shuffle; oracle-exact against DuckDB's unnest(range())."""
    return text.chunk_text(tables(spark, sf_dir)["documents"], size=200, stride=150)


@register(
    "text_stratified_sample",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM documents
    WHERE substr(md5(CAST(doc_id AS STRING)), 1, 2)
          < CASE WHEN lang = 'en' THEN '20' ELSE '80' END
    GROUP BY lang
    """,
    "pipeline", "text", "sampling",
)
def text_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: 1/8 of 'en' docs (hex '20' =
    32/256), 1/2 of every other language — the class-rebalancing step of a
    training-data mix. Membership is a pure function of doc_id (md5 prefix
    against a per-stratum hex threshold), so the sample is reproducible
    across engines/runs/partitionings — unlike sampleBy(), whose
    rand()-based picks no oracle can replay. The md5 threshold is a
    computed predicate (filters in the scan stage, not at the parquet
    reader)."""
    d = tables(spark, sf_dir)["documents"]
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thresh = F.when(F.col("lang") == "en", F.lit("20")).otherwise(F.lit("80"))
    return (
        d.filter(prefix < thresh)
        .groupBy("lang")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_sampled"),
            bigint(F.min("doc_id")).alias("first_doc"),
        )
    )


@register(
    "emb_norm_stats",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT label, sqrt({_duck_dot('v', 'v')}) AS nrm FROM e)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
           CAST(SUM(CAST(nrm AS DECIMAL(25,6))) AS DOUBLE) AS sum_norm
    FROM n GROUP BY label
    """,
    "pipeline", "similarity", "stats",
)
def emb_norm_stats(spark, sf_dir):
    """Per-label embedding-norm statistics — the sanity profile run before
    any ANN build (zero-norm and scale-drift vectors break cosine). Norms
    fold sequentially (same shape as dedup_embedding) so the doubles are
    bit-identical to the oracle's; the aggregate is one hash shuffle of
    (label, norm) pairs."""
    from pysparkdb.pipeline.similarity import norm, _as_double

    e = tables(spark, sf_dir)["embeddings"]
    nrm = norm(_as_double(F.col("embedding")))
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_vecs"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            F.sum(F.col("nrm").cast("decimal(25,6)")).cast("double").alias("sum_norm"),
        )
    )


@register(
    "mm_chunk_audio",
    None,  # byte-level windowed signal math not SQL-expressible → rows-only;
           # window math content-checked in tests/test_pipeline.py
    "pipeline", "multimodal",
)
def mm_chunk_audio(spark, sf_dir):
    """Overlapping fixed-byte audio framing (1 KiB windows, 512 B hop) with
    per-window RMS over document payloads-as-audio — the framing step
    before any spectral feature, through the real mapInPandas plumbing."""
    d = tables(spark, sf_dir)["documents"]
    audio = multimodal.to_binary_column(d)
    return multimodal.chunk_audio(audio, fake=True)
