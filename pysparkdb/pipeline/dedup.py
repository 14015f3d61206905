"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Beyond-reference scope (the reference has no text processing at all); the
designs are the standard large-corpus dedup shapes, expressed so every stage
is a DataFrame op with a shuffle the optimizer can size:

- exact:       hash → groupBy digest → keep min id.      One shuffle.
- n-gram:      explode shingles → self-join on shingle → count → Jaccard.
               Exact but O(sum of per-shingle doc-pair counts) — the
               *verification* step for candidate pairs at scale.
- MinHash+LSH: signature (k hashes) → band buckets → join within bucket →
               verify with exact Jaccard. The scale path: candidate
               generation touches only band-equal pairs.
- SimHash:     per-bit majority of token hashes → band on bytes → Hamming
               filter. Near-dup for small edit distances.

All hashing is xxhash64/md5 (JVM codegen, deterministic across runs/nodes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pysparkdb.pipeline.partitioning import spread as _spread
from pysparkdb.pipeline.text import normalized_fingerprint, tokens, word_shingles


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: md5(normalized text) → survivor = min id per digest.
    Returns (fp, keep_id, n_copies). At 100 TB: one shuffle on the digest;
    the text column never shuffles (hash first, group on 32-byte key)."""
    return (
        df.select(normalized_fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("did"), F.explode(word_shingles(text_col, n)).alias("sh")
    )


def _pair_overlap_counts(
    df: DataFrame, id_col: str, text_col: str, n: int,
    max_doc_freq: int | None,
) -> DataFrame:
    """Shared core of ngram_jaccard_pairs / containment_pairs: pinned
    shingle explode → optional stop-shingle cap → exact-shingle collision
    self-join → (doc_a, doc_b, common, na, nb). ONE home for the two
    load-bearing invariants: (a) the cap drops JOIN pairs only — set
    sizes still count every shingle, so any derived overlap measure is an
    UNDERESTIMATE and a threshold filter can only lose pairs, never
    invent one (property-tested); (b) sizes has one row per document —
    unbounded at corpus scale — and must never be force-broadcast (plain
    shuffle joins; AQE may still pick broadcast when genuinely small).

    The shingle explode feeds up to four consumers (sizes, the stop-set
    scan, both join sides); left lazy each re-tokenizes the corpus, so it
    pins spill-safe (MEMORY_AND_DISK; a production run would checkpoint
    to parquet between stages). The lazily-returned result cannot
    unpersist its own input, so the pin registers with pysparkdb.pins —
    long-lived sessions release between pipelines via
    pins.release_persisted() (lifecycle rationale there); the bench
    protocol deliberately keeps pins warm across sweeps (bench.py's
    no-clearCache note)."""
    from pysparkdb.pins import pin

    sh = pin(_shingled(df, id_col, text_col, n))
    sizes = sh.groupBy("did").agg(F.count(F.lit(1)).alias("nsh"))
    joinable = sh
    if max_doc_freq is not None:
        stop = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        joinable = sh.join(F.broadcast(stop), "sh", "left_anti")
    a = joinable.select(F.col("did").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = joinable.select(F.col("did").alias("doc_b"), F.col("sh").alias("sh_b"))
    common = (
        a.join(b, (F.col("sh_a") == F.col("sh_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("did").alias("doc_a"), F.col("nsh").alias("na"))
    nb = sizes.select(F.col("did").alias("doc_b"), F.col("nsh").alias("nb"))
    return common.join(na, "doc_a").join(nb, "doc_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard ≥ t).

    shingle-explode → self-join on shingle (this IS an LSH on exact-shingle
    collision: only pairs sharing ≥1 shingle are ever materialized) →
    |A∩B| / (|A|+|B|-|A∩B|). Division of two BIGINTs → deterministic double,
    oracle-exact when ``max_doc_freq`` is None.

    ``max_doc_freq`` is the stop-shingle guard — the 100 TB fan-out bound
    (same philosophy as the reference's bloom build-side cutoff,
    fpdb-executor/include/fpdb/executor/physical/Globals.h:54): a shingle
    appearing in d documents fans the self-join out d·(d-1)/2 pairs, so one
    boilerplate phrase shared by a million docs is a 5·10^11-pair explosion.
    With the cap, shingles in > max_doc_freq docs are dropped from the JOIN
    ONLY — set sizes still count every shingle — so the reported jaccard is
    an UNDERESTIMATE of the true value: capping can only remove result
    pairs, never add or inflate one (property-tested). The stop set itself
    is small by construction (≤ total-occurrences / F entries) and
    broadcasts.
    """
    overlaps = _pair_overlap_counts(df, id_col, text_col, n, max_doc_freq)
    return (
        overlaps.select(
            "doc_a",
            "doc_b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: |A∩B|/|A| and |A∩B|/|B| per
    colliding pair, kept when either direction clears ``threshold``.
    Jaccard misses size-mismatched duplication by construction (a doc
    fully embedded in one 10× larger scores J ≤ 0.1); containment is the
    standard detector for quote expansion, boilerplate wrapping and
    doc-inside-doc duplication (Broder's resemblance/containment pair).

    Same plan as ngram_jaccard_pairs — pinned shingle explode,
    exact-shingle collision self-join (with the same broadcastable
    stop-shingle cap when ``max_doc_freq`` is set: capping only drops
    join pairs, so a reported containment is an UNDERESTIMATE and the
    threshold filter can only lose pairs, never invent one), shuffle
    joins against the per-doc set sizes. Divisions of exact BIGINTs →
    deterministic doubles, oracle-exact when the cap is off."""
    return (
        _pair_overlap_counts(df, id_col, text_col, n, max_doc_freq)
        .select(
            "doc_a",
            "doc_b",
            (F.col("common") / F.col("na")).alias("cont_a"),
            (F.col("common") / F.col("nb")).alias("cont_b"),
        )
        .filter(F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature: sig[j] = min over shingles of xxhash64(shingle, j).
    Signature is a fixed 32×8-byte column regardless of document size —
    that reduction is what makes 100 TB dedup feasible.

    Shape: explode shingles → hash each once → groupBy doc with one MIN
    per lane. Everything stays inside whole-stage codegen — Spark's
    higher-order functions (transform/array_min/aggregate) are evaluated
    INTERPRETED per row, and the previous HOF formulation measured 2.3×
    slower than this one despite being shuffle-free. The groupBy's shuffle
    is negligible by construction: each document's shingles live in one
    partition, so map-side partial aggregation collapses them to a single
    32-lane row per doc before the exchange — shuffle volume == the
    signature output itself, at any scale.

    Hash family: the shingle STRING is hashed once (xxhash64 → long);
    each lane then re-hashes that 8-byte long with the lane index,
    lane_j = xxhash64(h, j) — a full-width integer hash per lane, far
    cheaper than a string hash and, unlike an affine
    Kirsch–Mitzenmacher combine (h1 + j·h2), genuinely independent
    across lanes. K-M is NOT min-wise independent: across j the lane
    values of a document's shingles form a lower envelope of lines, so
    only the few envelope-segment shingles ever attain the min — an
    earlier K-M version produced signatures where J≈0.98 clone pairs
    shared 0/32 lanes (the one differing shingle owned the envelope).
    Recall floors vs the exact baseline are asserted in tests at both
    test scales.
    """
    hashed = _shingled(df, id_col, text_col, n).select(
        "did", F.xxhash64("sh").alias("h")
    )
    lanes = [
        F.min(F.xxhash64(F.col("h"), F.lit(j))).alias(f"_s{j}")
        for j in range(num_hashes)
    ]
    return (
        hashed.groupBy("did")
        .agg(*lanes)
        .select("did", F.array(*[f"_s{j}" for j in range(num_hashes)]).alias("sig"))
    )


def minhash_band_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs: signature → band buckets → pairs that
    collide in ≥1 band (may contain band-level duplicates — consumers are
    duplicate-insensitive by contract; dedup here would cost a full extra
    shuffle of the widest frame in the pipeline)."""
    from pysparkdb.pins import pin

    if num_hashes % rows_per_band != 0:
        # flooring would compute (and shuffle) the trailing signature lanes
        # corpus-wide, then silently never band them — pure waste with the
        # recall of the floored band count; make the caller pick exact math
        raise ValueError(
            f"rows_per_band={rows_per_band} must divide "
            f"num_hashes={num_hashes}: trailing lanes would be computed "
            "but never banded"
        )
    num_bands = num_hashes // rows_per_band
    # both sides of the band self-join below consume the signature frame;
    # left lazy, the shingle explode + 32-lane aggregation runs twice
    # (verified: 0 ReusedExchange in the executed plan) — pin the compact
    # one-row-per-doc signatures (the simhash_pairs/minhash_lsh_pairs
    # policy; same clearCache lifecycle)
    sigs = pin(minhash_signatures(df, id_col, text_col, n, num_hashes))
    bands = sigs.select(
        "did",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ),
                        b,
                    ).alias("bh"),
                ),
            )
        ).alias("band_key"),
    ).select("did", "band_key.band", "band_key.bh")
    a = bands.select(F.col("did").alias("doc_a"), F.col("band").alias("band_a"), F.col("bh").alias("bh_a"))
    b = bands.select(F.col("did").alias("doc_b"), F.col("band").alias("band_b"), F.col("bh").alias("bh_b"))
    return a.join(
        b,
        (F.col("band_a") == F.col("band_b"))
        & (F.col("bh_a") == F.col("bh_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    ).select("doc_a", "doc_b")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified: signature → band buckets →
    candidate pairs (band-equal) → exact Jaccard verify → pairs ≥ threshold.

    b=16, r=2 ⇒ P(candidate | J=0.5) ≈ 0.99, P(candidate | J=0.9) ≈ 1:
    recall at the 0.5 threshold is effectively total while candidate
    generation only joins within buckets. This is the CIDR-style two-phase
    shape: cheap probabilistic pre-filter, exact verify — the same
    philosophy as the reference's bloom-filter pre-pass (SURVEY §2.9), for
    near-dup search instead of joins.

    ``max_doc_freq`` bounds the verify stage's shingle self-join fan-out
    (see ngram_jaccard_pairs): within the candidate-doc subset, shingles in
    more than that many docs don't join. Verified jaccard becomes a slight
    underestimate, so choose it well above the expected near-dup cluster
    size; the recall-vs-exact floor is asserted in tests/test_pipeline.py.
    """
    from pysparkdb.pins import pin

    # The candidate frame feeds THREE consumers (both cand_docs selects +
    # the final intersect semi-join); left lazy, each one would recompute
    # the full signature aggregation and band self-join over the corpus —
    # measured 3.1x end-to-end on the scale probe. Persist the (doc_a,
    # doc_b) pairs — the narrowest frame in the pipeline — exactly the
    # q21/pipeline_clean_near shared-subtree pin.
    candidates = pin(minhash_band_candidates(
        df, id_col, text_col, n, num_hashes, rows_per_band
    ))
    # Verify ONLY among documents that appear in some candidate pair: the
    # exact shingle-join is O(pairs sharing a shingle) — at corpus scale
    # running it over everything would defeat the LSH; over the candidate
    # doc subset it is O(near-dup cluster sizes). The final semi-join
    # intersects back to exactly the banded pairs.
    cand_docs = (
        candidates.select(F.col("doc_a").alias(id_col))
        .union(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sub = df.join(cand_docs, id_col, "left_semi")
    exact = ngram_jaccard_pairs(sub, id_col, text_col, n, threshold, max_doc_freq)
    return exact.join(candidates, ["doc_a", "doc_b"], "left_semi")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote of token xxhash64 bits.

    Shape: explode tokens → hash each once → groupBy doc with one
    popcount-SUM per bit plus a token COUNT, then assemble the majority
    bits. Fully whole-stage-codegen — the previous formulation (bits×
    aggregate() folds over a token-hash array) ran interpreted, Spark's
    HOF cost model, and measured several× slower. Map-side partial sums
    collapse each doc to one 33-column row before the exchange (each doc's
    tokens sit in one partition), so shuffle volume is fixed per doc.
    """
    hashed = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("did"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select("did", F.xxhash64("tok").alias("h"))

    ones = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"_o{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy("did").agg(*ones, F.count(F.lit(1)).alias("_n"))
    sim = F.lit(0).cast("long")
    for b in range(bits):
        bit = (F.col(f"_o{b}") * 2 > F.col("_n")).cast("long")
        sim = sim + F.shiftleft(bit, b)
    return agg.select("did", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 32, band_bits: int = 8, max_hamming: int = 3,
    sims: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: band the fingerprint into bits/band_bits
    chunks (pigeonhole: hamming ≤ k pairs share ≥1 of k+1 bands), join
    within band, filter on exact Hamming distance via bit_count(xor).

    ``sims``: optionally a precomputed (did, simhash) fingerprint frame
    (persist it if shared with other consumers — fingerprints are one
    16-byte row per doc, the cheapest thing in the pipeline to cache)."""
    if bits % band_bits != 0:
        raise ValueError(
            f"band_bits={band_bits} must divide bits={bits}: the leftover "
            "high bits would never be banded, silently losing candidates"
        )
    num_bands = bits // band_bits
    if num_bands < max_hamming + 1:
        # the pigeonhole guarantee needs k+1 bands for hamming <= k: with
        # fewer, a qualifying pair can differ in every band and silently
        # vanish from the output (the edit_distance_pairs convention —
        # validate the completeness invariant, don't under-recall quietly)
        raise ValueError(
            f"bits/band_bits = {num_bands} bands cannot guarantee recall "
            f"for max_hamming={max_hamming}; need >= {max_hamming + 1} "
            "bands (shrink band_bits or max_hamming)"
        )
    if sims is None:
        # both sides of the band self-join consume the fingerprint frame;
        # left lazy, the full text-shingle hash would run twice — pin the
        # 16-byte-per-doc frame (cheapest thing in the pipeline to cache,
        # exactly what the `sims` parameter asks callers to do)
        from pysparkdb.pins import pin

        sims = pin(simhash(df, id_col, text_col, bits))
    mask = (1 << band_bits) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), i * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for i in range(num_bands)
        ]
    )
    bands = sims.select(
        "did", "simhash", F.explode(band_structs).alias("bk")
    ).select("did", "simhash", "bk.band", "bk.chunk")
    a = bands.select(
        F.col("did").alias("doc_a"), F.col("simhash").alias("sim_a"),
        F.col("band").alias("band_a"), F.col("chunk").alias("chunk_a"),
    )
    b = bands.select(
        F.col("did").alias("doc_b"), F.col("simhash").alias("sim_b"),
        F.col("band").alias("band_b"), F.col("chunk").alias("chunk_b"),
    )
    return (
        a.join(
            b,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("chunk_a") == F.col("chunk_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def cross_corpus_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Decontamination: exact n-gram Jaccard pairs ACROSS two corpora —
    (train_id, bench_id, jaccard ≥ t). The train/test-overlap check every
    LLM data pipeline runs before training: any train document too similar
    to an evaluation document is contamination and must be dropped.

    Same shingle-collision shape as ngram_jaccard_pairs (only pairs
    sharing ≥1 shingle materialize; no doc_a < doc_b condition — the two
    sides are different corpora). ``max_doc_freq`` is the stop-shingle
    fan-out guard computed over the COMBINED shingle stream (a boilerplate
    phrase is boilerplate regardless of which split it lands in); as in
    the single-corpus op it only ever under-reports jaccard. At 100 TB the
    bench side is typically tiny (eval suites) — its shingle set
    broadcasts and the whole check is one map-side pass over train."""
    from pysparkdb.pins import pin

    # Pin both shingle explodes: each feeds up to three consumers (size
    # counts, the combined stop-set scan, the collision join) — the
    # ngram_jaccard_pairs multi-consumer policy; same clearCache lifecycle.
    sha = pin(_shingled(train, id_col, text_col, n).select(
        F.col("did").alias("train_id"), F.col("sh").alias("sh_a")
    ))
    shb = pin(_shingled(bench, id_col, text_col, n).select(
        F.col("did").alias("bench_id"), F.col("sh").alias("sh_b")
    ))
    # Set sizes count EVERY shingle (PRE-stop-filter, the
    # ngram_jaccard_pairs contract): sizes taken after the filter would
    # shrink |A|/|B| for shingles dropped from only one side of a pair
    # and OVERESTIMATE jaccard — capping must only ever remove pairs.
    na = sha.groupBy("train_id").agg(F.count(F.lit(1)).alias("na"))
    nb = shb.groupBy("bench_id").agg(F.count(F.lit(1)).alias("nb"))
    join_a, join_b = sha, shb
    if max_doc_freq is not None:
        combined = sha.select(F.col("sh_a").alias("sh")).unionAll(
            shb.select(F.col("sh_b").alias("sh"))
        )
        stop = (
            combined.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        join_a = sha.join(
            F.broadcast(stop), sha["sh_a"] == stop["sh"], "left_anti"
        )
        join_b = shb.join(
            F.broadcast(stop), shb["sh_b"] == stop["sh"], "left_anti"
        )
    common = (
        join_a.join(join_b, F.col("sh_a") == F.col("sh_b"))
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(na, "train_id")
        .join(nb, "bench_id")
        .select(
            "train_id",
            "bench_id",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _bloom_positions(fp: Column, k: int, m: int) -> Column:
    """k seeded hash positions in [0, m) for a fingerprint — the bit
    indexes a classic Bloom filter would set."""
    return F.array(*[(F.abs(F.xxhash64(fp, F.lit(i))) % m) for i in range(k)])


def incremental_new_documents(
    history: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    m: int = 1 << 20,
) -> DataFrame:
    """Incremental exact dedup: the rows of ``batch`` whose normalized
    text has never appeared in ``history`` — the nightly-ingest shape,
    where the corpus is petabytes of already-deduped history and the new
    batch is comparatively small.

    A direct anti-join would shuffle the ENTIRE history fingerprint set
    every run. Instead the history side is collapsed to a relational
    Bloom filter: the DISTINCT set-bit positions of k seeded hashes over
    a fixed m-bit space — at most m rows (8 MB of longs at m = 2^20)
    whatever the history size, always broadcastable. The batch probes it
    map-side (explode k positions, broadcast join, count == k ⇒ "might
    contain"); only the might-contain candidates — bounded by true dups
    plus the classic (1-e^{-kn/m})^k false-positive rate — pay the exact
    fingerprint semi-join against history. Bloom filters have no false
    negatives, so the result is EXACT, not approximate: definite-new rows
    skip the join entirely, and false positives are eliminated by the
    verify join. Analog of the reference's bloom-filter semi-join
    reduction (fpdb-executor bloomfilter/BloomFilterCreatePOp.cpp) turned
    into a user-level incremental-ingest operator.
    """
    hfp = history.select(normalized_fingerprint(text_col).alias("fp"))
    bits = hfp.select(
        F.explode(_bloom_positions(F.col("fp"), k, m)).alias("pos")
    ).distinct()

    fingered = batch.withColumn("_fp", normalized_fingerprint(text_col))
    probe = fingered.select(
        F.col(id_col), F.col("_fp"),
        F.explode(_bloom_positions(F.col("_fp"), k, m)).alias("pos"),
    )
    might = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy(id_col, "_fp")
        .agg(F.count(F.lit(1)).alias("_nbits"))
        .filter(F.col("_nbits") == k)
        .select(id_col, "_fp")
    )
    true_dups = might.join(hfp, might["_fp"] == hfp["fp"], "left_semi")
    return fingered.join(true_dups.select(id_col), id_col, "left_anti").drop("_fp")


def edit_distance_pairs(
    df: DataFrame,
    field: Column,
    threshold: int,
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    band_width: int | None = None,
) -> DataFrame:
    """Fuzzy string self-join: pairs whose `field` values are within
    `threshold` Levenshtein edits — the near-identical-title/URL matcher
    next to the token-set matchers (ngram_jaccard_pairs) and the
    signature matchers (minhash/simhash). Returns (doc_a, doc_b, dist).

    Scale shape: an all-pairs edit-distance join is O(n²·L²) and never
    runs at corpus scale. Candidates are generated by an EQUI join on
    (block_cols, length band): edit distance ≥ length difference, so a
    pair within `threshold` edits differs in length by ≤ threshold, and
    with band width B > threshold its two band ids differ by ≤ 1. The
    left side replicates into its band and both neighbors (3 rows), the
    right side keeps its own band — every qualifying pair meets in
    exactly one band, so the blocking is LOSSLESS (no candidate missed,
    no pair duplicated) and the join is a plain hash join. Survivors pay
    the banded Levenshtein verify (threshold arg caps the DP band:
    O(L·threshold) per pair, early exit at -1 beyond it).
    """
    if band_width is None:
        band_width = threshold + 1
    if band_width <= threshold:
        raise ValueError("band width must exceed the edit-distance threshold")
    base = df.select(
        F.col(id_col).alias("did"), *block_cols, field.alias("s"),
        F.floor(F.length(field) / band_width).cast("long").alias("band"),
    )
    left = base.select(
        "did", *block_cols, "s",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    right = base
    dist = F.levenshtein(F.col("a.s"), F.col("b.s"), threshold)
    return (
        left.alias("a")
        .join(
            right.alias("b"),
            [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
            + [F.col("a.band") == F.col("b.band"), F.col("a.did") < F.col("b.did")],
        )
        .filter(
            (F.abs(F.length(F.col("a.s")) - F.length(F.col("b.s"))) <= threshold)
            & (dist >= 0)
        )
        .select(
            F.col("a.did").alias("doc_a"),
            F.col("b.did").alias("doc_b"),
            dist.cast("long").alias("dist"),
        )
    )
