"""Similarity search over embedding columns (array<float>).

Brute-force cosine as the exact baseline; random-hyperplane LSH bucketing as
the scale path. Pair scoring — the O(n·q) hot path — is the interpreted
Column fold (`dot`): Catalyst evaluates higher-order-function lambdas
interpreted per row, but the pair row's two vectors already live JVM-side,
so the fold beats the Arrow alternative. An Arrow-batched pandas_udf
scoring the same join output must SERIALIZE both 64-dim vectors for every
pair across the JVM/Python boundary — O(pairs · dim · 8 B) transfer that
dominates the arithmetic (measured at sf0.1, 2000 vectors / 4M pairs:
fold 1.7 s vs Arrow scorer 3.5 s median). Vectorized UDFs win where the
matrix rides in the UDF CLOSURE and only n rows cross the boundary —
hyperplane bucket bits and IVF cell assignment below (measured ~10× wins)
— not where per-pair data must cross. A closure-side matmul over the
whole candidate set would avoid the transfer but sums in numpy's pairwise
order, breaking bit-equality with the oracle's sequential fold.

At 100 TB: brute force is O(n·q) pair evaluations — usable when one side is
small (a query batch). The LSH variant buckets both sides so each query only
scans its bucket; recall/latency trades via nbits. (A production IVF would
k-means the centroids; hyperplane LSH keeps the demo deterministic.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pysparkdb.pipeline.partitioning import spread as _spread


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _non_null_vecs(df: DataFrame, vec_col: str) -> DataFrame:
    """NULL embeddings carry no direction: every path here EXCLUDES them
    up front. The embeddings schema declares the column nullable
    (catalog.py), and the exact paths already dropped such rows
    implicitly (NULL cosine fails any threshold and sorts last in the
    top-k window) — but the Arrow-batched paths would instead CRASH the
    job (np.stack over a batch containing None), turning 'exact vs scale
    path' from slower-vs-faster into works-vs-crashes. One explicit
    filter gives every variant the same semantics: a row without a
    vector is neither candidate, query, nor quantizable."""
    return df.filter(F.col(vec_col).isNotNull())


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over (qid, cid, cosine) rows: cosine desc, ties by
    cid asc. THE ranking contract, defined once — the exact, LSH and IVF
    paths all rank through it, which is what keeps 'approximate results
    match/⊆ exact results' assertions meaningful (a drifted tie-break in
    one path would fail them spuriously)."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", F.col("rnk").cast("long").alias("rnk"))
    )


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, bit-identical to the oracle's loop.

    Interpreted (Catalyst does not codegen HOF lambdas), and still the
    right pair-scoring primitive: the join row's vectors are already
    JVM-side, so no serialization — see the module docstring for the
    measured comparison against an Arrow-batched scorer."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_norm(
    df: DataFrame, vec_col: str = "embedding", keep: tuple[str, ...] = ()
) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return _non_null_vecs(df, vec_col).select(
        "vec_id", *keep, v.alias("v"), norm(v).alias("nrm")
    )


def _pair_cosine() -> Column:
    """Scoring expression shared by the exact (cosine_pairs) and bucketed
    (lsh_near_dup_pairs) paths over (va, na, vb, nb) columns — ONE
    definition so 'the LSH output is a subset of cosine_pairs at the same
    threshold' stays provable by construction."""
    return (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine")


def cosine_pairs(
    df: DataFrame, vec_col: str = "embedding", threshold: float = 0.4
) -> DataFrame:
    """All pairs (a < b) with cosine similarity > threshold — embedding
    near-dup detection. Norms are computed once per side (n, not n²)."""
    e = with_norm(df, vec_col)
    a = _spread(e).withColumnsRenamed({"vec_id": "id_a", "v": "va", "nrm": "na"})
    b = e.withColumnsRenamed({"vec_id": "id_b", "v": "vb", "nrm": "nb"})
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _pair_cosine())
        .filter(F.col("cosine") > threshold)
    )


def lsh_near_dup_pairs(
    df: DataFrame, vec_col: str = "embedding", threshold: float = 0.95,
    dim: int = 64, nbits: int = 8, tables: int = 8, seed: int = 42,
) -> DataFrame:
    """Bucketed embedding near-dup: sign-LSH candidate pairs (same bucket
    in ANY table) verified by exact cosine > ``threshold`` — the scale
    path beside brute-force ``cosine_pairs`` (which is O(n²) by design as
    the oracle baseline). Near-identical directions agree on every
    hyperplane sign, so true near-dups collide in EVERY table while the
    bucket join prunes unrelated pairs by ~(1/2)^nbits per table; the
    verify join is exact, so precision is 1 by construction and the
    output is a SUBSET of cosine_pairs at the same threshold.

    At 100 TB: candidates are (id, id) rows off a bucket-keyed self-join
    (never vector payloads — vectors re-join only for the verified
    candidate set), and the bucket computation is one Arrow-batched
    matmul per partition (hyperplane_buckets)."""
    from pysparkdb.pins import pin

    # Both sides of the bucket self-join consume the bucket frame; left
    # lazy, the Arrow-batched plane matmul would run twice over the
    # corpus. Persist the id-level frame (payload columns pruned first —
    # 3 small columns per (vector, table), never the vectors).
    b = pin(hyperplane_buckets(
        df, dim=dim, vec_col=vec_col, nbits=nbits, tables=tables, seed=seed
    ).select("tbl", "bucket", "vec_id"))
    a = b.select("tbl", "bucket", F.col("vec_id").alias("id_a"))
    c = b.select("tbl", "bucket", F.col("vec_id").alias("id_b"))
    cand = (
        a.join(c, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    e = with_norm(df, vec_col)
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                  F.col("nrm").alias("na"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                  F.col("nrm").alias("nb"))
    return (
        cand.join(ea, "id_a").join(eb, "id_b")
        .select("id_a", "id_b", _pair_cosine())
        .filter(F.col("cosine") > threshold)
    )


def topk_neighbors(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 1,
    query_filter: Column | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (excluding self).

    Brute force: query side × full candidate side, ranked through the
    shared ``_topk`` contract (ties broken by neighbor id so results are
    total-ordered and oracle-stable).
    """
    e = with_norm(df, vec_col)
    q = e if query_filter is None else e.filter(query_filter)
    q = _spread(q).withColumnsRenamed({"vec_id": "qid", "v": "qv", "nrm": "qn"})
    c = e.withColumnsRenamed({"vec_id": "cid", "v": "cv", "nrm": "cn"})
    scored = q.join(c, F.col("qid") != F.col("cid")).select(
        "qid", "cid",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    return _topk(scored, k)


def hyperplane_buckets(
    df: DataFrame, dim: int, vec_col: str = "embedding", nbits: int = 6,
    tables: int = 8, seed: int = 42,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: one bucket id per (vector, table),
    exploded to (vec_id, v, nrm, tbl, bucket) rows. Deterministic planes
    from a seeded RNG, shipped as literals — no UDF, no broadcast variable.

    Single-table sign-LSH has recall (1−θ/π)^nbits per neighbor — ~9% for
    a 60° neighbor at 6 bits; OR-ing ``tables`` independent tables lifts it
    to 1−(1−p)^L (the standard (nbits, L) trade: bits shrink buckets,
    tables buy recall)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    # (tables·nbits) × dim plane matrix: ALL sign bits come from one
    # Arrow-batched matmul — the vectorized-pandas-UDF path; the
    # expression-tree alternative (48 interpreted HOF dot-folds per row)
    # measured ~10× slower
    planes = rng.randn(tables * nbits, dim)
    weights = (1 << np.arange(nbits)).astype(np.int64)

    import pandas as pd

    def _bucket_fn(vs):
        if len(vs) == 0:  # empty Arrow batch (the _cell_distances guard)
            return pd.Series([], dtype=object)
        x = np.stack(vs.to_numpy())                      # n × dim
        bits = (x @ planes.T) > 0                        # n × (tables·nbits)
        b = bits.reshape(len(x), tables, nbits) @ weights  # n × tables
        return pd.Series(list(b))

    # real (non-stringified) annotations: `from __future__ import
    # annotations` would otherwise defeat pandas_udf type-hint inference
    _bucket_fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    bucket_ids = pandas_udf(_bucket_fn, T.ArrayType(T.LongType()))

    v = _as_double(F.col(vec_col))
    base = _spread(_non_null_vecs(df, vec_col)).select(
        "vec_id", v.alias("v"), norm(v).alias("nrm")
    )
    tb = F.transform(
        bucket_ids("v"),
        lambda b, t: F.struct(t.alias("tbl"), b.alias("bucket")),
    )
    return base.select(
        "vec_id", "v", "nrm", F.explode(tb).alias("_tb")
    ).select("vec_id", "v", "nrm", "_tb.tbl", "_tb.bucket")


def lsh_topk_neighbors(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    k: int = 1,
    nbits: int = 6,
    tables: int = 8,
    query_filter: Column | None = None,
) -> DataFrame:
    """Approximate top-k: candidates sharing a bucket with the query in ANY
    of the L hash tables are scored (pairs deduped before scoring). At
    100 TB the bucket join replaces the cross join: ~L·n·q/2^nbits pair
    evaluations; recall for genuinely-near neighbors (cos ≥ .8) is ≥ 95%
    by the (nbits, L) math, while far 'nearest' neighbors are inherently
    hard for any LSH — that is the documented trade."""
    from pysparkdb.pins import pin

    # both the query and candidate sides derive from the bucket frame;
    # the filtered query subtree differs, so no exchange reuse — pin it
    # or the corpus-wide plane matmul runs twice (the lsh_near_dup_pairs
    # policy; clearCache lifecycle)
    e = pin(hyperplane_buckets(df, dim, vec_col, nbits, tables))
    q = e if query_filter is None else e.filter(query_filter)
    return _bucket_join_topk(q, e, k)


def _bucket_join_topk(
    q: DataFrame, c: DataFrame, k: int, exclude_self: bool = True
) -> DataFrame:
    """Shared LSH search stage: bucket-collision join in any table,
    pair dedup, cosine score, shared per-query ``_topk`` ranking. Inputs
    carry (vec_id, v, nrm, tbl, bucket). ``exclude_self`` drops qid == cid
    pairs — correct when queries ARE corpus rows (self-search); pass
    False for an external query batch whose ids are an independent
    space (an id collision there is NOT the same vector)."""
    q = q.withColumnsRenamed({"vec_id": "qid", "v": "qv", "nrm": "qn"})
    c = c.withColumnsRenamed({"vec_id": "cid", "v": "cv", "nrm": "cn"})
    pairs = (
        q.join(c, on=["tbl", "bucket"])
        .filter(F.col("qid") != F.col("cid") if exclude_self else F.lit(True))
        .select("qid", "cid", "qv", "cv", "qn", "cn")
        .dropDuplicates(["qid", "cid"])  # a pair may collide in several tables
    )
    scored = pairs.select(
        "qid", "cid",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    return _topk(scored, k)


def build_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    vec_col: str = "embedding",
    nbits: int = 6,
    tables: int = 8,
    seed: int = 42,
) -> None:
    """Persist the multi-table LSH index in two tables: the bucket map
    (vec_id, tbl, bucket) hive-partitioned by table, the vector payload
    (vec_id, v, nrm) stored ONCE — not once per table, which would
    inflate the index by the L factor — plus a one-row meta parquet
    (dim, nbits, tables, seed). The hyperplanes are a pure function of
    (seed, dim, nbits, tables), so search re-derives them bit-identically
    instead of serializing the matrix — the bucket assignment (the
    corpus-wide matmul pass) is what the build pays once.
    """
    b = hyperplane_buckets(df, dim, vec_col, nbits, tables, seed)
    b.select("vec_id", "tbl", "bucket").write.mode("overwrite").partitionBy(
        "tbl"
    ).parquet(f"{path}/buckets.parquet")
    # vectors come straight from the corpus (vec_id is unique) — routing
    # them through the bucket frame would re-run the plane matmul, explode
    # rows ×tables, and pay a dedup shuffle for data already at hand
    v = _as_double(F.col(vec_col))
    _non_null_vecs(df, vec_col).select(
        "vec_id", v.alias("v"), norm(v).alias("nrm")
    ).write.mode("overwrite").parquet(f"{path}/vectors.parquet")
    from pysparkdb.functions.local_rows import jvm_rows_df

    jvm_rows_df(
        df.sparkSession,
        [(dim, nbits, tables, seed)],
        "dim int, nbits int, tables int, seed int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.parquet")


def lsh_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str = "embedding",
    k: int = 1,
    exclude_self: bool = True,
) -> DataFrame:
    """Search a persisted LSH index (build_lsh_index layout): bucket the
    query batch with planes re-derived from the stored seed, rehydrate
    candidates by joining the bucket map with the once-stored vector
    payload (co-keyed on vec_id), and run the shared collision search.
    Identical results to lsh_topk_neighbors for the same build inputs
    (asserted in tests). ``exclude_self=False`` for external query
    batches whose id space is independent of the corpus ids."""
    m = spark.read.parquet(f"{path}/meta.parquet").first()
    cand = (
        spark.read.parquet(f"{path}/buckets.parquet")
        .join(spark.read.parquet(f"{path}/vectors.parquet"), "vec_id")
        .select("vec_id", "v", "nrm", F.col("tbl").cast("int").alias("tbl"), "bucket")
    )
    q = hyperplane_buckets(queries, m.dim, vec_col, m.nbits, m.tables, m.seed)
    return _bucket_join_topk(q, cand, k, exclude_self=exclude_self)


def train_ivf_centroids(
    df: DataFrame, dim: int, vec_col: str = "embedding",
    nlist: int = 8, sample_rows: int = 512, iters: int = 10, seed: int = 42,
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids from a deterministic sample.

    Index-build phase (offline in a real system): the first ``sample_rows``
    vectors by id train Lloyd's k-means driver-side in numpy — at 100 TB
    the sample, not the corpus, bounds this step; assignment (the scan
    phase) stays fully distributed. Deterministic: fixed sample order,
    seeded init, fixed iteration count.
    """
    rows = (
        _non_null_vecs(df, vec_col)
        .select("vec_id", _as_double(F.col(vec_col)).alias("v"))
        .orderBy("vec_id")
        .limit(sample_rows)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    x = np.array([r.v for r in rows])
    if x.shape[1] != dim:
        raise ValueError(f"vectors have dim {x.shape[1]}, expected {dim}")
    # fewer sampled vectors than requested cells: every vector its own
    # centroid (k-means with k >= n is exactly that), not a numpy crash
    nlist = min(nlist, len(x))
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=nlist, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                centroids[c] = x[m].mean(axis=0)
    return centroids


def _cell_distances(v: Column, centroids: np.ndarray) -> Column:
    """array of ||v-c||²-equivalent scores (−2·v·c + ||c||²; ||v||² is
    constant per row and cannot change the argmin).

    One Arrow-batched matmul against the (nlist × dim) centroid matrix —
    the hyperplane_buckets pattern; the previous per-centroid HOF folds
    ran interpreted, nlist× per row. Distances feed only argmin/probe
    ordering (never an oracle hash), so matmul summation order is fine."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    C = centroids.astype(np.float64)
    c2 = (C * C).sum(axis=1)

    def _fn(vs):
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(vs.to_numpy())
        d2 = -2.0 * (x @ C.T) + c2
        return pd.Series(list(d2))

    _fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(_fn, T.ArrayType(T.DoubleType()))(v)


def ivf_topk_neighbors(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    k: int = 1,
    nlist: int = 8,
    nprobe: int = 2,
    query_filter: Column | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: candidates assigned to their nearest
    centroid cell; each query probes its ``nprobe`` nearest cells. The
    scale path next to LSH (lsh_topk_neighbors): cells are data-adaptive,
    so recall per probed fraction beats data-oblivious hyperplanes on
    clustered corpora; probe cost is n·q·(nprobe/nlist) pair evaluations.
    """
    from pysparkdb.pins import pin

    centroids = train_ivf_centroids(df, dim, vec_col, nlist=nlist)
    e = _spread(with_norm(df, vec_col))
    # consumed by both the candidate and query sides — pin, or the
    # corpus-wide centroid-distance matmul runs twice (same rationale as
    # lsh_topk_neighbors above)
    scored_cells = pin(e.withColumn(
        "_cd", _cell_distances(F.col("v"), centroids)
    ))
    cand = _nearest_cell(scored_cells)
    q = scored_cells if query_filter is None else scored_cells.filter(query_filter)
    return _probe_and_score(q, cand, k=k, nprobe=nprobe)


def _nearest_cell(scored_cells: DataFrame) -> DataFrame:
    """Candidate side of IVF: every vector lives in exactly its nearest
    cell. Input must carry (vec_id, v, nrm, _cd)."""
    return scored_cells.withColumn(
        "cell", F.array_position(F.col("_cd"), F.array_min("_cd")).cast("int")
    ).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "cell",
    )


def _probe_and_score(
    q_scored: DataFrame, cand: DataFrame, k: int, nprobe: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Shared IVF search stage: queries (vec_id, v, nrm, _cd) explode into
    their ``nprobe`` nearest cells (sorted (dist, idx) pairs), join the
    candidate frame on cell, cosine-score, shared ``_topk`` ranking."""
    probes = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("_cd"),
                    lambda d, i: F.struct(d.alias("d"), (i + 1).alias("idx")),
                )
            ),
            1, nprobe,
        ),
        lambda s: s["idx"].cast("int"),
    )
    q = q_scored.select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.explode(probes).alias("cell"),
    )
    scored = q.join(cand, on="cell").filter(
        F.col("qid") != F.col("cid") if exclude_self else F.lit(True)
    ).select(
        "qid", "cid",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    return _topk(scored, k)


def build_ivf_index(
    df: DataFrame,
    path: str,
    dim: int,
    vec_col: str = "embedding",
    nlist: int = 8,
) -> None:
    """Offline IVF index build — pay the train+assign cost ONCE, search
    many times (the FAISS build/search split, lakehouse-style). Writes:

    - ``path``/centroids.parquet — (cell, c): nlist rows, the coarse
      quantizer; tiny, read whole at search time.
    - ``path``/assignments.parquet — (cid, cv, cn, cell), hive-partitioned
      BY CELL: each probed cell is a directory, so a search touching
      nprobe cells scans nprobe/nlist of the corpus off directory layout
      alone (the write-side half of partition pruning; same economics as
      write_bucketed/write_zordered — shuffle-class work at build time
      buys every subsequent search its pruning).

    At 100 TB the assignment pass is one distributed scan (Arrow-batched
    matmul per partition); only the nlist-row centroid table ever reaches
    the driver.
    """
    centroids = train_ivf_centroids(df, dim, vec_col, nlist=nlist)
    spark = df.sparkSession
    # nlist rows of literal arrays — JVM-side (functions/local_rows): the
    # pickled-RDD path would make the index build's ONLY non-UDF job carry
    # a Python-worker dependency
    from pysparkdb.functions.local_rows import jvm_rows_df

    cdf = jvm_rows_df(
        spark,
        [(i + 1, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, c array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    e = _spread(with_norm(df, vec_col))
    assigned = _nearest_cell(
        e.withColumn("_cd", _cell_distances(F.col("v"), centroids))
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/assignments.parquet"
    )


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str = "embedding",
    k: int = 1,
    nprobe: int = 2,
    exclude_self: bool = True,
) -> DataFrame:
    """Search a persisted IVF index (build_ivf_index layout): load the
    nlist-row centroid table (the only driver materialization), score the
    query batch against it with the same Arrow-batched matmul as the
    in-memory path, and probe the cell-partitioned assignments table.
    Identical results to ivf_topk_neighbors for the same build inputs
    (asserted in tests) — the cell expression and centroid doubles
    round-trip parquet exactly.
    """
    crows = sorted(
        spark.read.parquet(f"{path}/centroids.parquet").collect(),
        key=lambda r: r.cell,
    )
    centroids = np.array([list(r.c) for r in crows])
    cand = spark.read.parquet(f"{path}/assignments.parquet").select(
        "cid", "cv", "cn", F.col("cell").cast("int").alias("cell")
    )
    q = _spread(with_norm(queries, vec_col)).withColumn(
        "_cd", _cell_distances(F.col("v"), centroids)
    )
    return _probe_and_score(q, cand, k=k, nprobe=nprobe, exclude_self=exclude_self)


def _int8_staged(df: DataFrame, vec_col: str) -> DataFrame:
    """(vec_id, _vd, _amax, _scale) with the cast vector, abs-max and scale
    each computed ONCE PER ROW as materialized columns. Staging is the
    whole point: a single Column expression embedding ``scale`` inside the
    per-element transform lambda re-evaluates the array_max subtree per
    ELEMENT (and the CASE WHEN carries it twice), turning an O(dim) row
    into O(dim²) interpreted work — measured as the ~4 s driver-side
    broadcast build of the quantized candidate side (r15 optimization,
    guide §1.2 'fix the per-task work'). Attribute references keep values
    bit-identical; CollapseProject cannot re-inline _amax (referenced
    twice, non-cheap) so the heavy subtree stays per-row."""
    vd = _as_double(F.col(vec_col))
    return (
        _non_null_vecs(df, vec_col)
        .select("vec_id", vd.alias("_vd"))
        .withColumn("_amax", F.array_max(F.transform(F.col("_vd"), F.abs)))
        .withColumn(
            "_scale",
            F.when(F.col("_amax") == 0.0, F.lit(1.0)).otherwise(
                F.col("_amax") / F.lit(127.0)
            ),
        )
    )


def _int8_codes_col() -> Column:
    """Symmetric int8 codes over the _int8_staged columns: q_i =
    floor(v_i/scale + 0.5) clamped to [-127, 127], as LONGs. THE
    quantization rule, defined once — the storage path
    (quantize_embeddings) and the scoring path (quantized_topk_neighbors)
    must quantize identically or the ann_quantized recall certificate
    silently measures a different code space than the corpus stores.
    floor(x+0.5) is the explicit half-up rule both engines share (round()
    is half-even in one, half-up in the other). The lambda touches only
    the _vd element and the _scale attribute — per-element cost is O(1),
    see _int8_staged."""
    return F.transform(
        F.col("_vd"),
        lambda x: F.greatest(
            F.lit(-127.0), F.least(F.lit(127.0), F.floor(x / F.col("_scale") + 0.5))
        ).cast("long"),
    )


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization, per vector: scale = max|v_i|/127,
    q_i = floor(v_i/scale + 0.5) clamped to [-127, 127] — the 4× storage
    reduction (float32 -> int8) every 100 TB vector corpus takes before
    serving ANN. Returns (vec_id, scale, q) with q serialized as a
    comma-joined int string (order-deterministic, oracle-exact).

    Pure higher-order built-ins (transform / array_max / array_join) —
    abs-max, divide, floor, clamp are elementwise float64 ops Catalyst
    codegens JVM-side, bit-identical to the oracle's per-element SQL
    (IEEE 754; floor(x+0.5) is the explicit half-up rule BOTH engines
    share, unlike round(), whose half-even/half-up mode differs between
    them). Elementwise math needs no Python at all: the previous
    Arrow-batched pandas_udf form computed the same values but paid the
    Python-worker-pool restart whenever this query followed a long
    JVM-only stretch (the bench artifact BENCH_BASELINE.md adjudicates —
    0.6 s warm, 3-6 s after a worker reap); built-ins delete that failure
    mode along with the Arrow transfer. Zero vectors quantize against
    scale 1.0. Map-side only: no shuffle, output partitioning inherits
    the scan."""
    return _int8_staged(_spread(df), vec_col).select(
        "vec_id",
        F.round(F.col("_scale"), 6).alias("scale"),
        F.array_join(_int8_codes_col(), ",").alias("q"),
    )


def quantized_topk_neighbors(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 1,
    query_filter: Column | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine neighbors scored on int8-QUANTIZED codes — the int8
    scoring KERNEL, not a standalone scale path: because symmetric
    quantization divides every component by the same per-vector scale,
    the scales CANCEL in cosine — cos(a, b) ≈ Σqa·qb / (√Σqa² · √Σqb²)
    needs no dequantization, candidates stream as int8 (4× smaller than
    float32), and integer dot products are exact associative long sums
    (no float accumulation order to worry about); the only doubles are
    the final sqrt/divide per pair. Ranked through the shared ``_topk``
    contract so recall certificates against the exact path stay
    meaningful.

    Candidate bounding is the caller's job, same convention as the
    lsh/ivf tiers: pass ``candidates`` — a (qid, cid) pair frame, e.g.
    the bucket join of ``lsh_topk_neighbors`` / ``ivf_topk_neighbors`` —
    and only those pairs are scored (two hash joins on the id keys).
    With ``candidates=None`` the kernel scores ALL query×corpus pairs —
    the exact-recall certificate form (ann_quantized bounds the query
    set instead), O(|q|·|corpus|) like the brute-force float tier; int8
    shrinks bytes 4× but does NOT bound the pair count, so never ship
    the unbounded form against an unbounded query set at scale.

    At 100 TB the standard stack is: LSH/IVF candidate generation →
    int8 scan (this, bounded) → exact float rerank of the survivors
    (``topk_neighbors`` on the candidate subset)."""
    def idot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # codes materialize as a column BEFORE nrm references them — idot over
    # the "v" attribute, not two fresh copies of the quantization tree
    # (which would re-run the per-row staging twice; see _int8_staged)
    base = (
        _int8_staged(df, vec_col)
        .select("vec_id", _int8_codes_col().alias("v"))
        .select(
            "vec_id", "v",
            F.sqrt(idot(F.col("v"), F.col("v")).cast("double")).alias("nrm"),
        )
    )
    q = base if query_filter is None else base.filter(query_filter)
    q = _spread(q).withColumnsRenamed({"vec_id": "qid", "v": "qv", "nrm": "qn"})
    c = base.withColumnsRenamed({"vec_id": "cid", "v": "cv", "nrm": "cn"})
    if candidates is None:
        pairs = q.join(c, F.col("qid") != F.col("cid"))
    else:
        # dropDuplicates BEFORE scoring: a raw LSH/IVF bucket join emits
        # the same (qid, cid) once per colliding band/table, and duplicate
        # pairs would score identically and occupy multiple _topk slots,
        # displacing true neighbors (the internal LSH path dedups at the
        # same point — _bucket_join_topk)
        pairs = (
            candidates.select("qid", "cid")
            .where(F.col("qid") != F.col("cid"))
            .dropDuplicates(["qid", "cid"])
            .join(q, "qid")
            .join(c, "cid")
        )
    scored = pairs.select(
        "qid", "cid",
        (idot(F.col("qv"), F.col("cv")).cast("double")
         / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    return _topk(scored, k)


def hard_negatives(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 1,
    query_filter: Column | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-k most-similar candidates with a DIFFERENT label — the
    highest-value negatives a contrastive loss can see (easy negatives
    are already far away; the near-but-wrong ones carry the gradient).

    Same plan shape as topk_neighbors with the label-mismatch predicate
    folded into the join, so mismatch filtering happens BEFORE scoring —
    at 100 TB the label filter prunes the candidate side per query class
    (and the bucketed LSH/IVF variants apply unchanged when brute force
    is too wide: mine within buckets, then re-rank). Ties broken by cid.
    """
    from pyspark.sql import Window

    e = with_norm(df, vec_col, keep=(label_col,))
    q = e if query_filter is None else e.filter(query_filter)
    q = _spread(q).withColumnsRenamed(
        {"vec_id": "qid", "v": "qv", "nrm": "qn", label_col: "qlabel"}
    )
    c = e.withColumnsRenamed({"vec_id": "cid", "v": "cv", "nrm": "cn", label_col: "clabel"})
    scored = q.join(
        c, (F.col("qid") != F.col("cid")) & (F.col("qlabel") != F.col("clabel"))
    ).select(
        "qid", "qlabel", "cid", "clabel",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "qid", F.col("qlabel").cast("long").alias("qlabel"),
            "cid", F.col("clabel").cast("long").alias("clabel"), "cosine",
        )
    )
