"""Similarity search over embedding columns (array<float>).

Brute-force cosine as the exact baseline; random-hyperplane LSH bucketing as
the scale path. Dot products run as JVM higher-order functions
(zip_with + aggregate — whole-stage codegen, no Python), with all arithmetic
in double so results are oracle-exact.

At 100 TB: brute force is O(n·q) pair evaluations — usable when one side is
small (a query batch). The LSH variant buckets both sides so each query only
scans its bucket; recall/latency trades via nbits. (A production IVF would
k-means the centroids; hyperplane LSH keeps the demo deterministic.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, bit-identical to the oracle's loop."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.select("vec_id", v.alias("v"), norm(v).alias("nrm"))


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism.

    A single parquet file scans as ONE partition; used as the stream side
    of a broadcast nested-loop join, that serializes the entire O(n·q)
    dot-product work onto one core. One cheap shuffle of (id, vec) rows
    buys full-cluster parallelism for the pair evaluation — at 100 TB the
    input is many files and this becomes a no-op-sized rebalance.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n)


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
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") > threshold)
    )


def topk_neighbors(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 1,
    query_filter: Column | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (excluding self).

    Brute force: query side × full candidate side, ranked with a window.
    Ties broken by neighbor id so results are total-ordered and
    oracle-stable.
    """
    from pyspark.sql import Window

    e = with_norm(df, vec_col)
    q = e if query_filter is None else e.filter(query_filter)
    q = _spread(q).withColumnsRenamed({"vec_id": "qid", "v": "qv", "nrm": "qn"})
    c = e.withColumnsRenamed({"vec_id": "cid", "v": "cv", "nrm": "cn"})
    scored = q.join(c, F.col("qid") != F.col("cid")).select(
        "qid", "cid",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", F.col("rnk").cast("long").alias("rnk"))
    )


def hyperplane_buckets(
    df: DataFrame, dim: int, vec_col: str = "embedding", nbits: int = 6, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (deterministic planes from
    a seeded RNG, shipped as literals — no UDF, no broadcast variable)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(nbits, dim)
    df = _spread(df)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i in range(nbits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (dot(v, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return df.select("vec_id", v.alias("v"), norm(v).alias("nrm"), bucket.alias("bucket"))


def lsh_topk_neighbors(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    k: int = 1,
    nbits: int = 6,
    query_filter: Column | None = None,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. The bucket join replaces the cross join — at 100 TB this is the
    difference between n·q and n·q/2^nbits pair evaluations; recall is
    tuned by nbits (fewer bits → bigger buckets → higher recall)."""
    from pyspark.sql import Window

    e = hyperplane_buckets(df, dim, vec_col, nbits)
    q = e if query_filter is None else e.filter(query_filter)
    q = q.withColumnsRenamed({"vec_id": "qid", "v": "qv", "nrm": "qn", "bucket": "qb"})
    c = e.withColumnsRenamed({"vec_id": "cid", "v": "cv", "nrm": "cn", "bucket": "cb"})
    scored = q.join(c, (F.col("qb") == F.col("cb")) & (F.col("qid") != F.col("cid"))).select(
        "qid", "cid",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", F.col("rnk").cast("long").alias("rnk"))
    )
