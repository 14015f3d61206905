"""Duplicate clustering: connected components over near-dup pair frames.

Pairwise dedup (ngram_jaccard_pairs / minhash_lsh_pairs / simhash_pairs)
emits EDGES; a pipeline needs per-document keep/drop decisions, which
requires grouping transitively-connected docs into one cluster and keeping
one survivor per cluster. A driver-side union-find over collected pairs
would be the obvious small-data answer and exactly the wrong one at 100 TB
(the pair set is unbounded); this module implements the alternating
large-star/small-star MapReduce algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014), where every step is a
groupBy + join on the edge frame:

- large-star: every node links its strictly-larger neighbors to its
  smallest neighbor (or itself).
- small-star: every node links its smaller-or-equal neighbors to the
  smallest of them.

Both steps strictly shrink a monotone potential, converging in
O(log^2 n) rounds (in practice 2-4 on near-dup graphs, whose components
are small and star-like); at the fixpoint every edge is (node -> component
minimum), i.e. the cluster assignment itself. Each round is two shuffles
on the current edge frame — no collect, no unbounded driver state; the
only driver-side value per round is the one-row convergence checksum.

Beyond-reference scope (the reference engine has no graph or dedup
machinery at all); registered-query oracle is a DuckDB recursive CTE over
the same SQL-exact pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) undirected edge frame -> edges linking each node's larger
    neighbors to min(N(u) + {u}). Emits both (v, m) and keeps (u, m).

    NO distinct here (one exchange per round saved, r15): on a distinct
    input each bi edge with v > u emits exactly one row, so duplicates
    are bounded by the edge count, and every consumer is
    duplicate-insensitive -- _small_star's aggregations are MINs and its
    final distinct restores set semantics before the convergence
    checksum ever sees the frame. Labels are provably identical."""
    bi = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        bi.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    return (
        bi.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large->small, then link each node and all its
    smaller neighbors to the smallest neighbor."""
    oriented = edges.filter(F.col("u") != F.col("v")).select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    down = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = mins.select("u", F.col("m").alias("v"))
    return down.unionAll(self_link).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 16,
) -> DataFrame:
    """Cluster ids for every node appearing in ``pairs``: (did, cluster_id)
    with cluster_id = the smallest node id in the component (so the
    conventional survivor -- keep the doc whose id IS its cluster_id -- is
    a filter, not another aggregation).

    Convergence is detected by an order-insensitive edge-set checksum
    (count + XOR of per-edge hashes), one tiny action per round. Each
    round's frame is ``localCheckpoint``-ed: star steps reference their
    input 4x, so chaining logical plans grows the tree ~8x PER ROUND --
    exponential planning cost that OOMs the driver within a handful of
    rounds regardless of data size. Checkpointing truncates lineage to the
    materialized frame (persist alone does NOT -- it caches execution but
    keeps the logical plan). The checkpoint is LAZY (the bfs_hops idiom):
    plan truncation happens at the mark, materialization folds into the
    round's checksum action -- ONE job per round instead of an eager
    checkpoint job plus a checksum job (measured ~2x on the per-round
    driver/stage overhead that dominates small edge sets, r15; the
    checkpointed RDD computes once and every later round reuses it). On
    a real cluster prefer reliable ``checkpoint()`` with a checkpoint
    dir (localCheckpoint loses partitions with a dead executor
    mid-algorithm). Rounds are O(log^2 n), bounded by ``max_rounds`` --
    hitting the bound raises rather than returning a half-contracted
    labeling.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _checksum(e: DataFrame):
        # Order-insensitive edge-set fingerprint: count + XOR of per-edge
        # hashes (XOR, not SUM — overflow-free under ANSI mode; edges are
        # distinct so no cancellation).
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_sum = _checksum(edges)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur_sum = _checksum(nxt)
        edges = nxt
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # Fixpoint edges are (node -> component min) for every non-root node;
    # roots appear only on the v side. Add the roots' self-assignments.
    roots = edges.select(F.col("v").alias("u"), F.col("v")).distinct()
    labels = (
        edges.unionAll(roots)
        .groupBy(F.col("u").alias("did"))
        .agg(F.min("v").alias("cluster_id"))
    )
    return labels


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Keep-list after clustering: every document keeps its cluster_id
    (its own id when it has no near-dup), plus keep = (id == cluster_id).
    One left join of the corpus against the (small) non-trivial labels."""
    labels = connected_components(pairs, src, dst)
    return df.select(F.col(id_col)).join(
        labels.withColumnRenamed("did", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias("keep"),
    )
