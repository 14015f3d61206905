"""Iterative graph algorithms as DataFrame loops — fixed-point PageRank.

The reference engine is strictly one-shot batch SQL (SURVEY §2.10); a
training-data pipeline additionally needs iterative link analysis — rank
web/document graphs for crawl prioritization and quality weighting (the
PageRank-as-quality-signal lineage of Common Crawl curation). This module
implements power-iteration PageRank as a loop of joins and aggregations on
DataFrames, the same shape connected components takes in
pysparkdb.pipeline.cluster (Kiveris-style: every step is groupBy + join,
no driver-side graph state).

Determinism contract: ranks are carried as BIGINT "units" (1e12 = total
mass) and every division is an explicit floor — integer arithmetic is
associative and engine-exact, so a DuckDB oracle replaying the same
schedule matches bit-for-bit, which no float formulation survives
(cross-engine float SUM order differs; ten iterations amplify it). This is
also the production reproducibility trick: fixed-point ranks make reruns
and incremental refreshes byte-stable. Truncation loses < out_degree
units/node/iteration of mass — bounded and asserted in tests.

Scale shape (100 TB): each iteration is one shuffle of the edge frame
joined to the current rank frame (hash on src) plus one aggregation
(hash on dst); ranks are ~|V| rows. Runs at or under the checkpoint
interval stay ONE fused lazy DAG (nothing persisted, nothing leaked);
deeper runs persist edges once and materialize every interval so plan
depth stays bounded. The one driver-side scalar is |V| (a
metastore-grade stat at scale, here a count()).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOTAL_UNITS = 1_000_000_000_000  # 1e12 — fixed-point mass


def _floor_div(c: F.Column, d: int) -> F.Column:
    """Portable exact integer division: FLOOR(double(a)/d) as BIGINT.

    Exact whenever |a| < 2^53 and d is small: the quotient's distance to
    the nearest integer is ≥ 1/d, far above one ulp, so the double
    division cannot round across an integer boundary. Chosen over DIV
    because DuckDB spells that `//` — this form runs verbatim in both
    engines, which the oracle requires.
    """
    return F.floor(c.cast("double") / F.lit(d)).cast("long")


def synthetic_link_graph(docs: DataFrame, n_nodes: int, out_degree: int = 3) -> DataFrame:
    """Deterministic digraph over contiguous doc_ids 0..N-1: src links to
    MOD(src*src + j*13, N) for j in 1..d. Out-degree is exactly d; the
    quadratic scatter makes IN-degree non-uniform (quadratic residues are
    hit repeatedly, non-residues never), so ranks genuinely differentiate
    — a uniform-in-degree map would make PageRank converge to the uniform
    vector and the oracle comparison vacuous. The testdata corpus has no
    link column; this derivation is engine-replayable (pure integer
    expressions, src² ≤ N² stays far under 2^53) while exercising the
    real edge-frame shape: in production the edge frame comes from href
    extraction and everything downstream is unchanged. Hot dst keys (the
    web's power-law reality) are absorbed by map-side partial aggregation
    — the inflow SUM is algebraic, so skew costs no single-reducer
    hotspot."""
    js = F.explode(F.array(*[F.lit(j) for j in range(1, out_degree + 1)])).alias("j")
    return docs.select(F.col("doc_id").alias("src"), js).select(
        "src",
        ((F.col("src") * F.col("src") + F.col("j") * 13) % F.lit(n_nodes)).alias("dst"),
    )



def _edges_cte(out_degree: int) -> str:
    """Shared nn/edges CTE fragment for every oracle over the synthetic
    graph — ONE definition of the edge derivation, kept in lockstep with
    synthetic_link_graph (a drifted copy would silently break Spark/DuckDB
    parity for whichever oracle kept the old formula)."""
    js = " UNION ALL ".join(f"SELECT {j} AS j" for j in range(1, out_degree + 1))
    return (
        "nn AS (SELECT COUNT(*) AS n FROM documents),\n"
        "    edges AS (SELECT doc_id AS src, MOD(doc_id * doc_id + j * 13, nn.n) AS dst"
        f" FROM documents CROSS JOIN nn CROSS JOIN ({js}) js)"
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    out_degree: int,
    iterations: int = 10,
    damping_pct: int = 85,
    checkpoint_interval: int = 10,
) -> DataFrame:
    """Fixed-point power iteration: units'(v) = teleport + floor(d% * inflow / 100)
    where inflow(v) = Σ over in-edges of floor(units(src)/out_degree).

    `nodes` must have a `doc_id` column covering every vertex; vertices
    with no in-edges keep the teleport mass (LEFT join + coalesce), so the
    algorithm is total even when the edge map is not a bijection.
    Returns (doc_id, units BIGINT, rank DOUBLE = units/1e12).
    """
    teleport = math.floor(
        (100 - damping_pct) * TOTAL_UNITS / 100.0 / n_nodes
    )  # same IEEE double path the SQL oracle takes
    deep = iterations > checkpoint_interval
    if deep:
        # only deep runs materialize mid-loop; persist edges so those
        # checkpoint jobs (and the segments after them) reuse one copy
        edges = edges.persist()
    ranks = nodes.select(
        "doc_id", F.lit(TOTAL_UNITS // n_nodes).cast("long").alias("units")
    )
    prev: DataFrame | None = None
    for it in range(1, iterations + 1):
        inflow = (
            edges.join(ranks, edges["src"] == ranks["doc_id"])
            .select("dst", _floor_div(F.col("units"), out_degree).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        nxt = (
            nodes.join(inflow, nodes["doc_id"] == inflow["dst"], "left")
            .select(
                "doc_id",
                (
                    F.lit(teleport).cast("long")
                    + _floor_div(
                        F.lit(damping_pct).cast("long")
                        * F.coalesce(F.col("inflow"), F.lit(0)),
                        100,
                    )
                ).alias("units"),
            )
        )
        # The iteration chain has no intra-chain reuse (each rank frame
        # feeds exactly the next join), so persisting every step buys only
        # lineage truncation at the cost of a blocking job per iteration —
        # measured ~0.5 s/materialization at sf0.1 vs ~1 s for the whole
        # 10-iteration fused DAG. Materialize every `checkpoint_interval`
        # steps instead: the steps in between fuse into one lazy DAG, and
        # long runs still get bounded plan depth (hundreds of fused joins
        # would bloat Catalyst analysis and stack AQE stages).
        if it % checkpoint_interval == 0 and it != iterations:
            # never checkpoint the final iteration: the caller's action is
            # its materialization, and a persist here would outlive the call
            nxt = nxt.persist()
            nxt.count()
            if prev is not None:
                prev.unpersist()
            prev = nxt
        ranks = nxt
    out = ranks.select(
        "doc_id",
        "units",
        (F.col("units").cast("double") / F.lit(float(TOTAL_UNITS))).alias("rank"),
    )
    if deep:
        # deep runs hold persisted frames (edges + the last interval
        # checkpoint); materialize the result as a localCheckpoint — freed
        # with the returned DataFrame by the context cleaner — so both can
        # be released here instead of leaking per call
        out = out.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        edges.unpersist()
    # Shallow runs (iterations <= checkpoint_interval) return the LAZY
    # frame: nothing was persisted, the caller's single action computes the
    # fused chain once, and nothing stays pinned in the cache manager.
    return out


def pagerank_oracle_sql(iterations: int = 10, out_degree: int = 3, damping_pct: int = 85) -> str:
    """ANSI SQL replaying the exact fixed-point schedule for DuckDB (and
    Spark SQL — the text is dialect-portable). Chained CTEs unroll the
    iterations; recursive CTEs cannot aggregate in the recursive member."""
    teleport = f"CAST(FLOOR({(100 - damping_pct) * TOTAL_UNITS / 100:.1f} / nn.n) AS BIGINT)"
    parts = [
        _edges_cte(out_degree),
        (
            f"r0 AS (SELECT doc_id, CAST(FLOOR({float(TOTAL_UNITS)} / nn.n) AS BIGINT)"
            " AS units FROM documents CROSS JOIN nn)"
        ),
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""i{i} AS (
      SELECT e.dst, SUM(CAST(FLOOR(CAST(r.units AS DOUBLE) / {out_degree}) AS BIGINT)) AS inflow
      FROM edges e JOIN r{i - 1} r ON e.src = r.doc_id GROUP BY e.dst),
    r{i} AS (
      SELECT d.doc_id,
             {teleport}
             + CAST(FLOOR({damping_pct}.0 * COALESCE(i.inflow, 0) / 100) AS BIGINT) AS units
      FROM documents d LEFT JOIN i{i} i ON d.doc_id = i.dst CROSS JOIN nn)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT doc_id, units, CAST(units AS DOUBLE) / {float(TOTAL_UNITS)} AS rank
    FROM r{iterations}"""
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any source node, capped at
    `max_depth` — reachability/contamination-radius analysis over a link
    graph (which documents sit within k hops of a known-bad seed set).

    Level-synchronous frontier expansion: each level joins the frontier to
    the edge frame and anti-joins the visited set, the MapReduce-native
    BFS shape. Each level's frontier is consumed TWICE (the visited union
    and the next level's join), so its lineage must be cut with a
    localCheckpoint — an uncut union/anti-join chain doubles the shared
    subtree per level and the plan alone grows 2^depth (observed: depth 6
    OOMs the driver just *printing* the plan). The checkpoint is LAZY:
    plan truncation happens at the call, materialization folds into the
    caller's one action, and the marked RDD computes once for both
    consumers. After the cut, `visited` is a linear union of checkpointed
    leaves. This is the
    standard iterative-Spark discipline (same reason pagerank checkpoints
    every `checkpoint_interval` steps). At 100 TB each level is one
    shuffle join of the frontier (small) against edges partitioned by
    src — broadcast-able frontiers make deep traversals cheap.

    `sources` must be a (doc_id) frame. Returns (doc_id, hops BIGINT).
    """
    frontier = sources.select(
        "doc_id", F.lit(0).cast("long").alias("hops")
    ).localCheckpoint(eager=False)
    visited = frontier
    for depth in range(1, max_depth + 1):
        # Frontier and visited are broadcast: a radius-bounded reach set
        # stays orders of magnitude under the edge frame, so each level is
        # a map-side probe of edges (no edge shuffle) plus one small
        # exchange for the distinct. For unbounded traversals where the
        # reach set outgrows a broadcast, drop the hints — AQE falls back
        # to shuffle joins and the algorithm is unchanged.
        nxt = (
            edges.join(F.broadcast(frontier), edges["src"] == frontier["doc_id"])
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(F.broadcast(visited), "doc_id", "left_anti")
            .select("doc_id", F.lit(depth).cast("long").alias("hops"))
            # lazy: the plan is truncated at the call (killing the 2^depth
            # growth) but materialization folds into the caller's single
            # action — no per-level blocking job; the checkpoint-marked RDD
            # still computes once and is reused by both consumers
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def bfs_oracle_sql(max_depth: int, out_degree: int = 3, source_pred: str = "doc_id < 3") -> str:
    """ANSI recursive-CTE BFS over the same synthetic graph — runs
    verbatim in BOTH engines (Spark 4 supports WITH RECURSIVE), making
    this the registry's first recursive-SQL parity query. The recursion
    enumerates walks (no visited-set dedup — not expressible in the
    recursive member) and the outer MIN collapses them to hop counts;
    the depth cap bounds the 3^d walk fan-out."""
    return f"""
    WITH RECURSIVE {_edges_cte(out_degree)},
    walk(node, dist) AS (
      SELECT doc_id, 0 FROM documents WHERE {source_pred}
      UNION ALL
      SELECT e.dst, w.dist + 1
      FROM edges e JOIN walk w ON e.src = w.node
      WHERE w.dist < {max_depth}
    )
    SELECT node AS doc_id, CAST(MIN(dist) AS BIGINT) AS hops
    FROM walk GROUP BY node"""


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
) -> DataFrame:
    """Deterministic semi-synchronous label propagation (community
    detection): every node starts as its own label; each round it adopts
    the most frequent label among its IN-neighbors, ties broken by the
    smallest label, no in-edges → keep the current label. The mode-vote
    makes this genuinely different from connected components (which
    min-floods regardless of frequency) — LPA communities respect edge
    density, the grouping used for near-dup site clusters and topic
    hubs.

    Determinism: counts and label ids are integers, the (count DESC,
    label ASC) vote is a total order, and the round count is fixed — so
    the unrolled-CTE DuckDB oracle matches exactly, no convergence
    nondeterminism. Each round is one edges⋈labels join + a grouped vote
    + a window argmax + the carry join; the label frame is consumed twice
    per round (vote + carry), so each round ends in a lazy localCheckpoint
    — the BFS discipline, without per-round blocking jobs.
    """
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("lab")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        votes = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy(F.col("dst"), F.col("lab"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("dst").orderBy(F.col("c").desc(), F.col("lab").asc())
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("dst"), F.col("lab").alias("wlab"))
        )
        labels = (
            labels.join(winner, labels["doc_id"] == winner["dst"], "left")
            .select(
                "doc_id",
                F.coalesce(F.col("wlab"), F.col("lab")).alias("lab"),
            )
            .localCheckpoint(eager=False)
        )
    return labels.select("doc_id", F.col("lab").alias("community"))


def lpa_oracle_sql(iterations: int = 4, out_degree: int = 3) -> str:
    """Unrolled-CTE replay of the exact vote schedule, portable to both
    engines (same edge derivation as the pagerank/BFS oracles)."""
    parts = [
        _edges_cte(out_degree),
        "l0 AS (SELECT doc_id AS node, doc_id AS lab FROM documents)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""v{i} AS (
      SELECT e.dst AS node, l.lab, COUNT(*) AS c
      FROM edges e JOIN l{i - 1} l ON e.src = l.node GROUP BY e.dst, l.lab),
    w{i} AS (
      SELECT node, lab,
             row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
      FROM v{i}),
    l{i} AS (
      SELECT p.node, COALESCE(w.lab, p.lab) AS lab
      FROM l{i - 1} p
      LEFT JOIN (SELECT node, lab FROM w{i} WHERE rn = 1) w ON p.node = w.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node AS doc_id, CAST(lab AS BIGINT) AS community
    FROM l{iterations}"""
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Triangle enumeration (motif counting): the directed edge frame is
    symmetrized and canonicalized to a < b undirected edges, then each
    triangle a < b < c is found exactly once by the ordered two-hop join
    e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c). Returns (a, b, c) rows.

    Scale shape: the ordered join is the standard MapReduce triangle
    algorithm — canonical ordering stops each triangle appearing 6×, and
    at web scale the join is driven from the low-degree endpoint so hub
    nodes don't quadratically explode the candidate two-hops (here the
    LEAST/GREATEST canonicalization plus Catalyst's join planning covers
    the testdata scale; degree-ordering is the documented production
    refinement). Triangle density feeds community/quality signals —
    near-dup template farms are triangle-dense, organic link graphs are
    sparse.

    ``und`` feeds all three self-join sides unpinned — MEASURED (sf0.1,
    median-of-3, rebuilt per iteration): persist 0.31/0.47 s vs lazy
    0.27/0.44 s, i.e. the pin only adds materialization cost because the
    narrow derivation is cheaper than writing it to storage. The
    recompute-bug-class rule is measure-first; this is a documented
    no-win case (like unigram_logprob's tok frame). Revisit if the edge
    derivation ever grows an expensive upstream (real link extraction)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )


def triangles_oracle_sql(out_degree: int = 3) -> str:
    """Portable oracle for triangles(): same symmetrize → canonicalize →
    ordered self-join over the shared edges CTE."""
    return f"""
    WITH {_edges_cte(out_degree)},
    und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges WHERE src <> dst)
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM und e1
    JOIN und e2 ON e1.b = e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"""
