"""Predicate transfer — pre-filtering every table across the join graph.

Re-expression of the reference's CIDR-2024 predicate-transfer mode
(/root/reference/fpdb-executor/src/physical/transform/pred-trans/
PrePToPTransformerForPredTrans.cpp:48-78): before running a multi-join plan,
phase 1 transfers join-key filters between tables — a forward pass in
small-to-large order, then a backward pass — so every table is reduced to
(a superset of) the rows that survive the full join; phase 2 runs the
original plan over the reduced tables. Transfer order mirrors
SmallToLargePredTransOrder.cpp; the join graph comes from explicit edges
(the reference extracts them with fpdb-plan/src/prephysical/
JoinOriginTracer.cpp).

Spark-first design:
- Each transfer step is a LEFT SEMI join against the DISTINCT keys of the
  (already-reduced) neighbor — the exact-filter equivalent of the
  reference's bloom-filter transfer (BloomFilterCreatePOp/BloomFilterUsePOp,
  SURVEY §2.9). Key sets of dimension tables are broadcast, so a transfer
  costs a broadcast-hash semi join, not a shuffle.
- Per-join *runtime* bloom filters remain Catalyst's job
  (spark.sql.optimizer.runtime.bloomFilter.enabled, on by default in
  pysparkdb.session) — this pass adds the multi-hop, whole-graph reduction
  Catalyst cannot derive.
- Correctness invariant: the pass is pure pre-filtering — semi joins never
  add or duplicate rows — so plan(reduced) ≡ plan(original) for any plan
  whose joins are the graph's edges (property-tested in
  tests/test_predicate_transfer.py).

At 100 TB: each pass step is one broadcast semi join per edge; the win is
that the big fact table is reduced *before* its expensive shuffle join, by
filters implied two or more hops away (e.g. region name → nation keys →
supplier keys → lineitem rows) — precisely the queries (TPC-H Q5/Q8/Q9
shapes) where the paper reports its gains.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JoinEdge:
    """One equi-join edge of the join graph: left.keys == right.keys."""

    left: str
    left_keys: tuple[str, ...]
    right: str
    right_keys: tuple[str, ...]


def _semi_reduce(
    target: DataFrame, target_keys: tuple[str, ...],
    source: DataFrame, source_keys: tuple[str, ...],
    broadcast_keys: bool,
) -> DataFrame:
    """target ⋉ source on the edge keys (the bloom-filter-use analog)."""
    keys = source.select(
        *[F.col(s).alias(t) for s, t in zip(source_keys, target_keys)]
    ).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    return target.join(keys, on=list(target_keys), how="left_semi")


def predicate_transfer(
    tables: dict[str, DataFrame],
    edges: list[JoinEdge],
    sizes: dict[str, int] | None = None,
    broadcast_threshold_rows: int = 10_000_000,
) -> dict[str, DataFrame]:
    """Reduce every table by transferring join-key sets across ``edges``.

    ``sizes``: estimated row counts per table (catalog stats in production —
    the reference reads stats.json; defaults to a one-time count here).
    Returns a new {name: reduced DataFrame} mapping; inputs are untouched.
    """
    if sizes is None:
        sizes = {name: df.count() for name, df in tables.items()}

    reduced = dict(tables)

    # Small-to-large: process edges ordered by the max size of their
    # endpoints, so small dims reduce mid-size tables before those reduce
    # the fact table (SmallToLargePredTransOrder.cpp's ordering intent).
    fwd = sorted(edges, key=lambda e: max(sizes[e.left], sizes[e.right]))

    def transfer(edge: JoinEdge, direction_fwd: bool) -> None:
        l_small = sizes[edge.left] <= sizes[edge.right]
        if direction_fwd:
            # reduce the larger side with the smaller side's keys
            src, sk, dst, dk = (
                (edge.left, edge.left_keys, edge.right, edge.right_keys)
                if l_small
                else (edge.right, edge.right_keys, edge.left, edge.left_keys)
            )
        else:
            # backward: push reductions back into the smaller side
            src, sk, dst, dk = (
                (edge.right, edge.right_keys, edge.left, edge.left_keys)
                if l_small
                else (edge.left, edge.left_keys, edge.right, edge.right_keys)
            )
        reduced[dst] = _semi_reduce(
            reduced[dst], dk, reduced[src], sk,
            broadcast_keys=sizes[src] <= broadcast_threshold_rows,
        )

    for e in fwd:  # forward pass: small → large
        transfer(e, True)
    for e in reversed(fwd):  # backward pass: large → small
        transfer(e, False)
    return reduced


# The TPC-H-shape join graph of the driver's star schema, usable directly
# with pysparkdb.queries.base.tables(...).
STAR_SCHEMA_EDGES: list[JoinEdge] = [
    JoinEdge("region", ("r_regionkey",), "nation", ("n_regionkey",)),
    JoinEdge("nation", ("n_nationkey",), "customer", ("c_nationkey",)),
    JoinEdge("nation", ("n_nationkey",), "supplier", ("s_nationkey",)),
    JoinEdge("customer", ("c_custkey",), "orders", ("o_custkey",)),
    JoinEdge("orders", ("o_orderkey",), "lineitem", ("l_orderkey",)),
    JoinEdge("supplier", ("s_suppkey",), "lineitem", ("l_suppkey",)),
    JoinEdge("part", ("p_partkey",), "lineitem", ("l_partkey",)),
]
