"""Relational operator builders — the prephysical operator set, Spark-first.

One function per logical operator the reference's planner accepts
(fpdb-plan/include/fpdb/plan/prephysical/PrePOpType.h: SORT, LIMIT_SORT,
AGGREGATE, GROUP, PROJECT, FILTER, HASH_JOIN, NESTED_LOOP_JOIN,
FILTERABLE_SCAN) plus the physical plumbing ops that have a user-visible
DataFrame meaning (SHUFFLE, SPLIT, MERGE-union, COLLATE;
fpdb-executor/include/fpdb/executor/physical/POpType.h:10-37).

Design stance: each builder is a thin, validated veneer over the DataFrame
API. The point is NOT to re-plan — Catalyst owns partial/final aggregation,
shuffle placement, build-side choice and pushdown — but to expose the
reference's operator vocabulary with its exact semantics (e.g. its join-type
set, its agg-function set) and to document the scale behaviour of each.

All functions are lazy (return DataFrames) and never touch the driver except
``collate``, which is the explicit result-gather boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Join types the reference deserializes (CalcitePlanJsonDeserializer.cpp:
# 771-786: INNER/LEFT/RIGHT/FULL/SEMI) plus Spark-native anti join —
# a deliberate capability superset (SURVEY §7.4).
JOIN_TYPES = ("inner", "left", "right", "full", "left_semi", "left_anti")

# Aggregate functions the reference implements
# (fpdb-executor/src/physical/aggregate/function/{Sum,Count,MinMax,Avg}.cpp)
# plus Spark-native extras the reference lacks (SURVEY §2.5 "not present").
AGG_FUNCTIONS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    # capability superset:
    "count_distinct": lambda c: F.count_distinct(c),
    "stddev": F.stddev,
    "collect_set": F.collect_set,
    "approx_count_distinct": F.approx_count_distinct,
}


def project(df: DataFrame, columns: dict[str, Column | str]) -> DataFrame:
    """PROJECT: evaluate expressions into named output columns.

    Reference: ProjectPOp evaluates Gandiva expression trees and applies
    projectColumnNamePairs renames (project/ProjectPOp.cpp:15-24). Here the
    name→expression mapping is explicit; Catalyst collapses adjacent
    projects (CollapseProject) and prunes unused columns into the scan.
    """
    cols = [
        (F.col(c) if isinstance(c, str) else c).alias(name)
        for name, c in columns.items()
    ]
    return df.select(*cols)


def filter_(df: DataFrame, predicate: Column) -> DataFrame:
    """FILTER: Gandiva-compiled predicate → Catalyst codegen'd predicate
    (filter/FilterPOp.cpp). Filters on scan columns push down to parquet
    (PushedFilters) — the reference's S3-Select pushdown analog.
    """
    return df.filter(predicate)


def hash_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """HASH_JOIN: equi-join on one or more key columns.

    Reference: HashJoinBuildPOp/HashJoinProbePOp with both inputs
    hash-shuffled on the keys (transform/PrePToPTransformer.cpp:708-762);
    small inputs become the build side via Calcite's JoinSmallLeftRule.
    Spark picks broadcast-hash/shuffled-hash/sort-merge itself; pass
    ``broadcast_right=True`` to pin the dimension side, which at 100 TB
    eliminates the shuffle the reference always pays.
    """
    if how not in JOIN_TYPES:
        raise ValueError(f"join type {how!r} not in {JOIN_TYPES}")
    if broadcast_right and how in ("right", "full"):
        # Catalyst cannot build-broadcast the row-preserved side: the hint
        # is silently DROPPED for these join types and the caller pays the
        # full shuffle they believed they had pinned away. Fail loudly
        # instead (broadcast the LEFT side via F.broadcast(left).join(...)
        # if that side is the small one).
        raise ValueError(
            f"broadcast_right is unsatisfiable for how={how!r}: Spark "
            "cannot broadcast the preserved side of a right/full outer join"
        )
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def nested_loop_join(
    left: DataFrame,
    right: DataFrame,
    predicate: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """NESTED_LOOP_JOIN: cartesian product + arbitrary theta predicate.

    Reference: NestedLoopJoinPOp / RecordBatchNestedLoopJoiner.cpp:48-60
    (INNER/LEFT/RIGHT/FULL). Spark plans BroadcastNestedLoopJoin; keep the
    smaller input on the right so it is the broadcast side. At scale a pure
    cross join is O(n·m) — the engine's range/theta queries should carry an
    equi-conjunct whenever one exists so Catalyst can hash-join instead.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"nested-loop join type {how!r} unsupported")
    if predicate is None:
        if how == "inner":
            return left.crossJoin(right)
        # an unconditioned OUTER nested loop is a silent O(n*m) blow-up —
        # almost certainly a forgotten predicate, never a deliberate plan
        # (a deliberate cartesian product is crossJoin/'inner')
        raise ValueError(
            f"nested-loop {how!r} join requires a predicate; "
            "use how='inner' for a deliberate cartesian product"
        )
    return left.join(right, on=predicate, how=how)


def aggregate(df: DataFrame, aggs: dict[str, Column]) -> DataFrame:
    """AGGREGATE: scalar aggregation, no group keys (aggregate/AggregatePOp.cpp).
    Catalyst splits partial/final automatically — the reference's
    computePartial/finalize pair (aggregate/function/AggregateFunction.h:51-65).
    """
    return df.agg(*[c.alias(n) for n, c in aggs.items()])


def group(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """GROUP: group-by aggregation (group/GroupPOp.cpp). Two-phase
    partial→shuffle→final exactly as the reference's USE_TWO_PHASE_GROUP_BY
    path (transform/PrePToPTransformer.cpp:433-582), but chosen by Catalyst.
    """
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def sort(df: DataFrame, keys: Sequence[tuple[str, str]]) -> DataFrame:
    """SORT: multi-key asc/desc ordering (sort/SortPOp.cpp:60-108).

    The reference sorts on a single node (PrePToPTransformer.cpp:176-179);
    Spark range-partitions and merges — a distributed sort that survives
    100 TB inputs.
    """
    for _k, d in keys:
        if d.lower() not in ("asc", "desc"):
            # a typo'd direction must not silently sort ascending
            raise ValueError(f"sort direction must be 'asc' or 'desc', got {d!r}")
    cols = [F.col(k).desc() if d.lower() == "desc" else F.col(k).asc() for k, d in keys]
    return df.orderBy(*cols)


def limit_sort(df: DataFrame, k: int, keys: Sequence[tuple[str, str]]) -> DataFrame:
    """LIMIT_SORT: top-k (limitsort/LimitSortPOp.cpp:66-110, Arrow
    SelectKUnstable). Spark plans TakeOrderedAndProject: per-partition
    top-k then a k-row merge on the driver — no global sort at any scale.
    """
    return sort(df, keys).limit(k)


def merge_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """MERGE (row-wise): union of two same-schema streams — the reference
    merges local-filtered rows with pushdown-produced rows
    (merge/MergePOp.cpp second use, PrePToS3PTransformer.cpp:446-455).
    unionByName keeps it schema-safe. The reference's OTHER merge — the
    column-zip of cached hit columns with scanned miss columns
    (MergeKernel.cpp:122) — is SegmentCacheManager.project_zip
    (pysparkdb/plans/cache.py): cached projection ⋈ miss-column-pruned
    scan on a declared unique key, asserted to re-read only the misses.
    """
    return a.unionByName(b)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Replicated-salt equi-join — the skew escape hatch for joins where
    the small side is too big to broadcast and one join key is hot enough
    that even AQE's skew split leaves a straggler (AQE splits an oversized
    shuffle partition, but every split of a single hot KEY still reads the
    same build rows; replication moves that fan-out to the build side up
    front). The large side gets a uniform salt in [0, B); the small side
    is replicated B ways with every salt value; the join keys become
    (keys..., salt), so the hot key's probe rows spread over B reducers.

    Cost: small side shuffles B× its size — worth it only when a hot key
    dominates. Inner/left only: under replication an unmatched SMALL row
    would surface B times in right/full results.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted join type must be inner/left, got {how!r}")
    if "_salt" in large.columns or "_salt" in small.columns:
        raise ValueError("inputs already carry a _salt column (reserved)")
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    lg = large.withColumn("_salt", salt)
    sm = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return lg.join(sm, [*keys, "_salt"], how).drop("_salt")


def shuffle(df: DataFrame, num_partitions: int, keys: Sequence[str]) -> DataFrame:
    """SHUFFLE: hash-partition on key columns (shuffle/ShufflePOp.cpp).
    Explicit repartition is almost never needed — joins/groups insert their
    own Exchange — but is exposed for co-locating repeated joins on the
    same key (pay one shuffle, reuse the partitioning across stages).
    """
    return df.repartition(num_partitions, *[F.col(c) for c in keys])


def split(df: DataFrame, num_partitions: int) -> DataFrame:
    """SPLIT: round-robin re-balance into n streams (split/SplitPOp.cpp)."""
    return df.repartition(num_partitions)


def collate(df: DataFrame):
    """COLLATE: gather all parallel result streams at the query root
    (collate/CollatePOp.cpp; planted at PrePToPTransformer.cpp:77-83).
    The ONLY driver-side materialization point in the engine.
    """
    return df.collect()


def salted_group(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    partial_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase group-by with key salting — the skew escape hatch.

    A single hot key puts its entire group on one reducer; salting splits
    it ``salt_buckets`` ways: phase 1 groups on (keys..., salt) computing
    ``partial_aggs``, phase 2 re-groups on the true keys combining partials
    with ``aggs``. Decomposable aggregates only (sum/count/min/max; avg =
    sum+count recombined — the reference's AVG_INTERMEDIATE_SUM_/COUNT_
    decomposition, AggregatePrePFunction.h:25-26).

    At 100 TB this is insurance on top of AQE skew-join splitting: AQE
    handles skewed *joins*, but a skewed *aggregation* key still needs the
    salt (or a two-level agg, which this is).
    """
    if "_salt" in df.columns:
        raise ValueError("input already carries a _salt column (reserved)")
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
