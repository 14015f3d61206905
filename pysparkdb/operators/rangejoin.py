"""Bucketed range (interval) join — beyond-reference custom operator.

The reference has no range joins (SURVEY §2.4 "not present"); Spark plans a
raw inequality join as BroadcastNestedLoopJoin — O(|L|·|R|) and
broadcast-bound. This operator implements the scalable pattern: quantize
time into buckets the width of the join span, equi-join on (key, bucket)
with the left side probing its own and the next bucket, then apply the
exact interval predicate. Candidate generation is a HASH join — at 100 TB
this is the difference between a shuffle join on (key, bucket) and an
unexecutable cross product; cost is 2× left fan-out, no more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_us: int,
    min_gap_us: int = 0,
) -> DataFrame:
    """Pairs (l, r) with equal ``key`` and
    ``min_gap_us < right_ts - left_ts <= max_gap_us`` (timestamps compared
    at microsecond precision).

    Output: all left columns + all right columns (caller pre-aliases to
    avoid collisions) + ``gap_us``. Bucket width = ``max_gap_us`` so any
    qualifying pair differs by at most one bucket: the left row probes
    buckets {b, b+1} (explode ×2), the right row sits in its own bucket —
    an equi-join Catalyst can hash-partition.

    Preconditions (validated): ``max_gap_us > 0`` (it is the bucket width —
    zero would divide by zero, negative spans are meaningless) and
    ``0 <= min_gap_us < max_gap_us`` — a NEGATIVE min_gap (pairs where the
    right row may precede the left) needs a {b-1, b, b+1} probe set this
    operator does not generate, so such pairs would be SILENTLY missing;
    callers wanting ±gap semantics swap the sides instead. Reserved
    working columns must not collide with caller columns.
    """
    if max_gap_us <= 0:
        raise ValueError(f"max_gap_us must be > 0 (bucket width), got {max_gap_us}")
    if not 0 <= min_gap_us < max_gap_us:
        raise ValueError(
            f"min_gap_us must satisfy 0 <= min_gap_us < max_gap_us "
            f"(negative gaps need a wider probe set; swap sides instead), "
            f"got min_gap_us={min_gap_us}, max_gap_us={max_gap_us}"
        )
    reserved = {"_b", "_le", "_re", "gap_us"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    # cast("timestamp") is a no-op on TIMESTAMP and, under the engine's UTC
    # session timezone, the identity on TIMESTAMP_NTZ wall-clock values —
    # unix_micros itself rejects NTZ input outright.
    l_epoch = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_epoch = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # exact integer FLOOR bucket (not double division: epoch-micros ≈ 1.7e15
    # sits too close to double's 2^53 integer limit for comfort; not bare
    # `div`, which truncates toward zero and misaligns buckets for negative
    # epochs, i.e. pre-1970 timestamps). pmod is non-negative, so
    # (x - pmod(x, w)) is the greatest multiple of w ≤ x — exact floor.
    fdiv = f"(({{0}} - pmod({{0}}, {max_gap_us})) div {max_gap_us})"
    l = left.withColumn("_le", l_epoch).withColumn(
        "_b", F.explode(F.array(
            F.expr(fdiv.format("_le")),
            F.expr(fdiv.format("_le")) + 1,
        ))
    )
    r = right.withColumn("_re", r_epoch).withColumn(
        "_b", F.expr(fdiv.format("_re"))
    )

    gap = F.col("_re") - F.col("_le")
    return (
        l.join(r, on=[key, "_b"])
        .filter((gap > min_gap_us) & (gap <= max_gap_us))
        .withColumn("gap_us", gap)
        .drop("_b", "_le", "_re")
    )
