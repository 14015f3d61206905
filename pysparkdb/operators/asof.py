"""As-of (point-in-time) join — beyond-reference custom operator.

The reference has no range/as-of join (SURVEY §2.4 "not present"); Spark
has no built-in either. This is the standard time-series primitive — each
left row picks the most recent right row at-or-before its timestamp —
implemented as a *composition of existing DataFrame ops* (the preferred
custom-operator strategy): tag both inputs, union, one window pass with
``last(..., ignorenulls)`` carrying the latest right payload forward.

Cost model at 100 TB: ONE hash shuffle on the key + a per-partition sort —
identical to a sort-merge join's exchange, with no row multiplication at
any point (the naive alternative, inequality-join then per-left-row argmax,
materializes |L|×avg-matches intermediates). Skewed keys behave exactly
like a skewed sort-merge join and respond to the same AQE skew handling.

Tie semantics: a right row whose timestamp EQUALS the left timestamp is
visible to it (inclusive, DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
semantics) — the union sorts (ts, marker) with right markers first.
Right-side (key, ts) pairs should be unique (pre-aggregate otherwise);
with duplicates the winner within the tied group is the union's physical
order, i.e. unspecified — same caveat DuckDB documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key (``direction=
    "backward"``, the default) or the smallest ``right_ts`` ≥ ``left_ts``
    (``"forward"`` — the next-event lookup of conversion attribution).
    Left outer either way: unmatched left rows keep null right columns.

    ``tolerance_s`` bounds staleness (pandas merge_asof / feature-store
    semantics): a match farther than ``tolerance_s`` from ``left_ts`` in
    the chosen direction is discarded (inclusive boundary), the left row
    keeping null right columns. The bound is applied AFTER the window
    pass — one post-window column comparison, no change to the
    single-shuffle cost model. Timestamp gaps compare as unix_micros
    BIGINTs — exact integer differences, so the tolerance boundary and
    nearest's gap comparison can never be flipped by a double's ~0.5 µs
    ulp at epoch magnitude; numeric ts columns use the double path.

    Forward is backward time-reversed: the same union-marker/window plan
    with the sort order flipped (right rows still sort before same-ts
    left rows, so an equal-timestamp match stays visible inclusively).
    ``"nearest"`` evaluates both candidates in the SAME pass (two Window
    operators over one exchange — both specs share the key partitioning)
    and keeps the closer one post-tolerance; ties go backward, matching
    the default direction's at-or-before bias.

    Output columns: all of ``left``'s, then all of ``right``'s (callers
    ensure the names don't collide, as with any join followed by select).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    l_struct = T.StructType(left.schema.fields)
    r_struct = T.StructType(right.schema.fields)

    tagged_l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(r_struct).alias("_rrow"),
    )
    # Join semantics: a NULL key (or NULL timestamp) on the right can never
    # be a valid match — but Window.partitionBy groups NULL keys together,
    # which would otherwise let NULL-keyed left rows "match" NULL-keyed
    # right rows. Drop them before the union; NULL-keyed left rows still
    # pass through (left-outer) and find no right payload in their
    # partition, yielding the correct null columns.
    tagged_r = right.filter(
        F.col(right_on).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_struct).alias("_lrow"),
        F.struct(*right.columns).alias("_rrow"),
    )

    # (ts, marker) order puts a right row before left rows at the same ts
    # → inclusive as-of. last(ignorenulls) carries the nearest right
    # payload through each key partition: ascending ts for the backward
    # candidate (newest past row), descending for the forward one
    # (nearest future row). Both window specs share the key partitioning,
    # so even when `nearest` evaluates both, Catalyst plans ONE exchange
    # (two Window operators, two sorts, zero extra shuffles — never a
    # self-join, which would multiply duplicate left rows).
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_l.unionByName(tagged_r)
    if direction != "forward":
        unioned = unioned.withColumn(
            "_mb", F.last("_rrow", ignorenulls=True).over(w_back)
        )
    if direction != "backward":
        unioned = unioned.withColumn(
            "_mf", F.last("_rrow", ignorenulls=True).over(w_fwd)
        )
    out = unioned.filter(F.col("_is_left") == 1)

    # Gap arithmetic must be EXACT: double epoch-seconds carry a ~0.5 µs
    # ulp at current epoch magnitudes, enough to misorder near-tied
    # past/future candidates in `nearest` (or flip an inclusive tolerance
    # boundary) relative to an integer-microsecond oracle. Timestamps
    # therefore compare as unix_micros BIGINTs (exact integer differences);
    # numeric ts columns keep the double path (test keys are small longs,
    # exact in a double).
    # TIMESTAMP_NTZ counts as a timestamp here: unix_micros rejects NTZ
    # input directly, but under the engine's UTC session timezone the
    # cast to TIMESTAMP is the identity on its wall-clock value — while
    # the numeric fallback (cast to double) is an illegal cast for NTZ
    # and would crash outright. DATE likewise: it casts to the midnight
    # timestamp (exact), where the numeric branch's cast('double') is
    # illegal — without this, a DATE as-of worked until the caller added
    # tolerance_s or direction='nearest' (which reference ep()) and then
    # crashed at analysis.
    is_ts = isinstance(
        unioned.schema["_t"].dataType,
        (T.TimestampType, T.TimestampNTZType, T.DateType),
    )

    def ep(c):
        return F.unix_micros(c.cast("timestamp")) if is_ts else c.cast("double")

    # round(), not int(): truncation would turn a fractional tolerance
    # like 2.3 s into 2_299_999 µs and exclude an exactly-at-tolerance
    # match, violating the documented inclusive boundary.
    tol = None if tolerance_s is None else (
        round(tolerance_s * 1_000_000) if is_ts else float(tolerance_s)
    )
    lt = ep(F.col("_t"))
    # A NULL left timestamp precedes/follows nothing — no direction may
    # match it. Backward gets this for free (NULLS FIRST puts the row
    # before every right row); forward's descending sort puts NULLs last,
    # where the carry would hand them the MINIMUM-ts right row, so the
    # guard must be explicit.
    has_t = F.col("_t").isNotNull()

    def _bounded(col, gap):
        if tol is None:
            return col
        return F.when(gap <= F.lit(tol), col)

    if direction == "backward":
        match = _bounded(F.col("_mb"), lt - ep(F.col("_mb")[right_ts]))
    elif direction == "forward":
        match = _bounded(F.col("_mf"), ep(F.col("_mf")[right_ts]) - lt)
    else:  # nearest: the closer bounded candidate; ties → backward
        mb = _bounded(F.col("_mb"), lt - ep(F.col("_mb")[right_ts]))
        mf = _bounded(F.col("_mf"), ep(F.col("_mf")[right_ts]) - lt)
        bgap = lt - ep(mb[right_ts])
        fgap = ep(mf[right_ts]) - lt
        match = (
            F.when(mb.isNotNull() & (mf.isNull() | (bgap <= fgap)), mb)
            .otherwise(mf)
        )
    return out.withColumn(
        "_match", F.when(has_t, match)
    ).select("_lrow.*", "_match.*")
