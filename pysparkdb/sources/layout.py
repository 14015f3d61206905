"""Multi-dimensional data-clustering layout (Z-order) for scan pruning.

The reference prunes partitions with zone maps it builds at catalog time
(fpdb-catalogue .../ObjStoreCatalogueEntryReader.cpp:318-333, applied by
PartitionPruner.cpp:23-52) — but zone maps only skip row groups when the
LAYOUT clusters the filtered column. A single-column sort buys pruning on
that one column and destroys it for every other; interleaving the bits of
several columns (a Morton/Z-order curve — the public technique behind
Delta Lake's OPTIMIZE ZORDER and many lakehouse compactors) keeps every
participating column's values locally clustered, so a range predicate on
ANY of them skips most row groups off the same parquet footer stats.

Write-time cost at 100 TB: one tiny min/max aggregate per column, a
range-repartition on the z-value (Spark samples to pick boundaries — one
extra pass, standard for layout jobs), and a per-partition sort. No
driver-side data movement beyond the min/max row; the curve value is pure
column bit-arithmetic inside codegen. The cost is paid once and amortized
over every subsequent selective scan — the same economics as
write_bucketed's shuffle-once argument, applied to range predicates
instead of join keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-scale a numeric column to an integer in [0, 2^bits).

    Linear scaling (not rank): no global sort per column, one broadcast
    min/max row instead. Heavily skewed columns cluster less evenly than
    a rank transform would — acceptable for a layout heuristic, and the
    degenerate all-one-value column (hi == lo) maps to 0 everywhere.
    """
    top = (1 << bits) - 1
    span = hi - lo
    frac = F.when(span > 0, (col.cast("double") - lo) / span).otherwise(F.lit(0.0))
    # NULL cells sort first (cell 0) rather than poisoning the Morton code
    return F.least(F.floor(F.coalesce(frac, F.lit(0.0)) * top), F.lit(top)).cast("long")


def zorder_key(scaled: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each scaled column into one
    Morton code: output bit (i * n_cols + j) = bit i of column j. Static
    bitwise expression chain — stays in whole-stage codegen, no UDF."""
    n = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def zorder_df(
    df: DataFrame, cols: list[str], bits: int = 12, n_partitions: int | None = None
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-order curve of ``cols``:
    range-partitioned and sorted within partitions by the Morton code of
    the min/max-scaled columns. The curve column is internal and dropped.

    ``bits`` per column must satisfy bits * len(cols) <= 62 (one signed
    long); 12 bits ≅ 4096 cells per dimension, plenty for row-group-sized
    clustering. Numeric columns only — cast dates to days first.
    """
    if not cols or bits * len(cols) > 62:
        raise ValueError(f"need 1+ cols with bits*len(cols) <= 62, got {cols} @ {bits}")
    # The internal working columns must not collide with user data: a user
    # column literally named '_z' would be silently REPLACED and dropped,
    # and a '_lo_<c>'/'_hi_<c>' clash makes the crossJoin ambiguous. Same
    # reserved-name contract as the '_salt' guard in the salted operators.
    reserved = {"_z"} | {f"_lo_{c}" for c in cols} | {f"_hi_{c}" for c in cols}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with zorder_df's internal "
            "working columns — rename them before re-laying out"
        )
    # one tiny aggregate row; broadcast-joined into the scan (no collect)
    mm = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    )
    with_mm = df.crossJoin(F.broadcast(mm))
    scaled = [
        _scaled(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    keyed = with_mm.withColumn("_z", zorder_key(scaled, bits)).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )
    if n_partitions is not None and n_partitions < 1:
        raise ValueError(f"n_partitions must be >= 1, got {n_partitions}")
    n_parts = (
        n_partitions
        if n_partitions is not None
        else int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    return (
        keyed.repartitionByRange(n_parts, "_z").sortWithinPartitions("_z").drop("_z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    mode: str = "overwrite",
    row_group_bytes: int | None = None,
) -> None:
    """Parquet sink with Z-order clustering on ``cols`` — after this
    write, ``catalog.prunable_row_groups(part, c, lo, hi)`` keeps only a
    thin band of row groups for a range predicate on ANY of ``cols``
    (asserted against the unclustered layout in tests/test_sources.py).

    ``row_group_bytes`` shrinks parquet row groups (parquet.block.size)
    so zone maps are finer-grained; leave None for the 128 MB default at
    production scale.
    """
    w = zorder_df(df, cols, bits).write.mode(mode)
    if row_group_bytes is not None:
        w = w.option("parquet.block.size", str(row_group_bytes))
    w.parquet(path)


def write_range_partitioned(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Globally-ordered parquet export: repartitionByRange on ``cols``
    (sampled range boundaries — one pass, every partition gets a disjoint
    key range) + sortWithinPartitions, so the output files hold
    NON-OVERLAPPING sorted ranges. That is the distributed form of a
    global sort — the TeraSort shape: no single node ever holds more than
    one partition's rows, yet reading files in range order yields the
    totally-ordered dataset, and downstream consumers get:

    - merge-scan joins/merges without re-sorting (each file is a sorted
      run; k-way merge is streaming);
    - file-LEVEL pruning for range predicates (zone maps are tight per
      file, not just per row group — a BETWEEN touches the few files
      whose range intersects, asserted in tests);
    - sorted sharded export for training-data delivery (shard n of m is
      a key range, not a random slice).

    Contrast with write_zordered: Z-order interleaves several columns'
    orders for multi-dimension pruning; range partitioning gives ONE
    total order with disjoint files — pick per consumer. ``num_files``
    defaults to the session's shuffle parallelism."""
    if num_files is not None and num_files < 1:
        # an underflowed dynamic computation must not silently fall back
        # to the session default (the zorder_df validation convention)
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    n = num_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_file_bytes: int = 128 << 20,
    sort_within: list[str] | None = None,
) -> int:
    """Small-file compaction — the maintenance pass every long-lived
    100 TB table needs. Streaming sinks and incremental loads leave
    thousands of KB-sized part files; each costs a task, a footer read,
    and an object-store request per scan. Compaction rewrites the table
    into ceil(total_bytes / target_file_bytes) files (one shuffle-free
    coalesce when shrinking; a round-robin repartition only when the
    input has FEWER partitions than the target, where coalesce could not
    grow them). ``sort_within`` optionally re-sorts rows inside each
    output file so zone maps stay tight after the rewrite (pair with
    write_zordered for full re-clustering instead).

    Sizing reads actual on-disk bytes from the source files via the
    Hadoop FileSystem API — so any URI Spark itself can read (local,
    ``s3a://``, ``hdfs://``) sizes correctly, not just local paths.
    Returns the output file count.
    NOTE: a hive-partitioned source is read with its partition columns
    inlined and rewritten FLAT — compact a partitioned table per
    partition directory if the layout must survive.
    """
    import math

    total, _ = _fs_parquet_stats(spark, src)
    if total == 0:
        raise ValueError(f"no parquet bytes found under {src!r}")
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    parts = df.rdd.getNumPartitions()
    out = df.coalesce(n_out) if parts >= n_out else df.repartition(n_out)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").parquet(dest)
    return _fs_parquet_stats(spark, dest)[1]


def _fs_parquet_stats(spark, path: str) -> tuple[int, int]:
    """(total_bytes, file_count) of the *.parquet files under ``path``
    (recursive — hive-partitioned tables nest part files under key=dirs),
    through the Hadoop FileSystem resolved from the path's own scheme, so
    object-store URIs work exactly like local directories. A single-file
    path counts itself. Missing paths are (0, 0) — the caller decides
    whether that is an error."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return 0, 0
    total = count = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
            count += 1
    return total, count
