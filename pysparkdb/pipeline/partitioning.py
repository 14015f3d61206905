"""Shared partitioning helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism.

    A single parquet file scans as ONE partition, which serializes all
    per-row compute downstream of it (shingle/hash explosion in dedup, the
    stream side of a broadcast join's O(n·q) dot products in similarity)
    onto one core; one cheap shuffle of the narrow input buys full
    parallelism. At 100 TB the input is already thousands of splits and
    this rebalance is noise.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n)
