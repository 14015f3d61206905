"""Tuned SparkSession factory.

The reference engine's execution knobs (parallel degree, pushdown mode, bloom
filters — /root/reference/resources/config/exec.conf,
fpdb-executor/include/fpdb/executor/physical/Globals.h) map onto Spark SQL
configuration. These defaults are chosen for correctness at small scale factors
AND sane behaviour at 100 TB on a real cluster:

- AQE on: runtime re-planning (coalesce shuffle partitions, skew-join split,
  dynamic join strategy) replaces the reference's static parallelDegree
  planning (PrePToPTransformer.cpp:708-762).
- runtime bloom-filter join: Catalyst's per-join equivalent of the reference's
  BloomFilterCreate/UsePOp pair (fpdb-executor/src/physical/bloomfilter/*).
- parquet filter/aggregate pushdown + vectorized reader: the PUSHDOWN_ONLY
  scan mode (fpdb-plan/include/fpdb/plan/Mode.h:13-18) — Spark pushes
  filters/column-pruning/min-max-agg into the scan natively.
- session timezone UTC: deterministic timestamp semantics vs the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; on a real cluster the same
# settings scale because AQE coalesces/extends shuffle parallelism at runtime.
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Driver testdata stores timestamps as parquet TIMESTAMP(NANOS), which
    # Spark's reader rejects; read them as epoch-nanos longs and convert in
    # the catalog layer (pysparkdb.catalog resolves long→timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Scan pushdown (reference Mode::PUSHDOWN_ONLY analog).
    "spark.sql.parquet.filterPushdown": "true",
    # NOTE: aggregatePushDown only applies on the DSv2 read path and is
    # measured inert on this build even there (PushedAggregation stays
    # empty); kept on as harmless forward-compat. Footer min/max stats ARE
    # exploited — via filter pushdown's row-group skipping and explicitly
    # through catalog.zone_map / prunable_row_groups.
    "spark.sql.parquet.aggregatePushDown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Per-join runtime bloom filter (reference BloomFilterCreate/UsePOp).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    # Arrow transfer for the pandas-UDF (LLM-pipeline) operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # CBO so join reordering has stats when tables are ANALYZEd
    # (reference: Calcite LoptOptimizeJoinRule, Optimizer.java:156-175).
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
}


def get_spark(
    app_name: str = "pysparkdb",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**DEFAULT_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-created session.

    The driver hands us a bare SparkSession; static confs (master, memory)
    are out of our control but all SQL confs above are runtime-settable.
    """
    from pyspark.errors import AnalysisException

    for k, v in DEFAULT_CONFS.items():
        try:
            spark.conf.set(k, v)
        except AnalysisException as e:
            # only the static-conf-on-running-session case is benign
            # (CANNOT_MODIFY_CONFIG); a genuinely invalid value must not
            # be silently dropped — correctness notes (UTC timezone, nanos
            # handling) depend on these confs landing
            if "CANNOT_MODIFY_CONFIG" not in str(e) and "Cannot modify" not in str(e):
                raise
    return spark
