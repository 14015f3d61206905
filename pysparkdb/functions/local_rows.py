"""JVM-side assembly of small, bounded, already-materialized row sets.

``spark.createDataFrame(local_rows, schema)`` parallelizes through an RDD
of pickled Python rows, which puts a PythonWorkerFactory dependency (and
its measured 2–7 s pool-restart artifact — the round-14
``ev_interval_overlap`` root cause, BENCH_r14_timeline.json) inside
otherwise JVM-pure plans. The helper here instead emits ONE JVM plan node
— ``spark.range(1).select(inline(array(struct(lit...))))`` — every value a
Catalyst literal, no Python worker, no RDD.

Engine-neutral home (round 15): the helper started life in
``queries/base.py`` for the seven certificate-query reshapes; engine code
(pipeline index builders, snapshot metadata writers) needs the same
primitive without importing from the query registry, so the
implementation lives here and ``queries/base`` re-exports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jvm_rows_df(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """Assemble a small, bounded, already-materialized result entirely
    JVM-side — the sanctioned replacement for ``spark.createDataFrame(
    local_rows, schema)`` for bounded certificate/metadata results.

    Use ONLY for bounded row sets (mode certificates, collected grouped
    summaries with small key cardinality, index metadata). ``rows`` may be
    tuples or ``Row``s; ``ddl`` is the same DDL schema string
    createDataFrame took, and every literal is cast to its declared field
    type so int widths and float/boolean types match the schema exactly.
    An empty ``rows`` yields an empty frame under the same schema.
    """
    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(ddl)
    fields = schema.fields
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in fields]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(tuple(row), fields)
            ]
        )
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
