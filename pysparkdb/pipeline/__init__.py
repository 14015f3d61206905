"""LLM-data-pipeline operators — beyond-reference scope (SURVEY §7.2 M4).

The reference engine is strictly batch MPP SQL (SURVEY §2.10); these modules
add the data-processing surface a 100 TB training-data pipeline needs —
deduplication, similarity search, text analysis, multimodal columns — built
on pyspark.sql.functions (JVM/codegen) wherever possible, Arrow-batched
pandas UDFs where not, never row-at-a-time Python.
"""

from pysparkdb.pipeline import (  # noqa: F401
    cluster,
    dedup,
    graph,
    multimodal,
    similarity,
    text,
)
