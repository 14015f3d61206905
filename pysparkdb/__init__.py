"""pysparkdb — a PySpark-native OLAP engine with FlexPushdownDB's capabilities.

A brand-new engine (NOT a port) re-expressing the query and data-processing
surface of cloud-olap/FlexPushdownDB-old on Spark SQL / DataFrame / Catalyst:

- declared-schema catalog over Parquet/CSV object storage
  (reference: fpdb-catalogue, resources/metadata/*/schema.json)
- full relational operator set: filterable scans with pushdown, project,
  filter, hash/nested-loop joins (inner/left/right/full/semi/anti),
  scalar + group-by aggregation, sort, top-k
  (reference: fpdb-executor/include/fpdb/executor/physical/POpType.h:10-37)
- Gandiva-class scalar expression surface
  (reference: fpdb-expression-gandiva, ExpressionType.h)
- bloom-filter join reduction + CIDR-2024 predicate transfer as a
  DataFrame-level pre-pass
  (reference: fpdb-executor/src/physical/bloomfilter/*,
   fpdb-executor/src/physical/transform/pred-trans/*)
- segment-cache-inspired projection cache manager
  (reference: fpdb-cache/include/fpdb/cache/policy/CachingPolicy.h)
- beyond-reference: LLM-data-pipeline operators (dedup, similarity search,
  multimodal columns, text analysis) and a Structured Streaming surface,
  designed for 100 TB scale.
"""

from pysparkdb.engine import Engine
from pysparkdb.pins import release_persisted
from pysparkdb.session import get_spark

__all__ = ["Engine", "get_spark", "release_persisted"]
__version__ = "0.1.0"
