from pysparkdb.plans.cache import SegmentCacheManager
from pysparkdb.plans.predicate_transfer import (
    JoinEdge,
    extract_join_edges,
    predicate_transfer,
)
from pysparkdb.plans.pushdown import assert_pushdown, explain_str, pushed_filters, read_schema

__all__ = [
    "JoinEdge", "SegmentCacheManager", "assert_pushdown", "explain_str",
    "extract_join_edges",
    "predicate_transfer", "pushed_filters", "read_schema",
]
