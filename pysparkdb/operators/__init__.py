from pysparkdb.operators.asof import as_of_join
from pysparkdb.operators.relational import (
    aggregate,
    collate,
    filter_,
    group,
    hash_join,
    limit_sort,
    merge_union,
    nested_loop_join,
    project,
    salted_group,
    salted_join,
    shuffle,
    sort,
    split,
)

__all__ = [
    "aggregate", "as_of_join", "collate", "filter_", "group", "hash_join",
    "limit_sort", "merge_union", "nested_loop_join", "project",
    "salted_group", "salted_join", "shuffle",
    "sort", "split",
]
