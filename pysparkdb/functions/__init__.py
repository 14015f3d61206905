from pysparkdb.functions.expressions import (
    add,
    and_,
    case_when,
    cast_to,
    date_add_interval,
    date_extract,
    divide,
    eq,
    gt,
    gte,
    in_,
    is_null,
    like,
    lt,
    lte,
    multiply,
    neq,
    not_,
    or_,
    substr,
    subtract,
)

__all__ = [
    "add", "and_", "case_when", "cast_to", "date_add_interval", "date_extract",
    "divide", "eq", "gt", "gte", "in_", "is_null", "like", "lt", "lte",
    "multiply", "neq", "not_", "or_", "substr", "subtract",
]
