"""Scalar expression surface — Gandiva-parity, Catalyst-executed.

The reference compiles expression trees to LLVM via Arrow Gandiva
(fpdb-expression-gandiva/include/fpdb/expression/gandiva/ExpressionType.h;
the accepted Calcite ops are enumerated in
fpdb-plan/src/calcite/CalcitePlanJsonDeserializer.cpp:153-382). Spark's
Catalyst + whole-stage codegen plays Gandiva's role; these helpers exist to
make the capability inventory explicit and named 1:1 with the reference's
expression nodes. Everything stays JVM-side — no Python UDFs.

Coverage (reference node → helper):
  And/Or/Not (n-ary)           → and_ / or_ / not_
  Add/Subtract/Multiply/Divide → add / subtract / multiply / divide
  Eq/NotEq/Lt/Lte/Gt/Gte       → eq / neq / lt / lte / gt / gte
  Like (Like.cpp:40)           → like
  In (deser :239-267)          → in_
  If from CASE (deser :268-274)→ case_when
  IsNull (deser :304-311)      → is_null
  Substr (Substr.h)            → substr
  DateExtract (DateExtract.cpp:16-24) → date_extract
  DateAdd (DateAdd.cpp:25-31, DateIntervalType.h:13-17) → date_add_interval
  Cast (Cast.cpp, castDATE :149) → cast_to
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    """Left-operand coercion: bare strings are COLUMN NAMES."""
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def _v(x) -> Column:
    """Right-operand coercion: bare strings are LITERAL VALUES (matches the
    reference's canonicalizer putting the column left of the literal,
    gandiva/Canonicalizer.h). Pass F.col(...) to compare two columns."""
    return x if isinstance(x, Column) else F.lit(x)


def and_(*preds: Column) -> Column:
    """N-ary AND (reference And is n-ary, gandiva/And.h)."""
    return functools.reduce(operator.and_, preds)


def or_(*preds: Column) -> Column:
    return functools.reduce(operator.or_, preds)


def not_(p: Column) -> Column:
    return ~p


def eq(a, b) -> Column:
    return _c(a) == _v(b)


def neq(a, b) -> Column:
    return _c(a) != _v(b)


def lt(a, b) -> Column:
    return _c(a) < _v(b)


def lte(a, b) -> Column:
    return _c(a) <= _v(b)


def gt(a, b) -> Column:
    return _c(a) > _v(b)


def gte(a, b) -> Column:
    return _c(a) >= _v(b)


def add(a, b) -> Column:
    return _c(a) + _v(b)


def subtract(a, b) -> Column:
    return _c(a) - _v(b)


def multiply(a, b) -> Column:
    return _c(a) * _v(b)


def divide(a, b) -> Column:
    return _c(a) / _v(b)


def like(col, pattern: str) -> Column:
    """SQL LIKE with %/_ wildcards (reference Gandiva `like`)."""
    return _c(col).like(pattern)


def in_(col, values: Sequence) -> Column:
    """IN-list membership. The reference expands IN to OR-of-equals over the
    literal set (CalcitePlanJsonDeserializer.cpp:239-267); Catalyst keeps it
    as an In/InSet predicate, which additionally pushes to parquet scans."""
    return _c(col).isin(*values)


def case_when(*branches: tuple[Column, Column | object], default=None) -> Column:
    """CASE WHEN c1 THEN v1 [WHEN c2 THEN v2 ...] ELSE default END.

    THEN/ELSE are VALUE positions: bare strings are literals (`_v`, like
    every other value position in this module — a bare-string column-name
    coercion here was a footgun that either threw UNRESOLVED_COLUMN or
    silently read a same-named column); pass F.col(...) to emit a column.
    """
    (c0, v0), *rest = branches
    expr = F.when(c0, _v(v0))
    for c, v in rest:
        expr = expr.when(c, _v(v))
    return expr.otherwise(_v(default)) if default is not None else expr


def is_null(col) -> Column:
    """IS NULL. (The reference has no IS NOT NULL node — it wraps Not
    around IsNull; use not_(is_null(c)).)"""
    return _c(col).isNull()


def substr(col, pos: int, length: int) -> Column:
    """SUBSTRING, 1-based like SQL (reference Substr.h)."""
    return F.substring(_c(col), pos, length)


def date_extract(col, unit: str) -> Column:
    """EXTRACT(YEAR|MONTH|DAY FROM ts) → BIGINT, matching the reference's
    int64 result (DateExtract.cpp:16-24) and DuckDB's EXTRACT type."""
    u = unit.upper()
    fns = {"YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth}
    if u not in fns:
        raise ValueError(f"unit {unit!r} not in {sorted(fns)} (reference supports these three)")
    return fns[u](_c(col)).cast("long")


def date_add_interval(col, n: int, unit: str) -> Column:
    """date ± INTERVAL n DAY|MONTH|YEAR (reference DateAdd.cpp:25-31;
    units DateIntervalType.h:13-17). Negative n subtracts."""
    u = unit.upper()
    if u not in ("DAY", "MONTH", "YEAR"):
        raise ValueError(f"unit {unit!r} not in DAY/MONTH/YEAR")
    return _c(col) + F.expr(f"INTERVAL {int(n)} {u}")


def cast_to(col, dtype: str) -> Column:
    """CAST to the reference's six-type system (int/long/double/string/
    boolean/date→timestamp) or any Spark type name (Cast.cpp)."""
    return _c(col).cast(dtype)
