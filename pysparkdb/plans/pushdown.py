"""Scan-pushdown introspection and assertions.

The reference proves its pushdown with scan metrics — bytes read,
selectivity, conversion rates (SHOW_SCAN_METRICS, exec.conf:7-8;
fpdb-main/bench/BytesReadBench.cpp). Spark's equivalent evidence lives in
the physical plan: `PushedFilters: [...]` and `ReadSchema: ...` on the
parquet scan node, and WholeStageCodegen spans for JVM-side expression
evaluation. These helpers extract and assert on that — used in tests the
way the reference's benches assert bytes-read, and available to users to
audit that a query's plan is scan-efficient before running it at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _skip_quoted(text: str, i: int) -> int:
    """If text[i] opens a quoted span (' or \"), return the index just past
    its closing quote (or len(text) if unterminated); else return i.
    Bracket/comma characters inside string literals — e.g.
    ``StringContains(c_comment, 'a]b')`` or In-lists of strings with
    commas — must not participate in balancing or splitting."""
    q = text[i]
    if q not in "'\"":
        return i
    j = i + 1
    while j < len(text) and text[j] != q:
        j += 1
    return min(j + 1, len(text))


def _balanced_body(text: str, start: int) -> str:
    """Content of the bracket group opening at text[start] == '[', scanned
    with bracket/paren balancing — In-list filters like ``In(x, [1, 2])``
    contain nested ``]`` that a non-greedy regex would truncate at.
    Quoted literals are skipped wholesale (see _skip_quoted)."""
    depth = 0
    i = start
    while i < len(text):
        j = _skip_quoted(text, i)
        if j != i:
            i = j
            continue
        c = text[i]
        if c in "[(":
            depth += 1
        elif c in "])":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
        i += 1
    return text[start + 1 :]


def _split_top_level(body: str) -> list[str]:
    """Split on commas not enclosed in brackets/parens/quoted literals."""
    out, depth, cur = [], 0, []
    i = 0
    while i < len(body):
        j = _skip_quoted(body, i)
        if j != i:
            cur.append(body[i:j])
            i = j
            continue
        c = body[i]
        if c in "[(":
            depth += 1
        elif c in "])":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return [p for p in out if p]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters entries)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*(?=\[)", text):
        out.extend(_split_top_level(_balanced_body(text, m.end())))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """TOP-LEVEL column names the scan actually reads (ReadSchema struct
    fields). Angle-bracket-depth aware: nested struct fields
    (``a:struct<b:int,c:int>,d:int``) must not leak inner names or
    swallow trailing top-level columns the way a first-'>' regex did."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema:\s*struct<", text):
        depth, field, i = 1, [], m.end()
        while i < len(text) and depth > 0 and text[i] != "\n":
            ch = text[i]
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
                if depth == 0:
                    break
            if depth == 1 and ch == ",":
                cols.append("".join(field))
                field = []
            elif depth >= 1:
                field.append(ch)
            i += 1
        if field:
            cols.append("".join(field))
    out = []
    for f in cols:
        name = f.split(":", 1)[0].strip()
        if name and not name.startswith("..."):  # explain truncation marker
            out.append(name)
    return out


def codegen_stage_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", explain_str(df)))


def assert_pushdown(
    df: DataFrame,
    expect_filter_cols: list[str] | None = None,
    max_read_columns: int | None = None,
) -> None:
    """Assert filter pushdown / column pruning happened.

    expect_filter_cols: each column must appear in some pushed filter.
    max_read_columns: scan must read at most this many columns in total
    (column-pruning proof — the 2-column-projection-reads-2-columns check).
    """
    if expect_filter_cols is not None:
        pf = " ".join(pushed_filters(df))
        # delimiter-anchored match: a bare substring test would let a
        # filter on `user_id` falsely satisfy an expectation on `id`
        missing = [
            c for c in expect_filter_cols
            if not re.search(rf"[(,\s]{re.escape(c)}[,)\s]", pf)
        ]
        if missing:
            raise AssertionError(
                f"filters on {missing} not pushed to scan; pushed: {pf!r}"
            )
    if max_read_columns is not None:
        cols = read_schema(df)
        if len(cols) > max_read_columns:
            raise AssertionError(
                f"scan reads {len(cols)} columns {cols}, expected ≤ {max_read_columns}"
            )
