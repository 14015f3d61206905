"""Per-operator runtime metrics — the reference's operator-time / scan-
metrics reporting (SHOW_OP_TIMES / SHOW_SCAN_METRICS, fpdb-main
resources/config/exec.conf:7-8; collected per PhysicalOp and printed after
each query) re-expressed over Spark's own SQL metrics.

Spark already accounts every physical operator (rows produced, scan time,
shuffle bytes, spill, codegen duration); this module walks the EXECUTED
plan — after an action, so AQE's final shape with populated accumulators —
and returns them as plain Python data. That is strictly richer than the
reference's wall-time-per-op table: the same numbers Spark's UI shows,
programmatically, per query, with zero instrumentation cost (the
accumulators exist whether or not anyone reads them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_with_metrics(df: DataFrame) -> tuple[list, list[dict]]:
    """Execute ``df`` (collect) and return (rows, per-operator metrics).

    Each metrics entry is {"node": str, "depth": int, "metrics":
    {name: value}} in pre-order over the executed plan — AQE's FINAL plan,
    not the speculative initial one, because the walk happens after the
    action completes. Metric values are the summed accumulator values
    (Spark's own unit per metric: rows, ns, bytes).
    """
    rows = df.collect()
    jdf = df._jdf
    executed = jdf.queryExecution().executedPlan()

    out: list[dict] = []

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            entry = it.next()
            metric = entry._2()
            metrics[str(entry._1())] = int(metric.value())
        out.append({"node": str(name), "depth": depth, "metrics": metrics})
        # AQE wrappers hide their subtree from children(): descend through
        # the materialized plan instead (AdaptiveSparkPlan → executedPlan,
        # ShuffleQueryStage/ResultQueryStage → plan, ReusedExchange stops)
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth + 1)
            return
        if name.endswith("QueryStage"):
            walk(node.plan(), depth + 1)
            return
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next(), depth + 1)

    walk(executed, 0)
    return rows, out


def format_metrics(ops: list[dict], min_depth: int = 0) -> str:
    """Render the metrics table the way the reference prints op times:
    one line per operator, indented by plan depth, non-zero metrics only."""
    lines = []
    for op in ops:
        if op["depth"] < min_depth:
            continue
        shown = {k: v for k, v in op["metrics"].items() if v}
        metr = ", ".join(f"{k}={v}" for k, v in sorted(shown.items()))
        lines.append(f"{'  ' * op['depth']}{op['node']}: {metr}")
    return "\n".join(lines)
