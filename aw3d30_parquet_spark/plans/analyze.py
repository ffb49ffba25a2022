"""EXPLAIN ANALYZE for the engine: execute a query, then render its
FINAL physical plan (post-AQE) with each operator's ACTUAL runtime
metrics — output rows, scan/agg time, shuffle bytes, peak memory.

The reference's observability is per-operator tracing spans
(``src/main.rs:135,163,229-231``); Spark already meters every physical
operator (SQLMetrics), this module just surfaces them without the UI
(disabled here) — the numbers come from the executed plan itself, so
they reflect what actually ran, including AQE's runtime re-planning
(coalesced partitions, switched join strategies, skew splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: metric keys worth showing, in display order (everything else is
#: noise at a glance; the full set remains in the Spark event log)
_KEY_METRICS = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "scanTime",
    "aggTime",
    "sortTime",
    "collectTime",
    "buildTime",
    "shuffleRecordsWritten",
    "shuffleBytesWritten",
    "recordsRead",
    "spillSize",
    "peakMemory",
    "numPartitions",
    "numCoalescedPartitions",
    "numSkewedPartitions",
    "pythonNumRowsReceived",
    "pythonDataSent",
)


def _node_metrics(node) -> list[str]:
    vals = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        metric = kv._2()
        if metric.value() > 0:
            vals[kv._1()] = metric.value()
    out = [f"{k}={vals[k]:,}" for k in _KEY_METRICS if k in vals]
    return out


def _walk(node, depth: int, lines: list[str], resolve_final: bool = True) -> None:
    name = node.nodeName()
    if name == "AdaptiveSparkPlan" and resolve_final:
        # render the FINAL plan AQE actually executed. Only after an
        # execution: finalPhysicalPlan() on a cold plan would itself
        # materialize every intermediate stage to finish planning.
        node = node.finalPhysicalPlan()
        name = node.nodeName()
    mets = _node_metrics(node)
    lines.append("  " * depth + name + (f"  [{', '.join(mets)}]" if mets else ""))
    ch = node.children().iterator()
    while ch.hasNext():
        _walk(ch.next(), depth + 1, lines, resolve_final)
    # QueryStage nodes hold their materialized subtree in .plan()
    if name.endswith("QueryStage"):
        _walk(node.plan(), depth + 1, lines, resolve_final)


def analyze(df: DataFrame, materialize: bool = True) -> str:
    """Execute ``df`` and return ITS executed plan annotated with the
    metrics of that same execution.

    The execution drives ``df``'s own QueryExecution JVM-side
    (``executedPlan().execute().count()`` — one job, no rows fetched
    to Python): a write/collect on the DataFrame would run under a
    DIFFERENT QueryExecution, leaving this plan's metrics empty and
    re-materializing every stage a second time when walked.

    ``materialize=False`` renders the UNEXECUTED plan (the
    AdaptiveSparkPlan before stage resolution, no metrics) and runs
    NOTHING — resolving AQE's final plan on a cold query would itself
    materialize every intermediate stage, silently executing most of
    the job the flag promised to skip."""
    qe = df._jdf.queryExecution()
    if materialize:
        qe.executedPlan().execute().count()
    lines: list[str] = []
    _walk(qe.executedPlan(), 0, lines, resolve_final=materialize)
    return "\n".join(lines)
