"""Inspect Catalyst physical plans so scale properties are testable.

The 100 TB posture (SURVEY §4.2) is a set of *plan shapes*, not hopes:
filters pushed into the Parquet scan, dimension joins broadcast, partial
aggregation before shuffles, top-k as TakeOrderedAndProject, Python kept
out of hot paths. These helpers expose the formatted plan string so
pytest can assert those shapes and fail loudly when a code change
regresses one (e.g. a lost ``broadcast()`` hint silently turning a star
join into a sort-merge shuffle).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` output as a string (no stdout side effect)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def has_node(df: DataFrame, node: str) -> bool:
    return node in formatted_plan(df)


def count_node(df: DataFrame, node: str) -> int:
    """Count distinct plan nodes of a type (formatted explain lists each
    node once in the tree and once in the detail section — count only
    the numbered detail headers, ``(12) BroadcastHashJoin``)."""
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All ``PushedFilters`` entries across the plan's scans, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filter atoms contain no nesting
            # beyond one paren level, so a simple paren counter suffices)
            depth, cur = 0, ""
            for ch in body:
                if ch == "," and depth == 0:
                    out.append(cur.strip())
                    cur = ""
                    continue
                depth += ch == "("
                depth -= ch == ")"
                cur += ch
            if cur.strip():
                out.append(cur.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning witness)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas
