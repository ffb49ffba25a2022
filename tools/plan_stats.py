#!/usr/bin/env python
"""Suite-wide physical-plan statistics (r12): compile every registered
query at $SPARK_GRAFT_SF_DIR and count plan features per query —
parquet scans, exchanges (shuffle vs broadcast), Python eval nodes,
sorts/windows, cache reads, plan text size. The §7.2 read-the-plan
pass, mechanized over the whole 178-query surface; outliers (e.g. a
query whose plan re-scans the same table 5×) are the optimization
worklist.

Usage: python tools/plan_stats.py [out.json] [only]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PATTERNS = {
    "scans": r"\bScan parquet\b",
    "cache_reads": r"\bInMemoryTableScan\b",
    "exchanges": r"\bExchange\b(?! hashpartitioning)",  # node lines
    "bcast_exchanges": r"\bBroadcastExchange\b",
    "py_eval": r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|PythonMapInArrow",
    "sorts": r"^\s*[:+\- ]*\+?- Sort\b",
    "windows": r"\bWindow\b",
    "smj": r"\bSortMergeJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bhj": r"\bBroadcastHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_stats.json"
    only = (
        {w.strip() for w in sys.argv[2].split(",") if w.strip()}
        if len(sys.argv) > 2
        else None
    )
    os.environ.setdefault("TZ", "UTC")

    from aw3d30_parquet_spark.session import get_spark

    import __spark_entry__ as contract

    spark = get_spark(app_name="aw3d30-plan-stats")
    qs = contract.queries()
    if only:
        qs = {n: f for n, f in qs.items() if n in only or n[:3] in only}
    stats: dict[str, dict] = {}
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming constructors etc.
            stats[name] = {"error": str(exc)[:120]}
            continue
        # the formatted output repeats node names in the detail section;
        # count only the numbered tree lines "(<n>) <Node>" in details
        # via the tree section: lines before the first "(1) " detail
        tree = plan.split("\n\n", 1)[0]
        row = {k: len(re.findall(p, tree, re.M)) for k, p in PATTERNS.items()}
        row["plan_chars"] = len(plan)
        row["tree_lines"] = tree.count("\n")
        stats[name] = row
    with open(out_path, "w") as fh:
        json.dump(stats, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(stats)} queries)")
    # top offenders inline
    def top(key, n=12):
        rows = sorted(
            ((v.get(key, 0), k) for k, v in stats.items() if "error" not in v),
            reverse=True,
        )[:n]
        return [f"{k}={v}" for v, k in rows if v]

    for key in ("scans", "exchanges", "py_eval", "plan_chars", "cartesian"):
        print(f"{key}: " + ", ".join(top(key)))
    errs = [k for k, v in stats.items() if "error" in v]
    if errs:
        print("errors:", errs)


if __name__ == "__main__":
    main()
