#!/usr/bin/env python
"""Capture .explain("formatted") for queries into plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/capture_plans.py r12 before l01,p13,t06
    python tools/capture_plans.py r12 after l01_pagerank_fixed

Full names or 3-char codes. Plans are captured at $SPARK_GRAFT_SF_DIR
(default sf0.1) on the engine's own session, exactly the bench's
environment. Explain compiles but does not execute the query (memoized
gate scalars inside query constructors may still run their one bounded
job, as in any compile).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = {w.strip() for w in sys.argv[3].split(",") if w.strip()}
    os.environ.setdefault("TZ", "UTC")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from aw3d30_parquet_spark.session import get_spark

    import __spark_entry__ as contract

    spark = get_spark(app_name="aw3d30-capture-plans")
    qs = {
        n: f
        for n, f in contract.queries().items()
        if n in only or n[:3] in only
    }
    if not qs:
        raise SystemExit(f"no queries matched {only!r}")
    for name in sorted(qs):
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
