"""Interleaved A/B bench harness (the SCALING.md t10 discipline,
mechanized): run the SAME query subset alternately from two checkouts
of the repo — arm A (e.g. a prior round's worktree) and arm B (the
current tree) — so both arms sample the same host-load phases, then
print per-arm per-query medians plus the loadavg band each run saw.

Usage:
    python tools/ab_interleave.py ARM_A_DIR ARM_B_DIR "m01,m02" [rounds]

Each bench invocation is a fresh process/SparkSession (cold JVM for
both arms equally). Host steal on this box swings wall-clock up to
~4x; alternation + the recorded load band is what makes a drift
verdict defensible where two independent single runs are not.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_arm(tree: str, only: str) -> tuple[dict[str, float], list[float]]:
    load = list(os.getloadavg())
    env = dict(
        os.environ,
        TZ="UTC",
        SPARK_GRAFT_BENCH_ONLY=only,
        SPARK_GRAFT_BENCH_REPEATS="3",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["queries"], [round(x, 2) for x in load]


def main() -> None:
    arm_a, arm_b, only = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    results: dict[str, dict[str, list[float]]] = {"A": {}, "B": {}}
    loads: list[list[float]] = []
    for i in range(rounds):
        for arm, tree in (("A", arm_a), ("B", arm_b)):
            qs, load = run_arm(tree, only)
            loads.append(load)
            for name, sec in qs.items():
                results[arm].setdefault(name, []).append(sec)
            print(
                f"round {i + 1} arm {arm} load1m={load[0]}: "
                + json.dumps(qs, sort_keys=True),
                flush=True,
            )
    summary = {
        arm: {
            name: {
                "med": round(statistics.median(v), 3),
                "min": round(min(v), 3),
                "max": round(max(v), 3),
            }
            for name, v in sorted(results[arm].items())
        }
        for arm in results
    }
    summary["load1m_band"] = [
        min(l[0] for l in loads), max(l[0] for l in loads)
    ]
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
