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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _loadavg  # noqa: E402  (the ONE load-sampling idiom)


def run_arm(tree: str, only: str) -> tuple[dict[str, float], list]:
    # _loadavg() is [] where os.getloadavg is unsupported — substitute
    # None so the later load[0]/load[-1] prints and the band computation
    # degrade like bench.py does instead of crashing the whole
    # interleaved session (ADVICE r9)
    load = _loadavg() or [None]
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
    # a failed arm must surface its own stderr, not die later in a
    # JSON parse that discards the diagnosis (and lose the whole
    # interleaved session's collected rounds with it)
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench failed in {tree} (exit {out.returncode}):\n"
            + out.stderr[-2000:]
        )
    try:
        queries = json.loads(lines[-1])["queries"]
    except (json.JSONDecodeError, KeyError) as exc:
        raise RuntimeError(
            f"unparseable bench stdout in {tree}: {lines[-1][:200]!r}"
        ) from exc
    # end-of-run load appended: a steal phase STARTING mid-run would
    # otherwise hide behind a quiet pre-run sample
    return queries, load + (_loadavg()[:1] or [None])


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
                f"round {i + 1} arm {arm} "
                f"load1m={load[0]}→{load[-1]}: "
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
    # band over BOTH the pre-run and post-run 1-min samples — a steal
    # phase arriving mid-run shows in the post sample (None samples from
    # loadavg-less platforms are excluded; band degrades to null)
    ones = [
        x for l in loads for x in (l[0], l[-1]) if x is not None
    ]
    summary["load1m_band"] = [min(ones), max(ones)] if ones else None
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
