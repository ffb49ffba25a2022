"""Committed-bench-snapshot protocol (r9 verdict item 5).

The host delivers CPU steal in ~10-minute waves (six same-label r9 runs
spanned 87.9–117.4 s on identical code), so a SINGLE bench run is weak
evidence by construction. This tool mechanizes what ab_interleave.py
does for two arms, for the ONE committed snapshot: run the full suite N
times in fresh processes (cold JVM each, so every round samples its own
load phase), then write bench_results.json as the per-query
min-over-rounds artifact — min-spread is the steal-proof statistic
(steal only ever ADDS wall-clock), with per-round medians, host_load
windows, and the across-rounds band kept alongside so SCALING.md drift
sections can cite the file without fresh A/Bs.

Usage:
    python tools/bench_snapshot.py [rounds] [label]
    python tools/bench_snapshot.py --round <dir>
    python tools/bench_snapshot.py --merge <dir> [label]

Writes bench_results.json (schema superset of a single bench.py run:
`queries` become min-over-rounds, `snapshot` carries the protocol
record) and appends one labeled row to bench_history.jsonl.

The --round/--merge pair is the SPREAD protocol (r11 verdict item 4):
two consecutive back-to-back snapshots ran to their 5-round caps with
zero quiet rounds because the ~10-minute steal waves outlast five
consecutive ~100 s rounds — all five sample the same plateau. --round
runs ONE full-suite round and appends it to <dir>; firing rounds at
different points across a session samples independent wave phases
(and lets the operator avoid self-inflicted load between rounds).
--merge folds every collected round into the committed
min-over-rounds artifact with the identical statistics.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(HERE, "bench_results.json")

sys.path.insert(0, HERE)

from bench import family_subtotals, stable_subtotal  # noqa: E402


def run_round(idx: int) -> dict:
    env = dict(os.environ, TZ="UTC")
    env.pop("SPARK_GRAFT_BENCH_ONLY", None)  # snapshots are full-suite
    env.pop("SPARK_GRAFT_BENCH_LABEL", None)  # history row written once, merged
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=HERE, env=env, capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"bench round {idx} failed (exit {out.returncode}):\n"
            + out.stderr[-2000:]
        )
    # bench.py just wrote the full-fidelity artifact for this round
    with open(RESULTS) as fh:
        return json.load(fh)


#: load1m below this on BOTH ends of a round = "genuinely quiet" — the
#: r10 verdict's watch item asked that every committed snapshot contain
#: at least one such round so min-over-rounds is anchored by a
#: steal-free sample, not just the least-bad of three loaded ones
QUIET_LOAD1M = 2.0
#: external /proc/stat busy fraction below this at BOTH ends = quiet
#: (r12): ~10% of 32 CPUs ≈ 3 externally-busy cores. Preferred over
#: the loadavg rule wherever bench.py recorded ``host_cpu``, because
#: loadavg remembers the suite's OWN 32-thread burst for ~a minute —
#: ``host_load.end`` reads 8–15 after ANY ~100 s suite, so the
#: load1m<2-at-both-ends test was unsatisfiable by construction (the
#: real reason two r11 snapshots ran to cap with quiet_rounds=[]).
QUIET_EXT_BUSY = 0.10
#: cumulative hypervisor-steal fraction across the whole run below
#: this = no mid-run wave (r12 — spread round 1 read externally quiet
#: at BOTH endpoint brackets yet ran 56% slow: the wave hit between
#: the samples; the /proc/stat steal counter is cumulative, so a
#: run-spanning delta cannot miss it)
QUIET_RUN_STEAL = 0.02
#: hard cap on extra rounds hunting for a quiet one (wall-clock bound)
MAX_ROUNDS = 5


def round_is_quiet(run: dict) -> bool:
    hc = run.get("host_cpu") or {}
    if hc.get("start") is not None and hc.get("end") is not None:
        # a host_cpu record WITHOUT steal_frac_run cannot certify quiet:
        # the round that motivated the field read 0.0/0.0006 at both
        # ends yet lost 56% wall to a mid-run wave — ends-quiet alone
        # is proven insufficient evidence
        steal = hc.get("steal_frac_run")
        return (
            steal is not None
            and steal < QUIET_RUN_STEAL
            and hc["start"] < QUIET_EXT_BUSY
            and hc["end"] < QUIET_EXT_BUSY
        )
    hl = run.get("host_load") or {}
    start, end = hl.get("start") or [], hl.get("end") or []
    return (
        bool(start)
        and bool(end)
        and start[0] < QUIET_LOAD1M
        and end[0] < QUIET_LOAD1M
    )


def merge_runs(runs: list[dict]) -> dict:
    """Pure merge of N single-run bench artifacts into the committed
    min-over-rounds snapshot (unit-tested in tests/test_contract.py)."""
    names = sorted(runs[0]["queries"])
    per_round = {n: [r["queries"][n] for r in runs] for n in names}
    merged = dict(runs[-1])  # structure/keys from the newest run
    # per-RUN diagnostics must not masquerade as properties of the
    # min-merged artifact: every derived field is recomputed below,
    # and the fields that only make sense for one run are dropped
    # (evictions) or replaced by the all-rounds window (host_load) —
    # per-round values live under "snapshot"
    merged.pop("evictions", None)
    # isolated_top is bench.py's per-RUN re-measure of eviction-hit
    # queries — same diagnostic class as evictions; keep it per-round
    # under "snapshot" below, never as a merged-artifact property
    merged.pop("isolated_top", None)
    merged["queries"] = {n: min(v) for n, v in per_round.items()}
    merged["value"] = round(sum(merged["queries"].values()), 4)
    merged["metric"] = "declared_suite_total_sec_min_over_rounds"
    merged["mean_sec"] = round(merged["value"] / max(1, len(names)), 4)
    merged["family_sec"] = family_subtotals(merged["queries"])
    merged["stable_q01_q28_sec"] = stable_subtotal(merged["queries"])
    first_load = runs[0].get("host_load") or {}
    last_load = runs[-1].get("host_load") or {}
    merged["host_load"] = {
        "start": first_load.get("start"),
        "end": last_load.get("end"),
    }
    # across-ROUNDS band replaces the within-run spread: each round is a
    # fresh process in its own load phase, so this band IS the
    # steal-noise envelope for this code
    merged["spread"] = {
        n: {
            "min": round(min(v), 4),
            "med": round(statistics.median(v), 4),
            "max": round(max(v), 4),
        }
        for n, v in per_round.items()
    }
    # the stdout-tail teaser mirrors the file: widest ACROSS-ROUNDS
    # bands (runs[-1]'s within-run spread_top5 would contradict them)
    merged["spread_top5"] = {
        n[:3]: merged["spread"][n]
        for n in sorted(
            merged["spread"],
            key=lambda q: merged["spread"][q]["max"] - merged["spread"][q]["min"],
            reverse=True,
        )[:5]
    }
    merged["snapshot"] = {
        "protocol": "min-over-interleaved-rounds",
        "rounds": len(runs),
        "round_totals": [r["value"] for r in runs],
        "round_host_load": [r.get("host_load") for r in runs],
        "round_host_cpu": [r.get("host_cpu") for r in runs],
        "round_ingest_sec": [
            r.get("ingest", {}).get("sec") for r in runs
        ],
        "round_isolated_top": [r.get("isolated_top") for r in runs],
        "quiet_rounds": [i for i, r in enumerate(runs) if round_is_quiet(r)],
    }
    # ingest: keep the fastest round's block (same steal-proof logic)
    ingests = [r["ingest"] for r in runs if "ingest" in r]
    if ingests:
        merged["ingest"] = min(ingests, key=lambda g: g["sec"])
    return merged


def spread_round(outdir: str) -> None:
    """Run ONE full-suite bench round and file it under ``outdir`` —
    the spread-protocol collection step. Prints a one-line JSON record
    (value, host_load, quiet) so the operator can decide when to fire
    the next round."""
    import glob

    os.makedirs(outdir, exist_ok=True)
    run = run_round(0)
    k = len(glob.glob(os.path.join(outdir, "round_*.json")))
    path = os.path.join(outdir, f"round_{k:02d}.json")
    with open(path, "w") as fh:
        json.dump(run, fh)
        fh.write("\n")
    print(
        json.dumps(
            {
                "round": k,
                "value": run["value"],
                "host_load": run.get("host_load"),
                "quiet": round_is_quiet(run),
                "path": path,
            }
        ),
        flush=True,
    )


def spread_merge(outdir: str, label: str | None) -> None:
    """Merge every collected spread round into the committed
    min-over-rounds artifact (identical statistics to the interleaved
    protocol; the protocol string records that rounds were spread
    across the session instead of run back-to-back)."""
    import glob

    paths = sorted(glob.glob(os.path.join(outdir, "round_*.json")))
    if not paths:
        raise SystemExit(f"no round_*.json under {outdir}")
    runs = []
    for p in paths:
        with open(p) as fh:
            runs.append(json.load(fh))
    merged = merge_runs(runs)
    merged["metric"] = "declared_suite_total_sec_min_over_spread_rounds"
    merged["snapshot"]["protocol"] = "min-over-spread-rounds"
    with open(RESULTS, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    if label:
        with open(os.path.join(HERE, "bench_history.jsonl"), "a") as fh:
            fh.write(
                json.dumps(
                    dict(merged, label=label, ts=round(time.time(), 1)),
                    separators=(",", ":"),
                )
                + "\n"
            )
    print(
        json.dumps(
            {
                "value": merged["value"],
                "rounds": len(runs),
                "round_totals": merged["snapshot"]["round_totals"],
                "quiet_rounds": merged["snapshot"]["quiet_rounds"],
            }
        ),
        flush=True,
    )


def main() -> None:
    if sys.argv[1:2] == ["--round"]:
        spread_round(sys.argv[2])
        return
    if sys.argv[1:2] == ["--merge"]:
        spread_merge(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
        return
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    label = sys.argv[2] if len(sys.argv) > 2 else None
    runs: list[dict] = []
    # sample the requested rounds, then keep going (≤ MAX_ROUNDS total)
    # until at least one round is genuinely quiet (load1m < QUIET_LOAD1M
    # at both ends) — the anchor the r10 verdict's outlier watch item
    # requires; if the host never quiets down within the cap, the
    # snapshot says so via an empty quiet_rounds list
    while len(runs) < rounds or (
        len(runs) < MAX_ROUNDS and not any(round_is_quiet(r) for r in runs)
    ):
        t0 = time.time()
        runs.append(run_round(len(runs)))
        print(
            f"round {len(runs)}/{rounds} (cap {MAX_ROUNDS}): "
            f"value={runs[-1]['value']} "
            f"host_load={runs[-1].get('host_load')} "
            f"quiet={round_is_quiet(runs[-1])} "
            f"({round(time.time() - t0, 1)}s wall)",
            flush=True,
        )
    merged = merge_runs(runs)
    with open(RESULTS, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    if label:
        with open(os.path.join(HERE, "bench_history.jsonl"), "a") as fh:
            fh.write(
                json.dumps(
                    dict(merged, label=label, ts=round(time.time(), 1)),
                    separators=(",", ":"),
                )
                + "\n"
            )
    print(
        json.dumps(
            {
                "value": merged["value"],
                "rounds": len(runs),
                "round_totals": merged["snapshot"]["round_totals"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
