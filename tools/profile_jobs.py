#!/usr/bin/env python
"""Per-query job/stage profiler over the Spark event log (r12).

The container has no Spark UI (bench keeps stdout machine-parseable),
so this is the §1 "where does the time actually go" instrument: run a
query subset exactly like bench.py (warm-up + timed noop materialize),
with the event log enabled, then parse the log into per-query →
per-job → per-stage wall / task-time / shuffle-bytes attribution.

Usage:
    python tools/profile_jobs.py q01,l01_pagerank_fixed [repeats]

Full names or 3-char family codes, like SPARK_GRAFT_BENCH_ONLY.
Attribution rides spark.jobGroup.id (set per query run), so memoized
build jobs triggered inside a query land under that query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    only = {w.strip() for w in sys.argv[1].split(",") if w.strip()}
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.environ.setdefault("TZ", "UTC")
    log_dir = tempfile.mkdtemp(prefix="aw3d30_eventlog_")

    from pyspark.sql import SparkSession

    from aw3d30_parquet_spark.session import _RUNTIME_CONFS

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    builder = (
        SparkSession.builder.appName("aw3d30-profile")
        .master(f"local[{cpus}]" if cpus else "local[*]")
        .config("spark.sql.shuffle.partitions", cpus or "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    sc = spark.sparkContext

    import __spark_entry__ as contract

    qs = {
        n: f
        for n, f in contract.queries().items()
        if n in only or n[:3] in only
    }
    if not qs:
        raise SystemExit(f"no queries matched {only!r}")

    walls: dict[str, list[float]] = {}
    for name in sorted(qs):
        fn = qs[name]
        sc.setJobGroup(f"warmup::{name}", name)
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        for i in range(repeats):
            sc.setJobGroup(f"timed::{name}::{i}", name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            walls.setdefault(name, []).append(time.perf_counter() - t0)
    sc.setJobGroup("drain", "drain")
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log -------------------------------------------
    # Spark 4 (rolling logs): a directory eventlog_v2_<appId> holding
    # events_* part files; classic: a single file named <appId>.
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(log_dir) if app_id in p]
        path = os.path.join(log_dir, cands[0])
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if p.startswith("events_")
        )
    else:
        parts = [path]

    def _lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    job_of_stage: dict[int, int] = {}
    if True:
        for line in _lines():
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                group = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id", ""
                )
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "group": group,
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
                for s in ev.get("Stage Infos", []):
                    job_of_stage[s["Stage ID"]] = jid
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {})
                st.update(
                    name=si["Stage Name"],
                    tasks=si["Number of Tasks"],
                    t0=si.get("Submission Time"),
                    t1=si.get("Completion Time"),
                )
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                st["shuf_r"] = (
                    st.get("shuf_r", 0)
                    + sr.get("Remote Bytes Read", 0)
                    + sr.get("Local Bytes Read", 0)
                )
                st["shuf_w"] = st.get("shuf_w", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )
                st["fetch_ms"] = st.get("fetch_ms", 0) + sr.get(
                    "Fetch Wait Time", 0
                )

    # ---- report --------------------------------------------------------
    for name in sorted(walls):
        tag = f"timed::{name}::"
        runs = sorted(
            {
                j["group"]
                for j in jobs.values()
                if j["group"].startswith(tag)
            }
        )
        print(f"\n=== {name}  wall={[round(w, 3) for w in walls[name]]}")
        for run in runs[:1]:  # first timed run, job by job
            run_jobs = sorted(
                (jid for jid, j in jobs.items() if j["group"] == run)
            )
            prev_end = None
            for jid in run_jobs:
                j = jobs[jid]
                dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
                gap = (
                    (j["t0"] - prev_end) / 1000.0
                    if prev_end is not None
                    else 0.0
                )
                prev_end = j.get("t1", j["t0"])
                print(
                    f"  job {jid:4d} {dur:7.3f}s  (+{gap:.3f}s gap) "
                    f"{j['desc'][:60]}"
                )
                for sid in sorted(j["stages"]):
                    st = stages.get(sid)
                    if not st or st.get("t0") is None:
                        continue
                    sdur = (st.get("t1", st["t0"]) - st["t0"]) / 1000.0
                    print(
                        f"    stage {sid:4d} {sdur:7.3f}s "
                        f"tasks={st.get('tasks', '?'):4} "
                        f"task_ms={st.get('task_ms', 0):7d} "
                        f"fetch_ms={st.get('fetch_ms', 0):5d} "
                        f"shufR={st.get('shuf_r', 0):>10,} "
                        f"shufW={st.get('shuf_w', 0):>10,}  "
                        f"{st.get('name', '')[:50]}"
                    )
    print(f"\nevent log: {path}")


if __name__ == "__main__":
    main()
