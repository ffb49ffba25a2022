"""Driver-contract surface invariants (__spark_entry__.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as contract


def test_every_oracle_names_a_registered_query():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    # the no-oracle surface must be EXACTLY the declared ROWS_ONLY
    # registry (per-module constants unioned by contract.rows_only()):
    # a rows-only registration that forgets the registry, or a
    # registry name that has since gained an oracle, fails here.
    assert set(qs) - set(oracles) == set(contract.rows_only())
    # and stays small and deliberate (sketches + recall ops)
    assert len(contract.rows_only()) <= 20


def test_rotation_tiers_failed_upgraded_fresh_changed_stale():
    """The driver's per-round CORRECTNESS capture is bounded, so
    registration order decides coverage: latest-FAILED first, then
    oracle-UPGRADED (last row was rows-only but the name now has a SQL
    oracle), then never-checked names — interleaved across families so
    any capture prefix samples the whole surface — then the green tail
    as a merge of the IMPLEMENTATION-CHANGED lane and the
    least-recently-recorded staleness lane keyed by evidence age
    (oldest recorded round first; changed wins ties)."""
    qs = list(contract.queries())
    hist = contract._driver_history()
    if not hist:
        pytest.skip("no CORRECTNESS files yet (round 1)")
    with_oracle = set(contract.oracle_sql())
    refit = [n for n in qs if n in hist and not hist[n][1]]
    upgraded = [
        n
        for n in qs
        if n in hist and hist[n][1] and hist[n][2] and n in with_oracle
    ]
    fresh = [n for n in qs if n not in hist]
    assert qs[: len(refit)] == sorted(refit, key=qs.index)
    u0 = len(refit)
    assert set(qs[u0 : u0 + len(upgraded)]) == set(upgraded)
    f0 = u0 + len(upgraded)
    assert set(qs[f0 : f0 + len(fresh)]) == set(fresh)
    if len(fresh) >= 6:
        assert len({n[0] for n in qs[f0 : f0 + 6]}) >= 3
    # green tail: a merge of the changed lane (module committed or
    # dirty after the round of the latest record) and the stale lane,
    # keyed by evidence age — the tail must be NON-DECREASING in
    # last-recorded round overall (the oldest-evidence cohort can
    # never be starved by either lane), and within an equal-round run
    # every changed name precedes every unchanged one (known-invalid
    # evidence outranks merely-old at equal age)
    combined = contract.queries()
    is_changed = contract._changed_since_record()
    tail = qs[f0 + len(fresh) :]
    changed = {n for n in tail if is_changed(n, hist[n][0], combined[n])}
    rounds = [hist[n][0] for n in tail]
    assert rounds == sorted(rounds)
    for rnd in set(rounds):
        run = [n for n in tail if hist[n][0] == rnd]
        flags = [n in changed for n in run]
        # all True-prefix then False-suffix: no unchanged name ahead
        # of a changed one within the same evidence round
        assert flags == sorted(flags, reverse=True)


def test_rotation_changed_implementation_priority():
    """Round-5 lesson: u01–u03 migrated their rounding implementation
    while their driver evidence stayed the r2 capture. The predicate
    must flag a query whose implementing module was committed after
    the round of its record — and must NOT flag records from rounds
    with no CORRECTNESS file (guard) or functions without a module
    file."""
    is_changed = contract._changed_since_record()
    # any callable implemented in udfs.py: the module migrated its
    # rounding in round 5, so vs an r2 record it reads as changed
    import inspect

    from aw3d30_parquet_spark.functions import udfs

    fns = [
        f
        for _, f in inspect.getmembers(udfs, inspect.isfunction)
        if f.__module__ == "aw3d30_parquet_spark.functions.udfs"
    ]
    if not fns:
        pytest.skip("no functions in udfs module")
    # the assertion relies on git history ordering (udfs.py committed
    # after CORRECTNESS_r02.json); on a shallow/squashed clone or
    # after a history rewrite that ordering is gone — verify the
    # precondition with git directly and skip if absent, mirroring the
    # no-record guard below, instead of failing spuriously
    import os
    import subprocess

    def last_commit_ct(path: str) -> float:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            cwd=os.path.dirname(contract.__file__),
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        return float(out) if out.isdigit() else 0.0

    r2_ct = last_commit_ct("CORRECTNESS_r02.json")
    udfs_ct = last_commit_ct("aw3d30_parquet_spark/functions/udfs.py")
    if not (r2_ct and udfs_ct > r2_ct):
        pytest.skip("git history cannot order udfs.py after r2 record")
    assert is_changed("u01_synthetic", 2, fns[0])
    # round with no CORRECTNESS file on disk -> no record time -> False
    assert not is_changed("u01_synthetic", 99, fns[0])


def test_rotation_express_lane_recovers_oracle_promotions():
    """v02 was oracle-promoted after its rows-only r2 record; while its
    latest driver row is still ``no_oracle``, it must sit in the
    capture-window prefix (tiers 1–2), not at static position ~101."""
    hist = contract._driver_history()
    if "v02_ann_topk_bruteforce" not in hist:
        pytest.skip("v02 not driver-recorded yet")
    rnd, ok, rows_only = hist["v02_ann_topk_bruteforce"]
    if not (ok and rows_only and "v02_ann_topk_bruteforce" in contract.oracle_sql()):
        pytest.skip("v02 already re-recorded with its oracle")
    qs = list(contract.queries())
    assert qs.index("v02_ann_topk_bruteforce") < 10


def test_driver_history_latest_row_wins():
    """q24/q29/q31/q41/q48 failed in r01; their r03 green re-records
    must win (latest row is the status), and any name whose latest row
    is a FAIL must sit in the dict prefix."""
    import glob
    import json
    import re

    hist = contract._driver_history()
    latest: dict[str, tuple[int, dict]] = {}
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)", path)
        rnd = int(m.group(1)) if m else 0
        for n, r in json.load(open(path)).items():
            if n not in latest or latest[n][0] < rnd:
                latest[n] = (rnd, r)
    for n, (rnd, r) in latest.items():
        ok = (
            r.get("err") in (None, "no_oracle")
            and r.get("hash_match") is not False
            and r.get("rows_match") is not False
        )
        assert hist[n] == (rnd, ok, r.get("err") == "no_oracle")
    qs = list(contract.queries())
    failed = [n for n in qs if n in hist and not hist[n][1]]
    assert qs[: len(failed)] == failed


def test_query_names_are_unique_3char_coded():
    """bench.py's short-key fallback truncates names to 3 chars —
    that stays collision-free only while the 3-char family codes are
    unique."""
    qs = list(contract.queries())
    codes = [n[:3] for n in qs]
    assert len(set(codes)) == len(codes)


def test_bench_stdout_line_fits_driver_capture_window():
    """r7 judge ask: BENCH_r*.json recorded 'parsed': null because the
    one-line stdout overflowed the driver's 2000-char tail capture.
    _fit_stdout_line must shed detail until the full-suite line fits
    the window AND still parses with the contract fields + the slowest
    queries intact."""
    import json

    from bench import _fit_stdout_line

    # realistic full-suite shape: current registered names, timings
    # matching the r12 driver run's distribution (~0.6 s mean, ~25% of
    # entries ≥ 1 s, ~130 s suite — the THRASHED end of observed runs;
    # quiet runs are faster and fit with more room)
    names = list(contract.queries())
    per_query = {
        n: round(0.07 + (i % 40) * 0.03, 3) for i, n in enumerate(names)
    }
    slowest = sorted(per_query, key=per_query.get, reverse=True)[:20]
    result = {
        "metric": "declared_suite_total_sec",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "n_queries": len(per_query),
        "mean_sec": 0.5,
        "stable_q01_q28_sec": 4.0,
        "family_sec": {chr(c): 1.0 for c in range(ord("a"), ord("z"))},
        "queries": dict(per_query),
        "spread_top5": {
            n[:3]: {"med": 1.0, "min": 0.9, "max": 1.4} for n in names[:5]
        },
        "sf": "0.1",
        "ingest": {
            "tiles": 32,
            "rows": 8388608,
            "sec": 0.64,
            "tiles_per_sec": 49.6,
            "rows_per_sec": 13009427.0,
        },
    }
    line = _fit_stdout_line(dict(result, queries=dict(per_query)))
    assert len(line) <= 1975  # newline headroom inside the 2000 window
    parsed = json.loads(line)
    assert parsed["value"] == result["value"]
    assert parsed["n_queries"] == len(per_query)
    # r13 (judge ask): the full registered suite must keep EVERY
    # per-query entry on stdout — r12's slowest-first shedding made
    # PERF count 9 phantom "dropped" queries. The integer-ms tier is
    # what buys the room; assert it engaged and nothing was shed.
    assert parsed["queries_omitted"] == 0
    assert parsed.get("queries_unit") == "ms"
    assert len(parsed["queries"]) == len(per_query)
    kept = set(parsed["queries"])
    for n in slowest:
        assert n[:3] in kept or n in kept, n
    # ms re-encoding preserves the 3-decimal-seconds precision
    for n, sec in per_query.items():
        got = parsed["queries"].get(n[:3], parsed["queries"].get(n))
        assert got == int(round(sec * 1000)), n
    # pathological environment (every query seconds-scale, ~390 s
    # suite — beyond anything observed): the line must still FIT the
    # capture window, and anything shed must be declared
    slow = {n: round(0.07 + (i % 40) * 0.11, 3)
            for i, n in enumerate(names)}
    line = _fit_stdout_line(dict(result, queries=dict(slow),
                                 value=round(sum(slow.values()), 4)))
    assert len(line) <= 1975
    parsed = json.loads(line)
    assert parsed["queries_omitted"] == len(slow) - len(parsed["queries"])
    # a small run (BENCH_ONLY) passes through untouched
    small = {"metric": "m", "value": 1.0, "unit": "sec",
             "queries": {"d04": 1.0}, "sf": "0.1"}
    assert json.loads(_fit_stdout_line(dict(small))) == small


def test_oracle_module_imports_without_pyspark():
    """queries.py is the DuckDB oracle contract: DuckDB-only tooling
    must be able to import it on a machine with no Spark install
    (ADVICE r8: the HLL constants used to be imported from
    operators.relational, dragging pyspark in). Run a subprocess with
    pyspark import-blocked and load the module."""
    import subprocess
    import sys

    # find_spec, not the legacy find_module/load_module pair: the
    # legacy fallback was removed in Python 3.12, where a find_module-
    # only finder is silently ignored and this test would pass even if
    # the oracle module regressed to importing pyspark.
    code = (
        "import sys\n"
        "class B:\n"
        "    def find_spec(self, n, path=None, target=None):\n"
        "        if n == 'pyspark' or n.startswith('pyspark.'):\n"
        "            raise ImportError('blocked: ' + n)\n"
        "sys.meta_path.insert(0, B())\n"
        "try:\n"
        "    import pyspark\n"
        "except ImportError:\n"
        "    pass\n"
        "else:\n"
        "    raise SystemExit('blocker inert: pyspark imported')\n"
        "import aw3d30_parquet_spark.queries as q\n"
        "import aw3d30_parquet_spark.constants as c\n"
        "assert c.HLL_M == 256 and c.HLL_P == 8\n"
        "assert isinstance(next(iter(q.__dict__)), str)\n"
        "print('OK')\n"
    )
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_bench_snapshot_merge_is_min_over_rounds():
    """The committed-snapshot merge (tools/bench_snapshot.merge_runs)
    takes the per-query MIN across rounds, recomputes every derived
    field from the merged map (value, mean, family/stable subtotals —
    shared definitions with bench.py), drops per-run diagnostics
    (evictions AND isolated_top — ADVICE r10: per-run re-measures must
    not masquerade as merged-artifact properties), windows host_load
    across all rounds, and carries the across-rounds band + per-round
    record (incl. per-round isolated_top and the quiet-round index
    list) under `snapshot`."""
    sys.path.insert(0, "/root/repo/tools")
    from bench_snapshot import merge_runs

    runs = [
        {
            "queries": {"q01": 2.0, "d01": 5.0, "q29": 1.0},
            "value": 8.0,
            "n_queries": 3,
            "host_load": {"start": [1, 1, 1], "end": [9, 9, 9]},
            "ingest": {"sec": 2.0, "tiles": 4},
            "evictions": {"scratch": 7},
            "sf": "0.1",
            "metric": "declared_suite_total_sec",
            "unit": "sec",
        },
        {
            "queries": {"q01": 1.5, "d01": 6.0, "q29": 0.9},
            "value": 8.4,
            "n_queries": 3,
            "host_load": {"start": [3, 3, 3], "end": [2, 2, 2]},
            "ingest": {"sec": 1.4, "tiles": 4},
            "isolated_top": {"d01": 4.2},
            "sf": "0.1",
            "metric": "declared_suite_total_sec",
            "unit": "sec",
        },
    ]
    m = merge_runs(runs)
    assert m["queries"] == {"q01": 1.5, "d01": 5.0, "q29": 0.9}
    assert m["value"] == 7.4
    assert m["metric"] == "declared_suite_total_sec_min_over_rounds"
    # stable set counts q01 but NOT q29 (>28); families recomputed
    assert m["stable_q01_q28_sec"] == 1.5
    assert m["family_sec"] == {"d": 5.0, "q": 2.4}
    assert "evictions" not in m
    assert "isolated_top" not in m  # per-run diagnostic, not merged
    assert m["host_load"] == {"start": [1, 1, 1], "end": [2, 2, 2]}
    assert m["spread"]["d01"] == {"min": 5.0, "med": 5.5, "max": 6.0}
    assert m["ingest"]["sec"] == 1.4  # fastest round's block
    assert m["snapshot"]["rounds"] == 2
    assert m["snapshot"]["round_totals"] == [8.0, 8.4]
    assert m["snapshot"]["round_isolated_top"] == [None, {"d01": 4.2}]
    # round 0 starts quiet (load1m 1) but ends loud (9); round 1 is
    # loud both ends → neither qualifies as genuinely quiet
    assert m["snapshot"]["quiet_rounds"] == []


def test_bench_snapshot_quiet_round_predicate():
    sys.path.insert(0, "/root/repo/tools")
    from bench_snapshot import round_is_quiet

    assert round_is_quiet(
        {"host_load": {"start": [1.2, 3, 3], "end": [1.9, 2, 2]}}
    )
    assert not round_is_quiet(
        {"host_load": {"start": [1.2, 1, 1], "end": [2.0, 2, 2]}}
    )
    assert not round_is_quiet({"host_load": {"start": [], "end": []}})
    assert not round_is_quiet({})
