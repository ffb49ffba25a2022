"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``aw3d30_parquet_spark/``; this module
only assembles the contract dicts.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join orders→customer→nation→region with broadcast dims — the
    shape that exercises scan, join strategy, partial agg and sort.
    """
    from aw3d30_parquet_spark.operators.relational import q06_star_join

    return q06_star_join(spark, SMOKE_SF_DIR)


def _driver_history() -> dict[str, tuple[int, bool, bool]]:
    """``name -> (last_round, ok, rows_only)`` per the accumulated
    CORRECTNESS_r*.json.

    The driver's per-round capture is bounded (~50 entries in
    registration order), so ordering IS coverage policy. A name's
    status is its LATEST recorded row (rounds are replayed in
    ascending round order): a hash/row mismatch or a hard error marks
    it failed until a later round records it green — so fixed queries
    rotate to the FRONT of the dict and the next driver run certifies
    the fix; ``no_oracle`` rows-only captures count as passed but are
    flagged ``rows_only`` so an operator later promoted to a full SQL
    oracle takes the express lane back into the capture window.
    ``last_round`` is the staleness key: with zero failed and zero
    fresh names, a static order would re-certify the same prefix
    forever while everyone else's driver evidence ages indefinitely —
    least-recently-recorded-first re-certifies the whole surface every
    ~3 rounds."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    status: dict[str, tuple[int, bool, bool]] = {}
    def round_no(path: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 0

    # an unparseable filename must never take queries() down with it —
    # it sorts first (treated as oldest) and later rounds override
    paths = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")), key=round_no
    )
    for path in paths:
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        rnd = round_no(path)
        for name, row in rows.items():
            ok = (
                row.get("err") in (None, "no_oracle")
                and row.get("hash_match") is not False
                and row.get("rows_match") is not False
            )
            status[name] = (rnd, ok, row.get("err") == "no_oracle")
    return status


def _changed_since_record() -> Callable[[str, int, Callable], bool]:
    """Predicate: has the module implementing a query been COMMITTED
    (or locally modified) after the round that last recorded the
    query's driver evidence?

    Guards against stale green: u01–u03 migrated their rounding
    implementation in round 5 while their driver evidence stayed the
    r2 capture — nothing caught it because "passed + not oldest" kept
    them out of the window. Timestamps come from one ``git log
    --name-only`` pass (last-commit time per file); files dirty in the
    worktree count as changed NOW. If git is unavailable the predicate
    degrades to False (pure staleness rotation, the round-5 behavior).
    """
    import subprocess
    import time

    here = os.path.dirname(os.path.abspath(__file__))
    file_ct: dict[str, float] = {}
    try:
        # "@%ct" sentinel: a commit-time line is unambiguous even if a
        # tracked path were purely numeric (which isdigit() would have
        # misread as a timestamp, corrupting every file after it)
        out = subprocess.run(
            ["git", "log", "--format=@%ct", "--name-only"],
            cwd=here, capture_output=True, text=True, timeout=60,
        ).stdout
        ct = 0.0
        for line in out.splitlines():
            stripped = line.strip()
            if stripped.startswith("@") and stripped[1:].isdigit():
                ct = float(stripped[1:])
            elif stripped:
                # newest-first log: first sighting IS the latest commit
                file_ct.setdefault(stripped, ct)
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=here, capture_output=True, text=True, timeout=60,
        ).stdout
        for line in dirty.splitlines():
            path = line[3:].strip().split(" -> ")[-1]
            if path:
                file_ct[path] = time.time()
    except Exception:
        return lambda name, rnd, fn: False

    def round_time(rnd: int) -> float:
        return file_ct.get(f"CORRECTNESS_r{rnd:02d}.json", 0.0) or file_ct.get(
            f"CORRECTNESS_r{rnd}.json", 0.0
        )

    def changed(name: str, last_round: int, fn: Callable) -> bool:
        target = getattr(fn, "__wrapped__", fn)
        mod = sys.modules.get(getattr(target, "__module__", ""), None)
        src = getattr(mod, "__file__", None)
        if not src:
            return False
        rel = os.path.relpath(src, here)
        recorded = round_time(last_round)
        return bool(recorded) and file_ct.get(rel, 0.0) > recorded

    return changed


def _with_eviction(
    name: str, fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    """Dispatch wrapper: entering a query eagerly releases every OTHER
    query family's single-consumer scratch persists (scratch.py), so a
    sequential suite run holds one query's working set — not the whole
    session's history — in the executor storage pool."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aw3d30_parquet_spark import scratch

        scratch.begin_query(name)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", name)
    run.__module__ = getattr(fn, "__module__", run.__module__)
    run.__doc__ = fn.__doc__
    run.__wrapped__ = fn
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Registration order is the driver's check order, and its per-round
    capture is bounded — so ordering is coverage policy, five tiers:

    1. previously-FAILED queries (latest driver row not green) — the
       fixes land in the very next CORRECTNESS file;
    2. ORACLE-UPGRADED queries: latest driver row was a rows-only
       (``no_oracle``) capture but the operator now registers a full
       SQL oracle — the promotion gets driver-recorded immediately
       instead of aging behind the green tail;
    3. never-checked queries, round-robin interleaved by family
       (d/g/m/p/s/t/u/v + q49+) so any prefix samples every family;
    4. the previously-passed tail as a merge of two lanes keyed by
       EVIDENCE AGE (round of the latest driver record, oldest first):
       IMPLEMENTATION-CHANGED queries (the module implementing a
       passed query was committed/modified after the round of its
       latest driver record — round-5 lesson: u01–u03 sat on r2
       evidence across a rounding migration) win ties against
       LEAST-RECENTLY-RECORDED queries, because known-invalid evidence
       outranks merely-old evidence at equal age. Merging by age (not
       a blind alternation — the round-7 lesson) guarantees the
       capture window always drains the oldest-evidence cohort first:
       no name waits behind younger evidence, whichever lane it is in.
    """
    from aw3d30_parquet_spark.operators.relational import RELATIONAL_QUERIES

    combined: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    combined.update(RELATIONAL_QUERIES)

    from aw3d30_parquet_spark.operators import bucketing, graph, skew, zorder

    combined.update(zorder.QUERIES)
    combined.update(skew.QUERIES)
    combined.update(bucketing.QUERIES)
    combined.update(graph.QUERIES)

    from aw3d30_parquet_spark.functions import EXTENDED_QUERIES

    combined.update(EXTENDED_QUERIES)

    from aw3d30_parquet_spark.sources import demo, files

    combined.update(demo.QUERIES)
    combined.update(files.QUERIES)

    from aw3d30_parquet_spark.streaming import events as streaming_events

    combined.update(streaming_events.QUERIES)

    hist = _driver_history()
    with_oracle = set(oracle_sql())
    refit = [n for n in combined if n in hist and not hist[n][1]]
    upgraded = [
        n
        for n in combined
        if n in hist and hist[n][1] and hist[n][2] and n in with_oracle
    ]
    is_changed = _changed_since_record()
    changed = [
        n
        for n in combined
        if n in hist
        and n not in set(refit) | set(upgraded)
        and is_changed(n, hist[n][0], combined[n])
    ]
    fresh = [n for n in combined if n not in hist]
    by_family: dict[str, list[str]] = {}
    for n in sorted(fresh):
        by_family.setdefault(n[0], []).append(n)
    interleaved: list[str] = []
    lanes = [by_family[k] for k in sorted(by_family)]
    i = 0
    while any(lanes):
        lane = lanes[i % len(lanes)]
        if lane:
            interleaved.append(lane.pop(0))
        i += 1
    head = set(refit) | set(upgraded) | set(changed)
    stale_first = sorted(
        (n for n in combined if n in hist and n not in head),
        key=lambda n: hist[n][0],  # stable → registration order in ties
    )
    # changed-within-changed: oldest evidence first, so a migrated op
    # sitting on r2 evidence outranks one recorded last round
    changed.sort(key=lambda n: hist[n][0])
    # merge the changed and stale lanes by EVIDENCE AGE (round of the
    # latest driver record, oldest first), changed winning ties —
    # known-invalid evidence outranks merely-old evidence at equal
    # age. Round-7 lesson: a blind 1:1 alternation let a heavy-edit
    # round (core modules committed in r6 marked every r3–r5 name
    # "changed", 121 entries) hand half the bounded capture window to
    # the all-r6 stale lane — re-certifying evidence recorded LAST
    # round while 15 r3-evidence names missed the window. Merging by
    # age means neither lane can starve the oldest-evidence cohort:
    # a name only ever waits behind strictly-older (or equal-aged
    # changed) evidence.
    mixed: list[str] = []
    ln_c, ln_s = list(changed), list(stale_first)
    while ln_c or ln_s:
        if ln_c and (not ln_s or hist[ln_c[0]][0] <= hist[ln_s[0]][0]):
            mixed.append(ln_c.pop(0))
        else:
            mixed.append(ln_s.pop(0))
    ordered = refit + upgraded + interleaved + mixed
    return {n: _with_eviction(n, combined[n]) for n in ordered}


def rows_only() -> frozenset[str]:
    """The declared no-oracle registry: queries whose outputs have no
    DuckDB twin by design (sketch registers, xxhash64-keyed signatures,
    recall-graded approximate indexes). Single source of truth — the
    per-module ``ROWS_ONLY`` constants — consumed by tools/driver_sim.py
    and tests/test_contract.py so ``queries() - oracle_sql()`` can only
    diverge from it when a registration is genuinely inconsistent."""
    from aw3d30_parquet_spark.functions import dedup, vectors
    from aw3d30_parquet_spark.operators import relational

    return relational.ROWS_ONLY | dedup.ROWS_ONLY | vectors.ROWS_ONLY


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for ops that are
    not SQL-expressible — driver then records a rows-only check)."""
    from aw3d30_parquet_spark.queries import ORACLE_SQL

    out: dict[str, str] = {}
    out.update(ORACLE_SQL)

    from aw3d30_parquet_spark.operators import bucketing, graph, skew, zorder

    out.update(zorder.ORACLE_SQL)
    out.update(skew.ORACLE_SQL)
    out.update(bucketing.ORACLE_SQL)
    out.update(graph.ORACLE_SQL)

    from aw3d30_parquet_spark.functions import EXTENDED_ORACLE_SQL

    out.update(EXTENDED_ORACLE_SQL)

    from aw3d30_parquet_spark.sources import demo, files

    out.update(demo.ORACLE_SQL)
    out.update(files.ORACLE_SQL)

    from aw3d30_parquet_spark.streaming import events as streaming_events

    out.update(streaming_events.ORACLE_SQL)
    return out
