"""T5 (approx-distinct tolerance) + V6 (TF-IDF vs pure-Python oracle)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from aw3d30_parquet_spark.functions.text import tfidf_top_terms
from aw3d30_parquet_spark.operators.relational import a01_approx_count_distinct
from aw3d30_parquet_spark.session import register_views

SF_T2 = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


def test_t5_approx_count_distinct_tolerance(spark):
    """HLL++ estimate within 5% of the exact distinct count, per group."""
    approx = {
        r.event_type: r.approx_users
        for r in a01_approx_count_distinct(spark, SF_T2).collect()
    }
    register_views(spark, SF_T2)
    exact = {
        r.event_type: r.cnt
        for r in spark.table("events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("cnt"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, est in approx.items():
        assert abs(est - exact[et]) <= 0.05 * exact[et], (et, est, exact[et])


def test_t5c_hll_sketch_rollup_tolerance(spark):
    """Weekly estimates from UNIONED daily DataSketches HLL sketches
    stay within 5% of the exact weekly distinct-user count — the merge
    path, not just the single-shot estimate, is what's being bounded."""
    from aw3d30_parquet_spark.operators.relational import a03_hll_sketch_rollup

    approx = {
        r.week: r.approx_users
        for r in a03_hll_sketch_rollup(spark, SF_T2).collect()
    }
    register_views(spark, SF_T2)
    exact = {
        r.week: r.cnt
        for r in spark.table("events")
        .groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("cnt"))
        .collect()
    }
    assert set(approx) == set(exact)
    assert len(approx) > 1  # the rollup actually spans multiple weeks
    for wk, est in approx.items():
        assert abs(est - exact[wk]) <= 0.05 * exact[wk], (wk, est, exact[wk])


def test_t5d_quantile_sketch_rollup_tolerance(spark):
    """Weekly percentile estimates from MERGED daily equi-depth sketches
    land within the sketch's rank-error guarantee: each estimate must
    fall between the exact quantiles at q ± 2·(1/K) rank offset (two
    compressions: day-level + week-level merge)."""
    from aw3d30_parquet_spark.operators.relational import (
        SKETCH_K,
        a04_quantile_sketch_rollup,
    )

    approx = {
        r.week: (r.p50, r.p90, r.p99)
        for r in a04_quantile_sketch_rollup(spark, SF_T2).collect()
    }
    register_views(spark, SF_T2)
    eps = 2.0 / SKETCH_K
    lo_q = [max(0.0, q - eps) for q in (0.5, 0.9, 0.99)]
    hi_q = [min(1.0, q + eps) for q in (0.5, 0.9, 0.99)]
    bounds = {
        r.week: (r.lo, r.hi)
        for r in spark.table("events")
        .groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
        .agg(
            F.expr(
                f"percentile(value, array({','.join(map(str, lo_q))}))"
            ).alias("lo"),
            F.expr(
                f"percentile(value, array({','.join(map(str, hi_q))}))"
            ).alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(bounds)
    assert len(approx) > 1
    for wk, ests in approx.items():
        lo, hi = bounds[wk]
        for est, l, h in zip(ests, lo, hi):
            assert l - 1e-6 <= est <= h + 1e-6, (wk, est, l, h)


def test_t5e_kll_quantile_rollup_tolerance(spark):
    """Weekly percentiles from MERGED daily KLL sketches within the
    sketch's default normalized rank error (~1.65% at k=200, doubled
    for the merge) of exact weekly quantile bounds."""
    from aw3d30_parquet_spark.operators.relational import (
        a05_kll_quantile_rollup,
    )

    approx = {
        r.week: (r.p50, r.p90, r.p99)
        for r in a05_kll_quantile_rollup(spark, SF_T2).collect()
    }
    register_views(spark, SF_T2)
    eps = 0.033
    lo_q = [max(0.0, q - eps) for q in (0.5, 0.9, 0.99)]
    hi_q = [min(1.0, q + eps) for q in (0.5, 0.9, 0.99)]
    bounds = {
        r.week: (r.lo, r.hi)
        for r in spark.table("events")
        .groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
        .agg(
            F.expr(
                f"percentile(value, array({','.join(map(str, lo_q))}))"
            ).alias("lo"),
            F.expr(
                f"percentile(value, array({','.join(map(str, hi_q))}))"
            ).alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(bounds)
    for wk, ests in approx.items():
        lo, hi = bounds[wk]
        for est, l, h in zip(ests, lo, hi):
            assert l - 1e-6 <= est <= h + 1e-6, (wk, est, l, h)


def test_t5f_theta_audience_rollup_exact(spark):
    """Theta-sketch retention/churn/new estimates match exact distinct-
    set arithmetic (cohorts are far below the sketch's exact-mode
    threshold of 4096 entries, so the sketch must be exact here)."""
    from aw3d30_parquet_spark.operators.relational import (
        AUDIENCE_VALUE_MIN,
        a06_theta_audience_rollup,
    )

    got = {
        r.week: (r.active, r.retained, r.churned, r.new_users)
        for r in a06_theta_audience_rollup(spark, SF_T2).collect()
    }
    register_views(spark, SF_T2)
    weekly_sets = {
        r.week: set(r.users)
        for r in spark.table("events")
        .filter(
            (F.col("event_type") == "error")
            & (F.col("value") > AUDIENCE_VALUE_MIN)
        )
        .groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
        .agg(F.collect_set("user_id").alias("users"))
        .collect()
    }
    assert set(got) == set(weekly_sets)
    assert len(got) > 2
    weeks = sorted(weekly_sets)
    for prev, cur in zip(weeks, weeks[1:]):
        a, b = weekly_sets[prev], weekly_sets[cur]
        active, retained, churned, new_users = got[cur]
        assert active == len(b)
        assert retained == len(a & b), (cur, retained, len(a & b))
        assert churned == len(a - b)
        assert new_users == len(b - a)
    first = got[weeks[0]]
    assert first[1] is None and first[2] is None and first[3] is None


def test_t5b_approx_percentile_tolerance(spark):
    """GK-sketch percentiles within 1% relative error of the exact
    interpolated percentile, per group and per quantile."""
    from aw3d30_parquet_spark.operators.relational import a02_approx_percentile

    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in a02_approx_percentile(spark, SF_T2).collect()
    }
    register_views(spark, SF_T2)
    exact = {
        r.event_type: r.pcts
        for r in spark.table("events")
        .groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("pcts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ests in approx.items():
        for est, ex in zip(ests, exact[et]):
            assert abs(est - ex) <= 0.01 * abs(ex) + 1e-9, (et, est, ex)


def test_v6_tfidf_vs_python_oracle(spark):
    """Top-3 TF-IDF terms per doc match an independent pure-Python
    recomputation (same smoothing, same tie-break) on every document."""
    register_views(spark, SF_SMOKE)
    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    n_docs = len(docs)
    df_counts: Counter = Counter()
    for toks in docs.values():
        df_counts.update(set(toks))

    def top3(toks):
        # rank on the operator's contract: floor-half-up at 4 decimals
        # with a term tiebreak (NOT the raw score — the rounded and
        # raw orders can legally differ within one 1e-4 bucket)
        tf = Counter(toks)
        scored = [
            (
                -(
                    math.floor(
                        tf[t]
                        * (math.log((n_docs + 1) / (df_counts[t] + 1)) + 1)
                        * 10000
                        + 0.5
                    )
                    / 10000
                ),
                t,
            )
            for t in tf
        ]
        return [(t, tf[t], df_counts[t]) for _, t in sorted(scored)[:3]]

    got = tfidf_top_terms(spark, SF_SMOKE).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.term, r.tf, r.df))
    assert set(by_doc) == set(docs)
    mismatches = [
        d for d in docs if by_doc[d] != top3(docs[d])
    ]
    assert not mismatches, (mismatches[:5], by_doc[mismatches[0]] if mismatches else None)


def test_t5g_cms_freq_rollup_sandwich(spark):
    """CMS weekly frequency estimates: never undercount (structural
    CMS guarantee — every increment lands in each row), and overcount
    within the e/W·N bound for every probe user (4 independent hash
    rows make the min-estimate exceed it with negligible probability;
    the fixed hash family makes this deterministic here)."""
    import math

    from aw3d30_parquet_spark.operators.relational import (
        CMS_PROBE_USERS,
        CMS_WIDTH,
        a08_cms_freq_rollup,
    )

    rows = a08_cms_freq_rollup(spark, SF_T2).collect()
    assert len(rows) > len(CMS_PROBE_USERS)  # several weeks
    register_views(spark, SF_T2)
    exact = {
        (r.week, r.user_id): r.cnt
        for r in spark.table("events")
        .filter(F.col("user_id").isin(*CMS_PROBE_USERS))
        .groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            "user_id",
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n_week = {r.week: r.n_events for r in rows}
    eps = math.e / CMS_WIDTH
    hit_exact = 0
    for r in rows:
        true = exact.get((r.week, r.user_id), 0)
        assert r.est >= true, (r, true)
        assert r.est <= true + eps * n_week[r.week] + 1e-9, (r, true)
        hit_exact += r.est == true
    # with W=1024 ≫ weekly active users, most probes collide with
    # nothing — the sketch should usually be exact, not merely bounded
    assert hit_exact >= len(rows) // 2


def test_t5h_kmv_bottomk_python_twin_and_merge(spark):
    """a09: sketch content equals a hashlib recomputation; the ALL row
    equals the bottom-k merge of the weekly sketches (lossless-merge
    property); the full-sketch estimator lands within the KMV error
    envelope of the exact count."""
    import hashlib

    import pandas as pd

    from aw3d30_parquet_spark.operators.relational import (
        KMV_K,
        a09_kmv_bottomk_rollup,
    )

    sf = "/root/testdata/sf0.01"
    ev = pd.read_parquet(f"{sf}/events.parquet")[["ts", "user_id"]]
    ev["scope"] = (
        ev["ts"]
        .dt.to_period("W")
        .dt.start_time.dt.date.astype(str)
    )

    def dig(u):
        return int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15], 16)

    weekly = {}
    for scope, grp in ev.groupby("scope"):
        hs = sorted({dig(u) for u in grp["user_id"]})
        weekly[scope] = hs
    want = {}
    for scope, hs in weekly.items():
        sk = hs[:KMV_K]
        kth = sk[-1]
        est = (
            len(sk)
            if len(sk) < KMV_K
            else int((KMV_K - 1) * float(2**60) / float(kth) + 0.5)
        )
        want[scope] = (len(sk), kth, est, len(hs))
    merged = sorted(set().union(*[set(h[:KMV_K]) for h in weekly.values()]))[
        :KMV_K
    ]
    all_exact = len(set().union(*[set(h) for h in weekly.values()]))
    kth = merged[-1]
    est = (
        len(merged)
        if len(merged) < KMV_K
        else int((KMV_K - 1) * float(2**60) / float(kth) + 0.5)
    )
    want["ALL"] = (len(merged), kth, est, all_exact)

    rows = a09_kmv_bottomk_rollup(spark, sf).collect()
    got = {
        r.scope: (r.n_sketch, r.kth_digest, r.est_distinct, r.exact_distinct)
        for r in rows
    }
    assert got == want, {
        k: (got.get(k), want.get(k)) for k in set(got) ^ set(want) or list(want)[:2]
    }
    # estimator quality: full sketches within ~4 sigma (sigma ≈ 1/sqrt(k))
    for scope, (n, _, est, exact) in got.items():
        if n == KMV_K:
            assert abs(est - exact) <= max(4 * exact / (KMV_K ** 0.5), 2), (
                scope, est, exact,
            )


def test_t5i_hll_register_rollup_accuracy_and_python_twin(spark):
    """a10 (hand-built HLL with the full hash oracle): (1) estimates
    within tolerance of exact weekly distincts on BOTH estimator
    branches — linear counting at sf0.001 (n=150 ≪ 2.5m) and the raw
    harmonic form at sf0.1 (n=1500 > 640, where zero registers nearly
    vanish); (2) the register state (s_int, zero_registers) matches a
    fully independent pure-python recompute (hashlib md5 → trailing-
    zero rho → register max → exact integer harmonic sum)."""
    import hashlib

    from aw3d30_parquet_spark.operators.relational import (
        HLL_M,
        HLL_P,
        HLL_RHO_MAX,
        a10_hll_distinct_rollup,
    )

    for sf, tol in ((SF_SMOKE, 0.15), ("/root/testdata/sf0.1", 0.20)):
        rows = a10_hll_distinct_rollup(spark, sf).collect()
        assert rows
        register_views(spark, sf)
        exact = {
            r.week: r.d
            for r in spark.table("events")
            .groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
            .agg(F.count_distinct("user_id").alias("d"))
            .collect()
        }
        for r in rows:
            err = abs(r.est - exact[r.week]) / exact[r.week]
            assert err <= tol, (sf, r.week, r.est, exact[r.week])
        # branch witness: smoke sits in the linear-counting regime,
        # sf0.1 in the raw regime
        if sf == SF_SMOKE:
            assert all(r.zero_registers > 0 for r in rows)
        else:
            assert all(exact[r.week] > 2.5 * HLL_M for r in rows)

    # independent python twin at smoke: same registers bit-for-bit
    rows = a10_hll_distinct_rollup(spark, SF_SMOKE).collect()
    register_views(spark, SF_SMOKE)
    ev = (
        spark.table("events")
        .select(
            F.date_trunc("week", F.date_trunc("day", "ts"))
            .cast("date")
            .alias("week"),
            "user_id",
        )
        .collect()
    )
    regs: dict = {}
    for e in ev:
        h = int(hashlib.md5(str(e.user_id).encode()).hexdigest()[:15], 16)
        j = h % HLL_M
        w1 = (h >> HLL_P) + (1 << 52)
        rho = (w1 & -w1).bit_length()  # trailing-zero rank
        key = (e.week, j)
        regs[key] = max(regs.get(key, 0), rho)
    for r in rows:
        week_regs = {j: v for (w, j), v in regs.items() if w == r.week}
        s_int = sum(
            1 << (HLL_RHO_MAX - v) for v in week_regs.values()
        ) + (HLL_M - len(week_regs)) * (1 << HLL_RHO_MAX)
        assert r.s_int == s_int, r.week
        assert r.zero_registers == HLL_M - len(week_regs), r.week
