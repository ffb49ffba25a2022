"""Property tests for the float-free numeric formulations: the integer
identities the oracle-stable queries rely on must agree with their
textbook float forms on arbitrary inputs (no Spark needed — pure math)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=5, max_size=20),
    st.integers(min_value=0, max_value=10_000),
)
def test_q70_integer_inequality_equals_zscore(window, v):
    """(v·n − s1)² > 9·(n·s2 − s1²)  ⟺  z² > 9 (population σ), except
    exactly at the boundary where float rounding is undefined — which
    is precisely why the integer form is the one that ships."""
    n = len(window)
    s1 = sum(window)
    s2 = sum(x * x for x in window)
    lhs = (v * n - s1) ** 2
    rhs = 9 * (n * s2 - s1 * s1)
    flag_int = lhs > rhs

    mu = s1 / n
    var = s2 / n - mu * mu
    if var <= 0:
        # constant window: integer form flags any v ≠ μ (infinite z)
        assert flag_int == (v * n != s1)
        return
    z2 = (v - mu) ** 2 / var
    # away from the boundary the two forms must agree exactly
    if abs(z2 - 9.0) > 1e-6:
        assert flag_int == (z2 > 9.0), (window, v, z2)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=100),
)
def test_p10_greedy_prefix_budget_bound(tok_counts, pct):
    """The exclusive-cumsum keep rule overshoots the target by at most
    one document, and keeps everything when the target covers the
    stratum."""
    target = sum(tok_counts) * pct // 100
    kept = []
    cum = 0
    for t in tok_counts:
        if cum < target:
            kept.append(t)
        cum += t
    overshoot = sum(kept) - target
    assert overshoot <= max(tok_counts)
    if target >= sum(tok_counts):
        assert kept == tok_counts


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_m04_energy_roundtrip_exact(doc_id):
    """RMS → round(rms²·n) recovers the exact integer sum-of-squares
    for any fabricated audio payload (the m04 invariant)."""
    s = doc_id % 256
    n = 256 + (doc_id % 10) * 64
    x = ((s + np.arange(n)) % 4096 - 2048).astype(np.float64)
    sumsq = int((x * x).sum())
    rms = math.sqrt(sumsq / n)
    assert round(rms * rms * n) == sumsq
