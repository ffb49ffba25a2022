"""Driver-contract surface invariants (__spark_entry__.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as contract


def test_every_oracle_names_a_registered_query():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    # the rows-only set is small and deliberate (sketches + recall ops)
    assert len(set(qs) - set(oracles)) <= 20


def test_rotation_puts_never_checked_queries_first():
    """The driver's per-round CORRECTNESS capture is bounded, so
    registration order decides coverage: names with no row in any
    CORRECTNESS_r*.json must form the dict's prefix, interleaved
    across families so any capture prefix samples the whole surface."""
    qs = list(contract.queries())
    checked = contract._driver_checked()
    if not checked:
        pytest.skip("no CORRECTNESS files yet (round 1)")
    fresh = [n for n in qs if n not in checked]
    assert qs[: len(fresh)] == fresh
    if len(fresh) >= 6:
        assert len({n[0] for n in fresh[:6]}) >= 3


def test_query_names_are_unique_3char_coded():
    """bench.py's short-key fallback truncates names to 3 chars —
    that stays collision-free only while the 3-char family codes are
    unique."""
    qs = list(contract.queries())
    codes = [n[:3] for n in qs]
    assert len(set(codes)) == len(codes)
