"""Cross-engine deterministic float rounding.

The ONE named home of the determinism-critical idiom the oracle
contract depends on: ``floor(x·10^s + 0.5) / 10^s``. Spark's
``round()`` on doubles goes through the value's shortest-decimal
BigDecimal (HALF_UP on the decimal repr) while DuckDB rounds in
double arithmetic — the two can disagree exactly at 10^-s half
boundaries. Floor-half-up is pure IEEE arithmetic, computed
identically by both engines on identical doubles, so a Spark column
built with :func:`round_half_up` hash-matches a DuckDB expression of
the form ``CAST(floor(x * 10^s + 0.5) AS BIGINT) / 10^s.0`` whenever
the underlying doubles agree (residual risk: a last-ulp libm
divergence landing exactly on a boundary — ~1e-13 per row for
transcendental inputs, zero for exact int/int ratios).

Every oracle-checked float column in the package routes through this
contract (u02/u03 migrated round 4; u01 and the remaining
F.round↔DuckDB-round pairs — q06/q11/q13 and the rest of the Q-suite,
g01/g05/g09/g10, m01/m02, k01, b01 — migrated round 5); use this
helper (or the literal ``CAST(floor(x * 10^s + 0.5) AS BIGINT) /
10^s.0`` form in shared SQL) for any new oracle-checked float column.
``F.round`` survives only on rows-only queries with no DuckDB twin
(v03/v05/v06 and unregistered helpers — d05/d06 left this set in
round 5 when their outputs became md5-based and oracle-checked) and
in Python-side sketch internals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int) -> Column:
    """``floor(col·10^scale + 0.5) / 10^scale`` as a double column."""
    f = 10**scale
    return F.floor(col * f + 0.5).cast("bigint") / float(f)
