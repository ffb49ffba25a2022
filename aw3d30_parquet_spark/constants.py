"""Cross-engine numeric constants shared by operators and oracle SQL.

Spark-free on purpose: ``queries.py`` (the DuckDB oracle contract)
embeds these values into SQL text, and DuckDB-only tooling must be
able to import that module without a Spark installation. Anything
here must stay importable with nothing but the standard library.

HLL constants (a10, the hand-built HyperLogLog distinct rollup —
``operators/relational.py`` ``a10_hll_distinct_rollup``): the Spark
operator and the DuckDB oracle each rebuild the sketch from the same
md5-prefix hash, so the two sides MUST share these bit-for-bit. The
α·m²·2^53 numerator is ONE double literal used by both engines; the
weekly estimate is that constant divided by the exact integer
harmonic sum, so the only float ops are a single division + rounding
— deterministic under any merge order.
"""

from __future__ import annotations

HLL_P = 8  # register-index bits
HLL_M = 1 << HLL_P  # 256 registers (σ ≈ 1.04/√m ≈ 6.5 %)
#: rho ceiling: the 60-bit md5 hash leaves 52 bits after the register
#: index; a sentinel bit at 2^52 bounds rho ≤ 53 and handles w = 0
HLL_RHO_MAX = 53
#: α_m · m² / 2^-53 as ONE double literal shared by both engines (see
#: module docstring)
HLL_ALPHA_NUM = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(
    1 << HLL_RHO_MAX
)
