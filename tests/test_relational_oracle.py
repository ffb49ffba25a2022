"""t2 correctness gate: every declared query hash-matches DuckDB (sf0.01)."""

import pytest

from aw3d30_parquet_spark.operators.relational import (
    RELATIONAL_QUERIES,
    ROWS_ONLY,
)
from aw3d30_parquet_spark.oracle import compare
from aw3d30_parquet_spark.queries import ORACLE_SQL

from tests.conftest import SF_SMOKE, SF_T2


def test_contract_complete():
    # every oracle names a real query; only the declared ROWS_ONLY
    # registry (sketch registers — not oracle-hashable, SURVEY §2.3
    # exclusions) may lack one. Derived, not hard-coded: registering a
    # new rows-only query means adding it to relational.ROWS_ONLY, and
    # this can only fail on a genuinely inconsistent registration.
    assert set(ORACLE_SQL) <= set(RELATIONAL_QUERIES)
    assert ROWS_ONLY <= set(RELATIONAL_QUERIES)
    assert set(RELATIONAL_QUERIES) - set(ORACLE_SQL) == set(ROWS_ONLY)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_match(spark, duck_t2, name):
    sdf = RELATIONAL_QUERIES[name](spark, SF_T2)
    ok, h1, h2 = compare(sdf, duck_t2, ORACLE_SQL[name])
    assert ok, f"{name}: spark hash {h1} != duckdb hash {h2}"


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_smoke_sf0001(spark, name):
    # t1: every query runs at sf0.001 and returns a stable schema.
    df = RELATIONAL_QUERIES[name](spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0
