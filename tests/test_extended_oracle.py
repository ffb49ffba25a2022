"""Extended (LLM-pipeline) ops: driver-style DuckDB oracle checks for the
SQL-expressible subset, at sf0.01."""

import pytest

from aw3d30_parquet_spark.functions import EXTENDED_ORACLE_SQL, EXTENDED_QUERIES
from aw3d30_parquet_spark.oracle import compare

from tests.conftest import SF_T2


def test_every_oracle_has_query():
    assert set(EXTENDED_ORACLE_SQL) <= set(EXTENDED_QUERIES)


@pytest.mark.parametrize("name", sorted(EXTENDED_ORACLE_SQL))
def test_extended_oracle_match(spark, duck_t2, name):
    sdf = EXTENDED_QUERIES[name](spark, SF_T2)
    ok, h1, h2 = compare(sdf, duck_t2, EXTENDED_ORACLE_SQL[name])
    assert ok, f"{name}: spark hash {h1} != duckdb hash {h2}"
