import os

import pytest

os.environ.setdefault("TZ", "UTC")

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from aw3d30_parquet_spark.session import get_spark

    spark = get_spark(app_name="aw3d30-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck_t2():
    from aw3d30_parquet_spark.oracle import duckdb_connection

    return duckdb_connection(SF_T2)
