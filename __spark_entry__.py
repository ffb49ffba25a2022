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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from aw3d30_parquet_spark.operators.relational import RELATIONAL_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)

    from aw3d30_parquet_spark.functions import EXTENDED_QUERIES

    out.update(EXTENDED_QUERIES)

    from aw3d30_parquet_spark.sources import demo

    out.update(demo.QUERIES)

    from aw3d30_parquet_spark.streaming import events as streaming_events

    out.update(streaming_events.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for ops that are
    not SQL-expressible — driver then records a rows-only check)."""
    from aw3d30_parquet_spark.queries import ORACLE_SQL

    out: dict[str, str] = {}
    out.update(ORACLE_SQL)

    from aw3d30_parquet_spark.functions import EXTENDED_ORACLE_SQL

    out.update(EXTENDED_ORACLE_SQL)

    from aw3d30_parquet_spark.sources import demo

    out.update(demo.ORACLE_SQL)

    from aw3d30_parquet_spark.streaming import events as streaming_events

    out.update(streaming_events.ORACLE_SQL)
    return out
