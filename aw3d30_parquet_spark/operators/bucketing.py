"""Bucketed (co-located) joins: shuffle elimination for fact-fact joins.

SURVEY §2.2 scale posture: "big joins shuffle on their keys … use
bucketing for co-located joins". A table bucketed by its join key with
the same bucket count as its peer joins with NO Exchange on either side
— at 100 TB that removes the dominant cost of a fact-fact join (the
reference never joins, so this is pure engine surface).

Bucketing requires a managed table (metastore records the bucket spec),
hence ``saveAsTable`` rather than a bare ``parquet(path)`` write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table bucketed (and sorted) by key."""
    w = df.write.bucketBy(buckets, key).mode("overwrite")
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys; Catalyst
    plans a SortMergeJoin with zero Exchange nodes."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], "inner")
