"""Partition-independence of rounded float aggregates (SURVEY §7.3).

Round 1's driver flaked q41 because Spark's central-moment aggregates
merge partials in partition order. Every grouped rounded-double query is
now derived from exact integer sums; this suite pins that property by
hashing each one under two very different ``spark.sql.shuffle.partitions``
settings — the hashes must be identical bit-for-bit.
"""

from __future__ import annotations

import pytest

from aw3d30_parquet_spark.operators.relational import RELATIONAL_QUERIES
from aw3d30_parquet_spark.oracle import canonical_hash

SF = "/root/testdata/sf0.01"

#: every query whose output contains a rounded aggregate over a float
#: column (grouped sums/avgs; windows are frame-ordered, not merge-order)
RISKY = [
    "q06_star_join",
    "q11_group_agg",
    "q13_rollup",
    "q24_cond_math",
    "q30_cube",
    "q33_fact_fact_join",
    "q34_full_outer_join",
    # not a float case: pins that q38's two-branch range partitioning
    # (rank derivation) is self-consistent under any shuffle setting
    "q38_ntile",
    "q41_stat_agg",
    "q43_having",
    "q56_unpivot",
    "q59_group_by_all",
]


@pytest.mark.parametrize("name", RISKY)
def test_hash_stable_across_partitioning(spark, name):
    fn = RELATIONAL_QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        h_few = canonical_hash(fn(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        h_many = canonical_hash(fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert h_few == h_many, f"{name} hash depends on partitioning"
