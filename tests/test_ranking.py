"""Distributed global rank: exactness at sizes past the range sampler.

The 10x probe caught with_global_rank corrupting offsets when its two
branches re-executed repartitionByRange with different sampled
boundaries (RDD-id-seeded). These tests pin the fix at a size where
partitions far exceed the sampler's per-partition take.
"""

from pyspark.sql import functions as F

from aw3d30_parquet_spark.operators.ranking import ntile_expr, with_global_rank

N = 200_000


def _ranked(spark):
    df = spark.range(N).select(
        (F.xxhash64("id") % 1000).alias("key"), F.col("id")
    )
    return with_global_rank(df, [F.col("key"), F.col("id")])


def test_global_rank_is_exact_permutation(spark):
    r = _ranked(spark)
    agg = r.agg(
        F.count("*").alias("n"),
        F.min("_r").alias("lo"),
        F.max("_r").alias("hi"),
        F.count_distinct("_r").alias("d"),
        F.max("_n").alias("total"),
    ).first()
    assert (agg.n, agg.lo, agg.hi, agg.d, agg.total) == (N, 1, N, N, N)


def test_global_rank_matches_order(spark):
    # rank 1 must be the (key, id) minimum; rank N the maximum
    r = _ranked(spark)
    ends = {row._r: (row.key, row.id) for row in r.filter(
        (F.col("_r") == 1) | (F.col("_r") == N)
    ).collect()}
    lo = r.agg(F.min(F.struct("key", "id"))).first()[0]
    hi = r.agg(F.max(F.struct("key", "id"))).first()[0]
    assert ends[1] == (lo.key, lo.id)
    assert ends[N] == (hi.key, hi.id)


def test_ntile_phases_equal_width(spark):
    r = _ranked(spark)
    widths = (
        r.select(ntile_expr("_r", "_n", 8).alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    assert len(widths) == 8
    assert {w["count"] for w in widths} == {N // 8}
