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


def test_reliable_checkpoint_dir_produces_identical_ranks(
    spark, tmp_path
):
    """With spark.graft.checkpointDir set the interim goes through a
    reliable checkpoint (sc.setCheckpointDir + df.checkpoint) — the
    multi-executor path — and every rank is identical to the
    localCheckpoint default."""
    base = _ranked(spark).select("key", "id", "_r", "_n")
    spark.conf.set("spark.graft.checkpointDir", str(tmp_path / "ckpt"))
    try:
        reliable = _ranked(spark).select("key", "id", "_r", "_n")
        assert base.exceptAll(reliable).isEmpty()
        assert reliable.exceptAll(base).isEmpty()
        assert spark.sparkContext.getCheckpointDir() is not None
    finally:
        spark.conf.unset("spark.graft.checkpointDir")


def test_rerank_after_data_change_sees_new_data(spark, tmp_path):
    """No cross-call memo: re-running the same rank query after the
    files at the same path change must rank the NEW rows (the round-2
    memo keyed on the analyzed plan would have served the stale
    checkpoint)."""
    p = str(tmp_path / "t")
    spark.range(10).write.mode("overwrite").parquet(p)
    r1 = with_global_rank(spark.read.parquet(p), [F.col("id")])
    assert r1.agg(F.max("_n")).first()[0] == 10
    spark.range(25).write.mode("overwrite").parquet(p)
    r2 = with_global_rank(spark.read.parquet(p), [F.col("id")])
    assert r2.agg(F.max("_n")).first()[0] == 25
    assert r2.agg(F.max("_r")).first()[0] == 25


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
