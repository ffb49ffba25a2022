"""Arrow-UDF surface: scalar / GROUPED_AGG pandas_udf, applyInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aw3d30_parquet_spark.functions import udfs, vectors
from aw3d30_parquet_spark.oracle import compare
from aw3d30_parquet_spark.session import register_views

SF = "/root/testdata/sf0.001"


def test_u01_median_oracle(spark, duck_t2):
    df = udfs.u01_grouped_agg_median(spark, "/root/testdata/sf0.01")
    ok, h1, h2 = compare(df, duck_t2, udfs.ORACLE_SQL["u01_grouped_agg_median"])
    assert ok, (h1, h2)


def test_u02_centroids_vs_numpy(spark):
    got = {r.label: r for r in udfs.label_centroids(spark, SF).collect()}
    register_views(spark, SF)
    rows = spark.table("embeddings").select("label", "embedding").collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.embedding)
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        m = np.array(vecs, dtype=np.float64)
        c = m.mean(axis=0)
        d = np.sqrt(((m - c) ** 2).sum(axis=1))
        assert got[label].n == len(vecs)
        assert got[label].centroid_norm == pytest.approx(
            float(np.sqrt((c * c).sum())), abs=1e-9
        )
        assert got[label].mean_dist == pytest.approx(float(d.mean()), abs=1e-9)


def test_u03_scalar_pandas_udf_matches_builtin_cosine(spark):
    """Same cosine, two execution paths: Arrow pandas UDF vs built-in
    higher-order functions — results agree on every row."""
    udf_scores = {
        r.vec_id: r.cos for r in udfs.scalar_cosine_scores(spark, SF).collect()
    }
    register_views(spark, SF)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    builtin = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                vectors.cosine(F.col("embedding"), F.col("q_emb")), 4
            ).alias("cos"),
        )
    )
    builtin_scores = {r.vec_id: r.cos for r in builtin.collect()}
    assert udf_scores == builtin_scores
    assert len(udf_scores) == 499
