"""Salted join: result-identical to the plain join, hot key spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from aw3d30_parquet_spark.operators.skew import salted_join
from aw3d30_parquet_spark.oracle import canonical_hash
from aw3d30_parquet_spark.session import register_views

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain(spark):
    """documents.lang is skewed (en dominates); join to a per-lang stats
    dim with salting — rows identical to the unsalted join."""
    register_views(spark, SF)
    docs = spark.table("documents").select("doc_id", "lang")
    dim = (
        spark.table("documents")
        .groupBy("lang")
        .agg(F.count("*").alias("lang_docs"))
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        salted = salted_join(docs, dim, "lang", n_salts=8).toPandas()
        plain = docs.join(dim, "lang", "inner").toPandas()
        assert len(salted) == len(plain) == 500
        assert canonical_hash(salted) == canonical_hash(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salt_spreads_hot_key(spark):
    """The hot key's rows land on multiple salts (no single straggler)."""
    register_views(spark, SF)
    docs = spark.table("documents").select("doc_id", "lang")
    from aw3d30_parquet_spark.operators.skew import salted_join as _  # noqa: F401
    from pyspark.sql import functions as F

    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int")
    hot = (
        docs.withColumn("_salt", salt)
        .filter(F.col("lang") == "en")
        .select("_salt")
        .distinct()
        .count()
    )
    assert hot >= 4  # en rows spread over at least half the salt space


def test_k01_driver_query_shuffles_on_key_and_salt(spark):
    """The registered k01 query: with broadcast off, the join's shuffle
    partitioning carries BOTH the join key and the salt — the hot key's
    rows spread across n_salts shuffle partitions."""
    import re

    from aw3d30_parquet_spark.operators.skew import salted_hot_join
    from aw3d30_parquet_spark.plans import formatted_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(salted_hot_join(spark, SF))
        assert re.search(
            r"hashpartitioning\(c_custkey[^)]*_salt", plan
        ), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_k01_matches_plain_join_rollup(spark):
    """k01's salted rollup equals the plain-join rollup bit-for-bit."""
    from aw3d30_parquet_spark.operators.relational import (
        _cents,
        _exact_money_sum,
        _t,
    )
    from aw3d30_parquet_spark.operators.skew import salted_hot_join
    from aw3d30_parquet_spark.oracle import canonical_hash

    orders = _t(spark, SF, "orders")
    customer = spark.table("customer")
    hot = orders.select(
        F.when(F.col("o_custkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        "o_totalprice",
    )
    plain = (
        hot.join(customer.select("c_custkey", "c_mktsegment"), "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _exact_money_sum(_cents(F.col("o_totalprice")), "total"),
        )
        .orderBy("c_mktsegment")
        .toPandas()
    )
    salted = salted_hot_join(spark, SF).toPandas()
    assert len(salted) == len(plain) > 0
    assert canonical_hash(salted) == canonical_hash(plain)
