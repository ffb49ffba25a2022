"""CSV/JSON file sources (SURVEY §2.2) — roundtrips with explicit
schemas (at scale: schema-on-read, never inference over the full
input), plus the registered f01 query joining file-sourced dims to the
Parquet fact view."""

from __future__ import annotations

from aw3d30_parquet_spark.session import register_views


def test_csv_roundtrip(spark, tmp_path):
    register_views(spark, "/root/testdata/sf0.001")
    region = spark.table("region")
    path = str(tmp_path / "region_csv")
    region.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(region.schema)
        .option("header", True)
        .csv(path)
    )
    key = lambda d: d["r_regionkey"]  # noqa: E731
    assert sorted((r.asDict() for r in back.collect()), key=key) == sorted(
        (r.asDict() for r in region.collect()), key=key
    )


def test_json_roundtrip(spark, tmp_path):
    register_views(spark, "/root/testdata/sf0.001")
    region = spark.table("region")
    path = str(tmp_path / "region_json")
    region.write.mode("overwrite").json(path)
    back = spark.read.schema(region.schema).json(path)
    key = lambda d: d["r_regionkey"]  # noqa: E731
    assert sorted((r.asDict() for r in back.collect()), key=key) == sorted(
        (r.asDict() for r in region.collect()), key=key
    )


def test_f01_file_sourced_dims_match_parquet_dims(spark):
    """f01's file-sourced join must equal the same join computed from
    the original Parquet views — the roundtrip-lossless claim its
    driver oracle certifies, pinned locally too."""
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.sources.files import csv_json_roundtrip_join

    sf = "/root/testdata/sf0.001"
    via_files = csv_json_roundtrip_join(spark, sf)
    register_views(spark, sf)
    direct = (
        spark.table("customer")
        .join(
            spark.table("nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            spark.table("region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.count_distinct("n_nationkey").alias("n_nations"),
            F.sum(
                F.floor(F.col("c_acctbal") * 100).cast("long")
            ).alias("acctbal_cents"),
        )
        .orderBy("r_name")
    )
    assert [r.asDict() for r in via_files.collect()] == [
        r.asDict() for r in direct.collect()
    ]


def test_f01_reads_actually_come_from_csv_and_json(spark):
    """The read-back plan must scan csv/json relations, not secretly
    reuse the Parquet views."""
    from aw3d30_parquet_spark.sources.files import csv_json_roundtrip_join

    plan = csv_json_roundtrip_join(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "csv" in plan.lower()
    assert "json" in plan.lower()


def test_f02_orc_roundtrip_matches_parquet(spark):
    """f02's ORC-sourced join must equal the same join from the
    original Parquet views (roundtrip-lossless), and the part
    read-back must show PRUNED partitions: only the F02_BRANDS
    directories are scanned."""
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.sources.files import (
        F02_BRANDS,
        orc_roundtrip_join,
    )

    sf = "/root/testdata/sf0.001"
    via_orc = orc_roundtrip_join(spark, sf)
    register_views(spark, sf)
    li = spark.table("lineitem")
    part = spark.table("part").filter(
        F.col("p_brand").isin(*F02_BRANDS)
    )
    direct = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            spark.table("supplier"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.count_distinct("s_suppkey").alias("n_supp"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                ).cast("long")
            ).alias("revenue_cents"),
        )
        .orderBy("p_brand")
    )
    assert [r.asDict() for r in via_orc.collect()] == [
        r.asDict() for r in direct.collect()
    ]
    plan = via_orc._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    # partition pruning: the brand predicate must appear in the scan's
    # PartitionFilters entry specifically — 'p_brand' alone would match
    # the projection/groupBy nodes even with pruning regressed
    pf_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert pf_lines, "ORC scan should carry a PartitionFilters entry"
    assert any("p_brand" in ln for ln in pf_lines), pf_lines
