"""CSV/JSON file source smoke (SURVEY §2.2 scans: "smoke only") —
round-trip the region table through both formats with explicit schemas
(at scale: schema-on-read, never inference over the full input)."""

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
