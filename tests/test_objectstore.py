"""Object-store wiring (s3a) — network-free: conf plumbing + the URI
scan path over file:// (same binaryFile code path as s3a://)."""

from __future__ import annotations

import os

from aw3d30_parquet_spark.sources.geotiff import read_tiles
from aw3d30_parquet_spark.sources.objectstore import (
    DEFAULT_PREFIX,
    configure_s3a,
    tile_source_uri,
)
from aw3d30_parquet_spark.plans import formatted_plan


def test_tile_source_uri():
    assert tile_source_uri("raster") == "s3a://raster/AW3D30/AW3D30_global/"
    assert tile_source_uri("b", "p") == "s3a://b/p/"
    assert DEFAULT_PREFIX.endswith("/")


def test_configure_s3a_sets_hadoop_confs(spark):
    configure_s3a(
        spark,
        endpoint="http://localstack:4566",
        anonymous=True,
        path_style_access=True,
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localstack:4566"
    assert "Anonymous" in hconf.get("fs.s3a.aws.credentials.provider")
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.experimental.input.fadvise") == "sequential"


def test_uri_scan_prunes_like_local_path(spark, tmp_path):
    """read_tiles over a file:// URI (the same Hadoop-FS URI code path
    an s3a:// prefix takes) must produce the identical pruned listing
    and rows as the plain local path."""
    from tests.test_geotiff import FIXTURE_COORDS, _write_fixture_tiles

    d = tmp_path / "tiles"
    d.mkdir()
    _write_fixture_tiles(str(d), FIXTURE_COORDS)
    (d / "README.txt").write_text("not a tile")

    plain = read_tiles(spark, str(d), "netherlands")
    via_uri = read_tiles(spark, f"file://{d}", "netherlands")
    assert via_uri.count() == plain.count() > 0
    # same plan shape as the local path: shuffle-free scan → decode
    plan = formatted_plan(via_uri)
    assert "Exchange" not in plan
    assert "mapinpandas" in plan.lower()
