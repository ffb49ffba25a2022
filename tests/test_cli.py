"""CLI shim (python -m aw3d30_parquet_spark) — mirrors the reference
binary's option surface (src/main.rs:42-66: tif dir, parquet dir, set)."""

from __future__ import annotations

import duckdb

from aw3d30_parquet_spark.__main__ import main


def test_cli_ingest_demo_writes_partition_tree(spark, tmp_path):
    tif = str(tmp_path / "tif")
    out = str(tmp_path / "parquet")
    rc = main(
        [
            "ingest",
            "--set",
            "netherlands",
            "--demo",
            "--tif-dir",
            tif,
            "--parquet-dir",
            out,
        ]
    )
    assert rc == 0
    got = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*/*/*.parquet')"
    ).fetchone()[0]
    assert got > 0
    # re-run is a no-op (skip-if-exists, reference src/main.rs:144-146)
    assert main(
        ["ingest", "--set", "netherlands", "--demo", "--tif-dir", tif,
         "--parquet-dir", out]
    ) == 0
    again = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*/*/*.parquet')"
    ).fetchone()[0]
    assert again == got


def test_cli_query_unknown_name_errors(spark):
    assert main(["query", "--name", "nope", "--repo-root", "/root/repo"]) == 2
