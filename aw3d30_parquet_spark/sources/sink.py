"""Partitioned Parquet sink with idempotent (skip-if-exists) ingest.

The reference writes one Snappy Parquet file per tile, named after the
tile key, and skips tiles whose output already exists (``src/main.rs:
144-146`` for downloads, ``:171`` for conversions) — re-running the
pipeline only does new work.

Spark-first equivalent: Hive-style ``partitionBy(tile_lat, tile_lon)``
layout (so every downstream query gets partition pruning on tile
coordinates for free — strictly better than coordinates encoded in file
names), and idempotency at the *work-list* level: already-ingested tile
partitions are subtracted from the pending tile set before any raster
byte is read. The subtraction runs on metadata (≤ 64 800 tile keys for
the whole world — kilobytes), exactly like the reference's skip check
runs on local paths, so doing it driver-side costs nothing at 100 TB;
the data plane stays a pure scan→decode→write stage with no shuffle.
"""

from __future__ import annotations

import os
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from aw3d30_parquet_spark.sources.geotiff import read_tiles, tiles_for_set

_PART_RE = re.compile(r"^tile_lat=(-?\d+)$")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-scheme URI — the listing layer
    that works identically on local paths, file://, and s3a:// (the
    ``os.path`` calls this replaces silently see object-store URIs as
    absent local paths, which breaks the idempotency contract there)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _fs_listdir(fs, hpath) -> list[str]:
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def existing_tiles(
    out_dir: str, spark: SparkSession | None = None
) -> set[tuple[int, int]]:
    """Tile coordinates already present in the partitioned output layout.

    Reads only directory names (``tile_lat=N/tile_lon=M``) — the manifest
    is the partition tree itself, no data files are opened. With a
    ``spark`` session the walk goes through the Hadoop FileSystem API,
    so it is two LIST calls per lat on an object store too; without one
    it falls back to ``os`` (local paths only).
    """
    done: set[tuple[int, int]] = set()
    if spark is not None or "://" in out_dir:
        if spark is None:
            raise ValueError(
                f"{out_dir!r} is a filesystem URI — pass the SparkSession "
                "so the listing can go through the Hadoop FileSystem API"
            )
        fs, root = _hadoop_fs(spark, out_dir)
        if not fs.exists(root):
            return done
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        for lat_dir in _fs_listdir(fs, root):
            m = _PART_RE.match(lat_dir)
            if m is None:
                continue
            lat = int(m.group(1))
            lat_path = jvm_path(root, lat_dir)
            for lon_dir in _fs_listdir(fs, lat_path):
                if lon_dir.startswith("tile_lon="):
                    files = _fs_listdir(fs, jvm_path(lat_path, lon_dir))
                    if any(f.endswith(".parquet") for f in files):
                        done.add((lat, int(lon_dir.split("=", 1)[1])))
        return done
    if not os.path.isdir(out_dir):
        return done
    for lat_dir in os.listdir(out_dir):
        m = _PART_RE.match(lat_dir)
        if m is None:
            continue
        lat = int(m.group(1))
        for lon_dir in os.listdir(os.path.join(out_dir, lat_dir)):
            if lon_dir.startswith("tile_lon="):
                # a partition dir is only "done" if it holds data files
                p = os.path.join(out_dir, lat_dir, lon_dir)
                if any(f.endswith(".parquet") for f in os.listdir(p)):
                    done.add((lat, int(lon_dir.split("=", 1)[1])))
    return done


def write_tiles(df: DataFrame, out_dir: str, mode: str = "append") -> None:
    """Point DataFrame → Hive-partitioned Snappy Parquet.

    Snappy is Spark's default codec, matching the reference's writer
    properties (``src/main.rs:294-296``). One output file per (tile,
    task) — for a binaryFile-scanned input that is one file per tile,
    the reference's layout (``src/main.rs:195``).
    """
    df.write.mode(mode).partitionBy("tile_lat", "tile_lon").parquet(out_dir)


def ingest_tiles(
    spark: SparkSession,
    tif_dir: str,
    out_dir: str,
    set_name: str = "world",
    chunk_rows: int = 512_000,
    metrics: dict | None = None,
    on_corrupt: str = "fail",
) -> Sequence[tuple[int, int]]:
    """Idempotent region ingest: decode + write only not-yet-done tiles.

    Returns the tile coordinates ingested this run (empty on a re-run —
    the G2 idempotency contract, mirroring ``src/main.rs:144-146,171``).

    Observability (the reference's R8: ``tracing`` spans with per-
    operator instrumentation, ``src/main.rs:135,163,229-231``): pass a
    dict as ``metrics`` and it is filled with the executed job's row/
    tile counts, collected via ``df.observe`` — measured on the running
    plan itself, no second pass over the data.
    """
    done = existing_tiles(out_dir, spark)
    pending = sorted(set(tiles_for_set(set_name)) - done)
    if not pending:
        if metrics is not None:
            metrics.update(rows_written=0, tiles_written=0, skipped_tiles=len(done))
        return []
    df = read_tiles(
        spark, tif_dir, set_name, chunk_rows, exclude_tiles=done,
        on_corrupt=on_corrupt,
    )
    if metrics is not None:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation("ingest")
        # observe() disallows distinct aggregates (CollectMetrics must
        # merge in one pass) — the HLL++ sketch is the observable form
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_written"),
            F.approx_count_distinct(
                F.col("tile_lat") * 1000 + F.col("tile_lon")
            ).alias("tiles_written"),
        )
        write_tiles(df, out_dir, mode="append")
        metrics.update(obs.get)
        metrics["skipped_tiles"] = len(done)
    else:
        write_tiles(df, out_dir, mode="append")
    done_after = existing_tiles(out_dir, spark)  # ONE post-write walk
    return [t for t in pending if t in done_after]


def _stream_points(
    spark: SparkSession,
    tif_dir: str,
    set_name: str,
    chunk_rows: int,
    on_corrupt: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Shared streaming source for both streaming sinks: binaryFile
    arrivals → region prune on metadata → mapInPandas decode. ONE
    definition so the glob, schema, and corrupt-handling cannot
    silently diverge between ingest and rollup."""
    from aw3d30_parquet_spark.session import ship_package
    from aw3d30_parquet_spark.sources.geotiff import (
        POINT_SCHEMA,
        _decode_partition,
        _region_pruned_files,
    )

    ship_package(spark)
    # binaryFile's fixed schema, stated explicitly (streaming file
    # sources cannot infer)
    binary_file_schema = (
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "ALPSMLC30_*_DSM.tif")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(tif_dir).select("path", "content")
    return _region_pruned_files(files, set_name).mapInPandas(
        lambda it: _decode_partition(it, chunk_rows, on_corrupt),
        schema=POINT_SCHEMA,
    )


def stream_ingest_tiles(
    spark: SparkSession,
    tif_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    set_name: str = "world",
    chunk_rows: int = 512_000,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    on_corrupt: str = "skip",
):
    """Continuous tile ingest: new ``.tif`` arrivals → partitioned
    Parquet, exactly once.

    The batch pipeline as a Structured Streaming query — the file
    source's checkpoint replaces the partition-tree manifest as the
    idempotency mechanism (the reference's skip-if-exists,
    ``src/main.rs:144-146``, upgraded to transactional exactly-once: a
    tile is decoded and committed exactly once even across restarts
    and mid-batch crashes). Region pruning still runs on file metadata
    before any tile byte is read; the data plane stays the same
    shuffle-free scan → mapInPandas decode → partitioned write.

    ``on_corrupt`` matters MORE here than in batch: the file source's
    checkpoint marks a file processed even when the decode skipped it,
    and re-uploading the same path is never re-read — so ``"skip"``
    (the default, keeps the stream alive) drops a corrupt tile
    PERMANENTLY (watch executor logs), while ``"fail"`` stops the query
    and re-attempts the batch on restart until the bytes are fixed
    in place. Choose per pipeline: availability vs completeness.

    ``available_now=True`` drains everything currently in the
    directory then stops (incremental backfill); ``False`` keeps
    watching for new tiles (a live feed off an object-store landing
    prefix). Returns the started StreamingQuery — callers own
    ``awaitTermination()``.
    """
    pts = _stream_points(
        spark, tif_dir, set_name, chunk_rows, on_corrupt, max_files_per_trigger
    )
    writer = (
        pts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("tile_lat", "tile_lon")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_tiles(
    spark: SparkSession,
    out_dir: str,
    target_rows_per_file: int = 13_000_000,
    tiles: Sequence[tuple[int, int]] | None = None,
    zorder: bool = False,
    zorder_bits: int = 12,
) -> dict:
    """Small-file compaction of the partitioned point tree (OPTIMIZE).

    Incremental ingests (especially the streaming sink, which commits
    one file per tile per micro-batch, and chunked decodes, which emit
    one file per Arrow batch) fragment tile partitions; parquet scan
    cost at 100 TB is dominated by file count long before byte count
    (task scheduling, footer reads, object-store GETs). This rewrites
    fragmented partitions into ~``target_rows_per_file``-row files —
    one file per 3600² AW3D30 tile at the default.

    Spark-first mechanics, safe against partial failure:
    - only partitions with >1 file (or more files than needed) are
      rewritten — ``tiles=None`` selects them by listing the partition
      tree, metadata only;
    - the rewrite is one job: read ONLY those partitions (partition
      pruning on tile_lat/tile_lon), ``maxRecordsPerFile`` bounds
      output file size, and **dynamic partition overwrite** swaps each
      partition atomically at commit — readers never see a partial
      partition, untouched partitions are never rewritten.

    ``zorder=True`` additionally rewrites each tile's ROWS in Morton
    order of the in-tile cell (lat/lon quantized to ``zorder_bits``
    each, interleaved by ``operators.zorder.zvalue``): parquet writes
    row groups in row order, so a z-ordered file's row-group min/max
    stats are tight on BOTH coordinates and a lat- OR lon-box query
    skips most row groups — the OPTIMIZE ZORDER maintenance step on
    the tile tree, from stock primitives (sortWithinPartitions; no
    extra shuffle beyond the compaction's own repartition).

    Returns ``{"compacted_tiles": n, "files_before": a, "files_after": b}``.
    """
    from pyspark.sql import functions as F

    def _files_per_tile() -> dict[tuple[int, int], int]:
        out: dict[tuple[int, int], int] = {}
        if "://" in out_dir:
            fs, root = _hadoop_fs(spark, out_dir)
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path
            for la, lo in existing_tiles(out_dir, spark):
                p = jvm_path(root, f"tile_lat={la}/tile_lon={lo}")
                out[(la, lo)] = sum(
                    n.endswith(".parquet") for n in _fs_listdir(fs, p)
                )
            return out
        for la, lo in existing_tiles(out_dir):
            p = os.path.join(out_dir, f"tile_lat={la}", f"tile_lon={lo}")
            out[(la, lo)] = sum(f.endswith(".parquet") for f in os.listdir(p))
        return out

    before = _files_per_tile()
    wanted = None if tiles is None else set(tiles)
    victims = [
        t
        for t, n in sorted(before.items())
        if n > 1 and (wanted is None or t in wanted)
    ]
    if not victims:
        return {"compacted_tiles": 0, "files_before": sum(before.values()),
                "files_after": sum(before.values())}
    df = spark.read.parquet(out_dir)
    # victim selection as a broadcast semi-join, not an IN-list of
    # struct literals: at fleet scale (thousands of fragmented tiles)
    # the literal list bloats the plan; the join prunes partitions at
    # runtime via dynamic partition pruning under AQE
    vdf = spark.createDataFrame(
        list(victims), "tile_lat INT, tile_lon INT"
    )
    frag = df.join(F.broadcast(vdf), ["tile_lat", "tile_lon"], "left_semi")
    old_conf = {
        "spark.sql.sources.partitionOverwriteMode": spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        ),
        "spark.sql.files.maxRecordsPerFile": spark.conf.get(
            "spark.sql.files.maxRecordsPerFile", "0"
        ),
    }
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark.conf.set(
            "spark.sql.files.maxRecordsPerFile", str(target_rows_per_file)
        )
        rewrite = frag.repartition("tile_lat", "tile_lon")
        if zorder:
            from aw3d30_parquet_spark.operators.zorder import zvalue

            scale = float(1 << zorder_bits)
            yq = F.least(
                F.lit((1 << zorder_bits) - 1),
                F.floor(
                    (F.col("tile_lat") + 1 - F.col("lat")) * scale
                ).cast("long"),
            )
            xq = F.least(
                F.lit((1 << zorder_bits) - 1),
                F.floor((F.col("lon") - F.col("tile_lon")) * scale).cast(
                    "long"
                ),
            )
            # partition cols lead the sort: the partitioned writer
            # requires ordering by them and would otherwise re-sort
            # (unstably), destroying the z-order it can instead inherit
            rewrite = (
                rewrite.withColumn("_z", zvalue([yq, xq], zorder_bits))
                .sortWithinPartitions("tile_lat", "tile_lon", "_z")
                .drop("_z")
            )
        (
            rewrite.write.mode("overwrite")
            .partitionBy("tile_lat", "tile_lon")
            .parquet(out_dir)
        )
    finally:
        for k, v in old_conf.items():
            spark.conf.set(k, v)
    after = _files_per_tile()
    return {
        "compacted_tiles": len(victims),
        "files_before": sum(before.values()),
        "files_after": sum(after.values()),
    }


#: Mergeable per-tile statistics kept by the continuous rollup —
#: count/sum/min/max merge associatively across micro-batches (mean is
#: derived at read time), so maintenance is O(affected tiles) per batch.
_ROLLUP_COLS = ("n_points", "sum_elev", "min_elev", "max_elev")


def tile_rollup_read(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The rollup table with the derived mean — the read-side view."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(rollup_dir)
    return df.withColumn(
        "mean_elev",
        F.col("sum_elev").cast("double") / F.col("n_points").cast("double"),
    )


def stream_tile_rollup(
    spark: SparkSession,
    tif_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    set_name: str = "world",
    chunk_rows: int = 512_000,
    on_corrupt: str = "skip",
):
    """Continuously-maintained per-tile elevation rollup (the
    "hypertable continuous aggregate" pattern, Spark-first).

    A Structured Streaming query over the tile landing directory keeps
    a small per-tile stats table (count/sum/min/max elevation) up to
    date incrementally: each micro-batch aggregates only its own new
    tiles' points, merges them with the existing rows for exactly the
    affected tiles, and commits via dynamic partition overwrite — an
    upsert with plain Parquet, atomic per partition. Untouched tiles
    are never read or rewritten, so maintenance cost is O(new data),
    not O(table): the incremental-view shape that makes a 64 800-tile
    world rollup cheap to keep fresh forever.

    foreachBatch is the right tool (not a windowed agg): the combine
    is keyed by tile, not time, and needs a read-merge-write against an
    external table. foreachBatch alone is AT-LEAST-ONCE — a replayed
    micro-batch would double-merge its delta — so the merge records
    each applied ``batch_id`` as a ``_applied/batch-N`` marker inside
    the rollup dir and skips batches it has already applied. The
    residual window is a crash exactly between the data commit and the
    marker commit (plain Parquet cannot close it; a table format with
    transactions — Delta/Iceberg — is the upgrade path at scale).
    """
    from pyspark.sql import functions as F

    pts = _stream_points(spark, tif_dir, set_name, chunk_rows, on_corrupt)
    # batch ids restart at 0 under a NEW checkpoint, so the replay
    # marker is scoped to the checkpoint identity — a fresh pipeline
    # reusing an existing rollup dir must not be suppressed by a stale
    # run's batch-0 marker
    import hashlib

    ckpt_tag = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        fs, root = _hadoop_fs(s, rollup_dir)
        jvm_path = s._jvm.org.apache.hadoop.fs.Path
        marker = jvm_path(rollup_dir + f"/_applied/{ckpt_tag}-batch-{batch_id}")
        if fs.exists(marker):
            return  # replayed micro-batch: already merged
        delta = (
            batch_df.groupBy("tile_lat", "tile_lon")
            .agg(
                F.count("*").alias("n_points"),
                F.sum("elevation").alias("sum_elev"),
                F.min("elevation").alias("min_elev"),
                F.max("elevation").alias("max_elev"),
            )
        )
        has_data = fs.exists(root) and any(
            not n.startswith(("_", ".")) for n in _fs_listdir(fs, root)
        )
        if has_data:
            existing = s.read.parquet(rollup_dir)
            # the dynamic overwrite below swaps WHOLE tile_lat
            # partitions, so prior rows must be carried for every lat
            # BAND the batch touches — semi-joining on (lat, lon) would
            # drop same-band sibling tiles' rows from the rewrite
            bands = delta.select("tile_lat").distinct()
            prior = existing.join(F.broadcast(bands), ["tile_lat"], "left_semi")
            merged = (
                prior.unionByName(delta)
                .groupBy("tile_lat", "tile_lon")
                .agg(
                    F.sum("n_points").alias("n_points"),
                    F.sum("sum_elev").alias("sum_elev"),
                    F.min("min_elev").alias("min_elev"),
                    F.max("max_elev").alias("max_elev"),
                )
            )
        else:
            merged = delta
        old = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            (
                # one row per tile: co-locate rows of a lat band so the
                # dynamic overwrite writes one file per partition dir
                merged.repartition("tile_lat")
                .write.mode("overwrite")
                .partitionBy("tile_lat")
                .parquet(rollup_dir)
            )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", old)
        fs.mkdirs(marker)  # commit the replay guard

    return (
        pts.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
