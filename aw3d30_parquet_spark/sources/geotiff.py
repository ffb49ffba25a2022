"""GeoTIFF tile ingest: the reference's entire capability, Spark-first.

Reference pipeline (``src/main.rs``): list S3 keys (R1, ``:265-331``) →
regex-parse tile coordinate from key (R2, ``:298``, ``:108-133``) → region
predicate (R3, ``:68-88``) → download (R4, ``:136-161``) → flatten raster
to ``(lat, lon, elevation)`` rows (R5, ``:172-191``) → one Parquet file
per tile (R6, ``:193-225``).

Spark mapping (SURVEY §1.3/§3.4): the *work list* is metadata (≤ 64 800
one-degree tiles for the whole world — kilobytes, never data-plane), so
region → key enumeration happens in plain Python, implementing the
reference's own ``todo(mb)`` (``src/main.rs:299``: generate keys from the
set instead of list-then-filter). The data plane is a ``binaryFile`` scan
(one Spark task per tile, no shuffle anywhere in the pipeline) fused with
a ``mapInPandas`` decode that yields bounded Arrow batches, then a
partitioned Parquet sink. At 100 TB (~31 000 real tiles × 13M rows) this
is a single embarrassingly-parallel stage: scan → decode → write, with
partition pruning on ``tile_lat``/``tile_lon`` replacing the reference's
filename-encoded partitioning.
"""

from __future__ import annotations

import os
import re
from typing import Iterable, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from aw3d30_parquet_spark.sources.tiff import decode_geotiff, flatten_raster

#: Key regex — byte-for-byte the reference's (``src/main.rs:298``); the
#: anchored stem variant below is what :func:`parse_tile_key` enforces,
#: so mutated keys ("ALPSMLC30_X051E004_DSM", truncations, suffixed
#: stems) reject exactly like the reference's TryFrom parse
#: (``src/main.rs:131``).
TILE_KEY_RE = re.compile(r"ALPSMLC30_(?P<y>[NS])(?P<lat>\d{3})(?P<x>[EW])(?P<lon>\d{3})_DSM")
_TILE_STEM_RE = re.compile(r"^ALPSMLC30_(?P<y>[NS])(?P<lat>\d{3})(?P<x>[EW])(?P<lon>\d{3})_DSM$")

#: Output schema of the flatten — the reference's fixed REQUIRED Parquet
#: group schema (``src/main.rs:273-293``), plus the two tile partition
#: columns (strictly better than the reference's name-encoded partitioning).
POINT_SCHEMA = StructType(
    [
        StructField("tile_lat", IntegerType(), False),
        StructField("tile_lon", IntegerType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
        StructField("elevation", IntegerType(), False),
    ]
)

#: Region predicates over signed tile degrees — transliteration of
#: ``Set::filter`` (``src/main.rs:68-88``). Signed form is equivalent to
#: the reference's hemisphere-tagged ranges: Netherlands/France/Europe all
#: require Lat::North, and "West(x) if x <= k OR East(x) if x <= m"
#: is exactly lon ∈ [-k, m].
REGION_SETS: dict[str, tuple[tuple[int, int], tuple[int, int]]] = {
    "netherlands": ((50, 53), (3, 7)),
    "france": ((42, 51), (-6, 9)),
    "europe": ((23, 80), (-25, 49)),
    "world": ((-90, 89), (-180, 179)),
}


def tile_key(lat: int, lon: int) -> str:
    """Signed tile degrees → AW3D30 object-key stem (``N``/``E`` at 0)."""
    if not (-90 <= lat <= 89 and -180 <= lon <= 179):
        raise ValueError(f"tile out of range: ({lat}, {lon})")
    ns = "N" if lat >= 0 else "S"
    ew = "E" if lon >= 0 else "W"
    return f"ALPSMLC30_{ns}{abs(lat):03d}{ew}{abs(lon):03d}_DSM"


def parse_tile_key(key: str) -> tuple[int, int] | None:
    """Key (or path ending in one) → signed (lat, lon); None if malformed.

    Mirrors the reference's parse-reject behavior (``src/main.rs:131``):
    the BASENAME stem must match the anchored pattern exactly, so
    mutated names (``..._DSM_old``, ``..._DSMX_DSM``) and tile-key-
    shaped DIRECTORY components reject rather than mis-parse.
    """
    stem = os.path.basename(key)
    if stem.endswith(".tif"):
        stem = stem[: -len(".tif")]
    m = _TILE_STEM_RE.match(stem)
    if m is None:
        return None
    lat = int(m["lat"])
    lon = int(m["lon"])
    if lat > 90 or lon > 180:
        return None
    return (-lat if m["y"] == "S" else lat, -lon if m["x"] == "W" else lon)


def in_region(set_name: str, lat: int, lon: int) -> bool:
    """``Set::filter`` (``src/main.rs:68-88``) over signed tile degrees."""
    (lat0, lat1), (lon0, lon1) = REGION_SETS[set_name]
    return lat0 <= lat <= lat1 and lon0 <= lon <= lon1


def tiles_for_set(set_name: str) -> list[tuple[int, int]]:
    """Region → enumerated tile coordinates (implements the reference's
    ``todo(mb)`` at ``src/main.rs:299``: generate the work list from the
    set definition instead of list-then-filter).

    ``world`` enumerates the full 1°×1° grid (64 800 keys) — the actual
    AW3D30 catalog is land-only (~24 000 objects); fetch-time skip handles
    the gaps, like the reference's per-object error path.
    """
    (lat0, lat1), (lon0, lon1) = REGION_SETS[set_name]
    return [(lat, lon) for lat in range(lat0, lat1 + 1) for lon in range(lon0, lon1 + 1)]


def keys_for_set(set_name: str, prefix: str = "AW3D30/AW3D30_global/") -> list[str]:
    """Region → full object keys (``{prefix}{stem}.tif``)."""
    return [f"{prefix}{tile_key(la, lo)}.tif" for la, lo in tiles_for_set(set_name)]


def _decode_partition(batches: Iterable, chunk_rows: int, on_corrupt: str) -> Iterator:
    """mapInPandas kernel: (path, content) rows → point-table Arrow batches.

    One input row per tile file; output yielded in ≤ chunk_rows batches so
    a 3600² tile (13M rows ≈ 260 MB) never materializes at once
    (SURVEY §7.3 item 2). All math is vectorized numpy — the JVM↔Python
    boundary carries only columnar Arrow buffers.

    ``on_corrupt``: 'fail' aborts the job on undecodable bytes (the
    reference's behavior — errors propagate and abort the pipeline,
    ``src/main.rs:337-345``); 'skip' drops the tile and keeps going
    (preferable for a 31 000-tile backfill where one bad object must
    not kill hours of work — re-runs pick up skipped tiles for free via
    the idempotent sink).
    """
    import pandas as pd

    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            coord = parse_tile_key(os.path.basename(str(path)))
            if coord is None:  # malformed key: reject like src/main.rs:131
                continue
            try:
                band, gt = decode_geotiff(bytes(content))
            except Exception:
                if on_corrupt == "fail":
                    raise
                continue
            for lat, lon, elev in flatten_raster(band, gt, chunk_rows):
                yield pd.DataFrame(
                    {
                        "tile_lat": np.full(len(lat), coord[0], dtype="int32"),
                        "tile_lon": np.full(len(lat), coord[1], dtype="int32"),
                        "lat": lat,
                        "lon": lon,
                        "elevation": elev.astype("int32"),
                    }
                )



#: Schema of the per-cell terrain-gradient table (g03): elevation
#: derivative per pixel step in x (east) and y (south→north negative),
#: computed tile-locally — the raster analytics layer the reference's
#: point table feeds into (slope/aspect are the first derived products
#: of any DEM pipeline).
GRADIENT_SCHEMA = StructType(
    [
        StructField("tile_lat", IntegerType(), False),
        StructField("tile_lon", IntegerType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
        StructField("dzdx", DoubleType(), False),
        StructField("dzdy", DoubleType(), False),
    ]
)


def _gradient_partition(batches: Iterable, chunk_rows: int) -> Iterator:
    """mapInPandas kernel: (path, content) tile rows → per-cell gradient.

    ``np.gradient`` central differences (one-sided at tile borders) over
    the decoded band, in elevation units per pixel step — entirely
    tile-local, so the whole slope layer is computed without any
    shuffle: the neighborhood a derivative needs is exactly the
    neighborhood a tile already holds. (Cross-tile seams use one-sided
    differences, the standard single-tile treatment; stitching seams
    would need a 1-px halo exchange — a different operator.)
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            coord = parse_tile_key(os.path.basename(str(path)))
            if coord is None:
                continue
            band, gt = decode_geotiff(bytes(content))
            b = band.astype(np.float64)
            # np.gradient needs ≥2 samples per axis; a degenerate
            # 1-wide/1-tall raster has zero slope along that axis
            dzdy_grid = (
                np.gradient(b, axis=0) if b.shape[0] > 1 else np.zeros_like(b)
            )
            dzdx_grid = (
                np.gradient(b, axis=1) if b.shape[1] > 1 else np.zeros_like(b)
            )
            height, width = band.shape
            x = np.arange(width, dtype=np.float64)
            rows_per_chunk = max(1, chunk_rows // width)
            for y0 in range(0, height, rows_per_chunk):
                y1 = min(y0 + rows_per_chunk, height)
                yy = np.arange(y0, y1, dtype=np.float64)
                lon = (gt[0] + x * gt[1])[None, :] + (yy * gt[2])[:, None]
                lat = (x * gt[4])[None, :] + (gt[3] + yy * gt[5])[:, None]
                n = (y1 - y0) * width
                yield pd.DataFrame(
                    {
                        "tile_lat": np.full(n, coord[0], dtype="int32"),
                        "tile_lon": np.full(n, coord[1], dtype="int32"),
                        "lat": np.broadcast_to(lat, (y1 - y0, width)).reshape(n),
                        "lon": np.broadcast_to(lon, (y1 - y0, width)).reshape(n),
                        "dzdx": dzdx_grid[y0:y1].reshape(n),
                        "dzdy": dzdy_grid[y0:y1].reshape(n),
                    }
                )


def _key_coord_cols() -> tuple:
    """JVM-side (key_lat, key_lon, key_valid) metadata columns parsed
    from the file path — Java-regex variant of _TILE_STEM_RE (positional
    groups; Java lacks ``(?P<name>)``), ANCHORED to the path's basename:
    matching anywhere in the full path would let a tile-key-shaped
    directory component hijack the coordinates the region pruning and
    exclude filters key on (and disagree with the Python kernel, which
    parses the basename)."""
    jpat = r"^ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM\.tif$"
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    sign_lat = F.when(F.regexp_extract(fname, jpat, 1) == "S", -1).otherwise(1)
    sign_lon = F.when(F.regexp_extract(fname, jpat, 3) == "W", -1).otherwise(1)
    key_lat = sign_lat * F.regexp_extract(fname, jpat, 2).cast("int")
    key_lon = sign_lon * F.regexp_extract(fname, jpat, 4).cast("int")
    return key_lat, key_lon, F.regexp_extract(fname, jpat, 0) != ""


def _region_pruned_files(files: DataFrame, set_name: str) -> DataFrame:
    """Apply key-parse + region predicate on file METADATA (before any
    tile byte is decoded) — the Spark analogue of the reference
    filtering during the S3 listing (``src/main.rs:316-321``)."""
    key_lat, key_lon, valid = _key_coord_cols()
    (lat0, lat1), (lon0, lon1) = REGION_SETS[set_name]
    return files.filter(
        valid & key_lat.between(lat0, lat1) & key_lon.between(lon0, lon1)
    )


def read_tile_gradients(
    spark: SparkSession,
    tif_dir: str,
    set_name: str = "world",
    chunk_rows: int = 512_000,
) -> DataFrame:
    """Tile scan → per-cell elevation gradient DataFrame (slope layer).

    Same plan shape as :func:`read_tiles` — binaryFile scan with
    file-level region pruning fused with a mapInPandas kernel, one task
    per tile, zero Exchanges."""
    from aw3d30_parquet_spark.session import ship_package

    ship_package(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "ALPSMLC30_*_DSM.tif")
        .load(tif_dir)
        .select("path", "content")
    )
    return _region_pruned_files(files, set_name).mapInPandas(
        lambda it: _gradient_partition(it, chunk_rows),
        schema=GRADIENT_SCHEMA,
    )


def _halo_partition(batches: Iterable) -> Iterator:
    """mapInPandas kernel: tile files → border rows/cols addressed to
    each edge-neighbor tile. Per tile: 2 rows + 2 cols ≈ 0.11% of a
    3600² raster — the halo relation is metadata-sized next to the
    mosaic."""
    import pandas as pd

    for pdf in batches:
        rows = {"dla": [], "dlo": [], "side": [], "vals": []}
        for path, content in zip(pdf["path"], pdf["content"]):
            coord = parse_tile_key(os.path.basename(str(path)))
            if coord is None:
                continue
            band, _gt = decode_geotiff(bytes(content))
            la, lo = coord
            # row 0 is the tile's TOP (north) edge: it is the north
            # neighbor's bottom halo, and so on around the compass
            for dla, dlo, side, vals in (
                (la + 1, lo, "bottom", band[0, :]),
                (la - 1, lo, "top", band[-1, :]),
                (la, lo - 1, "right", band[:, 0]),
                (la, lo + 1, "left", band[:, -1]),
            ):
                rows["dla"].append(dla)
                rows["dlo"].append(dlo)
                rows["side"].append(side)
                rows["vals"].append(vals.astype("int32").tolist())
        yield pd.DataFrame(rows)


def _seamless_gradient_partition(batches: Iterable, chunk_rows: int) -> Iterator:
    """mapInPandas kernel: (path, content, 4 nullable halo arrays) →
    per-cell gradient with CENTRAL differences across tile seams.

    The decoded band is padded with whichever neighbor borders exist,
    ``np.gradient`` runs over the padded array, and the core slice is
    emitted — so interior-of-mosaic seams get true central differences
    while mosaic-boundary edges keep the standard one-sided form
    (exactly what a single global raster would produce)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        for i in range(len(pdf)):
            path = str(pdf["path"].iloc[i])
            coord = parse_tile_key(os.path.basename(path))
            if coord is None:
                continue
            band, gt = decode_geotiff(bytes(pdf["content"].iloc[i]))
            h, w = band.shape
            halos = {
                side: pdf[f"halo_{side}"].iloc[i]
                for side in ("top", "bottom", "left", "right")
            }
            pads = {
                s: None if v is None else np.asarray(v, dtype=np.int32)
                for s, v in halos.items()
            }
            # a neighbor's halo arrives at the NEIGHBOR's resolution;
            # real AW3D30 narrows tiles at high latitude (a 60°N tile
            # is 1800 px wide against its 3600 px south neighbor —
            # ref src/main.rs:172-180 ingests whatever dims GDAL
            # reports), so mismatched lengths are a legitimate mosaic,
            # not corruption. Both edges span the same 1° of geography:
            # nearest-neighbor resample via the pixel-CENTER index map
            # (receiver pixel i's center ↔ donor pixel
            # floor((i+0.5)·got/need)) — a silent [:need] truncation
            # would instead misalign every sample positionally. A halo
            # with <2 samples has no defined grid — that layout is
            # genuinely unknown, keep failing loudly.
            # Resample only PLAUSIBLE resolution mismatches. Real
            # AW3D30 tiers are 3600/1800/1200/600 px per degree, so a
            # legitimate neighbor edge differs by an integer factor
            # (2, 3, 6) or the 1800:1200 tier adjacency (3:2). Any
            # other mismatch — above all the off-by-one 3599-vs-3600
            # shape of a truncated or mis-exchanged halo — is
            # corruption that nearest-neighbor stretching would
            # silently smear into the seam gradients: keep failing
            # loudly for those.
            for side, need in (
                ("top", w), ("bottom", w), ("left", h), ("right", h)
            ):
                got = pads[side]
                if got is not None and len(got) != need:
                    lo, hi = sorted((len(got), need))
                    plausible = lo >= 2 and (
                        hi % lo == 0 or hi * 2 == lo * 3
                    )
                    if not plausible:
                        raise ValueError(
                            f"tile {coord}: {side} halo has "
                            f"{len(got)} samples against a {need}-px "
                            "edge — not a known AW3D30 resolution "
                            "ratio; refusing to resample a likely "
                            "corrupt halo"
                        )
                    idx = np.minimum(
                        (
                            (np.arange(need, dtype=np.float64) + 0.5)
                            * (len(got) / need)
                        ).astype(np.int64),
                        len(got) - 1,
                    )
                    pads[side] = got[idx]
            top = 1 if pads["top"] is not None else 0
            bot = 1 if pads["bottom"] is not None else 0
            left = 1 if pads["left"] is not None else 0
            right = 1 if pads["right"] is not None else 0
            padded = np.zeros((h + top + bot, w + left + right), np.float64)
            padded[top : top + h, left : left + w] = band
            if top:
                padded[0, left : left + w] = pads["top"]
            if bot:
                padded[-1, left : left + w] = pads["bottom"]
            if left:
                padded[top : top + h, 0] = pads["left"]
            if right:
                padded[top : top + h, -1] = pads["right"]
            dzdy_p = (
                np.gradient(padded, axis=0)
                if padded.shape[0] > 1
                else np.zeros_like(padded)
            )
            dzdx_p = (
                np.gradient(padded, axis=1)
                if padded.shape[1] > 1
                else np.zeros_like(padded)
            )
            dzdy_grid = dzdy_p[top : top + h, left : left + w]
            dzdx_grid = dzdx_p[top : top + h, left : left + w]
            x = np.arange(w, dtype=np.float64)
            rows_per_chunk = max(1, chunk_rows // w)
            for y0 in range(0, h, rows_per_chunk):
                y1 = min(y0 + rows_per_chunk, h)
                yy = np.arange(y0, y1, dtype=np.float64)
                lon = (gt[0] + x * gt[1])[None, :] + (yy * gt[2])[:, None]
                lat = (x * gt[4])[None, :] + (gt[3] + yy * gt[5])[:, None]
                n = (y1 - y0) * w
                yield pd.DataFrame(
                    {
                        "tile_lat": np.full(n, coord[0], dtype="int32"),
                        "tile_lon": np.full(n, coord[1], dtype="int32"),
                        "lat": np.broadcast_to(lat, (y1 - y0, w)).reshape(n),
                        "lon": np.broadcast_to(lon, (y1 - y0, w)).reshape(n),
                        "dzdx": dzdx_grid[y0:y1].reshape(n),
                        "dzdy": dzdy_grid[y0:y1].reshape(n),
                    }
                )


def read_tile_gradients_seamless(
    spark: SparkSession,
    tif_dir: str,
    set_name: str = "world",
    chunk_rows: int = 512_000,
) -> DataFrame:
    """Cross-tile SEAMLESS gradient via halo exchange — the distributed
    raster pattern the per-tile form (:func:`read_tile_gradients`)
    documents as out of scope: every tile receives its 4 edge-neighbors'
    border rows/cols, so seam cells get true central differences and
    the mosaic differentiates as ONE raster.

    Plan shape (the 100 TB argument): two passes over the file scan —
    pass 1 decodes and emits only borders (2 rows + 2 cols per tile,
    ~0.11% of a 3600² raster) keyed by the NEIGHBOR that needs them;
    pass 2 re-decodes each tile and joins its ≤4 halo arrays. The halo
    relation is broadcast, so tile bytes NEVER shuffle — the join
    streams the binaryFile scan in place (world mosaic: 64 800 tiles ×
    ~56 KB ≈ 3.6 GB of halos; past broadcast budget, run per lat-band —
    halos within a band cover all north/south seams, band joins stay
    broadcast-sized — or bucket both sides by tile key). Decoding twice
    trades ~2× decode CPU for zero raster shuffle; at AW3D30 scale the
    decode is minutes, the shuffle would be the job."""
    from aw3d30_parquet_spark.session import ship_package

    ship_package(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "ALPSMLC30_*_DSM.tif")
        .load(tif_dir)
        .select("path", "content")
    )
    files = _region_pruned_files(files, set_name)
    halo_rel = files.mapInPandas(
        _halo_partition,
        schema="dla int, dlo int, side string, vals array<int>",
    )
    halos = halo_rel.groupBy("dla", "dlo").agg(
        *[
            F.first(
                F.when(F.col("side") == s, F.col("vals")), ignorenulls=True
            ).alias(f"halo_{s}")
            for s in ("top", "bottom", "left", "right")
        ]
    )
    key_lat, key_lon, _valid = _key_coord_cols()
    keyed = files.withColumn("_kla", key_lat).withColumn("_klo", key_lon)
    joined = keyed.join(
        F.broadcast(halos),
        (F.col("_kla") == F.col("dla")) & (F.col("_klo") == F.col("dlo")),
        "left",
    ).select(
        "path",
        "content",
        "halo_top",
        "halo_bottom",
        "halo_left",
        "halo_right",
    )
    return joined.mapInPandas(
        lambda it: _seamless_gradient_partition(it, chunk_rows),
        schema=GRADIENT_SCHEMA,
    )


def read_tiles(
    spark: SparkSession,
    tif_dir: str,
    set_name: str = "world",
    chunk_rows: int = 512_000,
    exclude_tiles: Iterable[tuple[int, int]] = (),
    on_corrupt: str = "fail",
) -> DataFrame:
    """Scan a directory of ``ALPSMLC30_*.tif`` tiles → point DataFrame.

    Plan shape: ``binaryFile`` scan (with ``pathGlobFilter`` so non-tile
    files never load) → *file-level* region pruning on the parsed key —
    the Spark analogue of the reference applying R2+R3 during the S3
    listing (``src/main.rs:316-321``), before any byte of raster data is
    read — → fused ``mapInPandas`` decode. No shuffle; one task per tile.
    """
    from aw3d30_parquet_spark.session import ship_package

    ship_package(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "ALPSMLC30_*_DSM.tif")
        .load(tif_dir)
        .select("path", "content")
    )
    files = _region_pruned_files(files, set_name)
    # Skip-if-exists subtraction, still at the file level (before any
    # raster byte is decoded) — the reference's idempotency check
    # (src/main.rs:144-146,171) lifted into the scan's metadata filter.
    exclude = {la * 1000 + lo for la, lo in exclude_tiles}
    if exclude:
        key_lat, key_lon, _valid = _key_coord_cols()
        files = files.filter(
            ~(key_lat.cast("long") * 1000 + key_lon).isin(sorted(exclude))
        )
    if on_corrupt not in ("fail", "skip"):
        raise ValueError(f"on_corrupt must be 'fail' or 'skip', got {on_corrupt!r}")
    return files.mapInPandas(
        lambda it: _decode_partition(it, chunk_rows, on_corrupt),
        schema=POINT_SCHEMA,
    )
