#!/usr/bin/env python
"""g08 halo-exchange volume probe (r11 verdict item 5).

The seamless-gradient docstring claims the halo relation is
metadata-sized next to the mosaic (~0.11% of raster bytes at AW3D30's
3600² tiles) and that it scales with tile PERIMETER while decoded
cells scale with tile AREA — pinned until now only on the 2×2 pytest
mosaic. This probe counts the actual relations on larger mosaics:

- ``halo_samples_emitted``: Σ len(vals) over the pass-1 border
  relation (every tile ships 2 rows + 2 cols addressed to its compass
  neighbors — this is what broadcasts);
- ``halo_samples_consumed``: the subset addressed to tiles that exist
  (mosaic-boundary edges address nonexistent neighbors and die in the
  join);
- ``cells``: decoded gradient cells (tile area × tile count);
- ``halo_frac``: emitted halo samples / cells — the perimeter/area
  ratio, 4/N per N-px tile, INDEPENDENT of mosaic extent (both sides
  grow linearly in tile count; extrapolating 4/3600 gives the 0.11%
  claim).

Each config also re-checks correctness: the engine's global
Σdzdx/Σdzdy over the mosaic must equal a plain-numpy np.gradient of
the stitched mosaic (the same independent-derivation discipline as
the g08/g11 oracles), so the volume numbers describe a verified plan,
not a broken one.

Usage: python tools/probe_halo.py  (writes one JSON line per config)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def build_mosaic(tif_dir: str, coords_sizes) -> None:
    from aw3d30_parquet_spark.sources.demo import tile_key
    from aw3d30_parquet_spark.sources.tiff import encode_geotiff

    os.makedirs(tif_dir, exist_ok=True)
    for (lat, lon), n in coords_sizes:
        path = os.path.join(tif_dir, f"{tile_key(lat, lon)}.tif")
        if not os.path.exists(path):
            yy = np.arange(n, dtype=np.int32)[:, None]
            xx = np.arange(n, dtype=np.int32)[None, :]
            gt = (float(lon), 1.0 / n, 0.0, float(lat + 1), 0.0, -1.0 / n)
            with open(path, "wb") as f:
                f.write(encode_geotiff(1000 * yy + xx, gt))


def stitched_reference(coords_sizes) -> tuple[int, int]:
    """Global Σdzdx/Σdzdy of the mosaic differentiated as ONE raster,
    computed by stitching with the SAME pixel-center nearest-neighbor
    edge resample the engine documents for mixed resolutions — but via
    a plain numpy pad-per-tile construction sharing no engine code
    (the g11 oracle's proof form, generalized to any mosaic)."""

    def ramp(n):
        y = np.arange(n, dtype=np.float64)[:, None]
        x = np.arange(n, dtype=np.float64)[None, :]
        return 1000.0 * y + x

    def nn(v, need):
        idx = np.minimum(
            ((np.arange(need) + 0.5) * len(v) / need).astype(np.int64),
            len(v) - 1,
        )
        return v[idx]

    sizes = {c: n for c, n in coords_sizes}
    sx = sy = 0
    for (la, lo), n in coords_sizes:
        band = ramp(n)
        pads = {}
        # neighbor edges, resampled to this tile's grid (top = the
        # north neighbor's bottom row, etc. — north is lat+1)
        if (la + 1, lo) in sizes:
            pads["top"] = nn(ramp(sizes[(la + 1, lo)])[-1, :], n)
        if (la - 1, lo) in sizes:
            pads["bottom"] = nn(ramp(sizes[(la - 1, lo)])[0, :], n)
        if (la, lo - 1) in sizes:
            pads["left"] = nn(ramp(sizes[(la, lo - 1)])[:, -1], n)
        if (la, lo + 1) in sizes:
            pads["right"] = nn(ramp(sizes[(la, lo + 1)])[:, 0], n)
        top = 1 if "top" in pads else 0
        bot = 1 if "bottom" in pads else 0
        left = 1 if "left" in pads else 0
        right = 1 if "right" in pads else 0
        padded = np.zeros((n + top + bot, n + left + right))
        padded[top : top + n, left : left + n] = band
        if top:
            padded[0, left : left + n] = pads["top"]
        if bot:
            padded[-1, left : left + n] = pads["bottom"]
        if left:
            padded[top : top + n, 0] = pads["left"]
        if right:
            padded[top : top + n, -1] = pads["right"]
        gy = np.gradient(padded, axis=0)[top : top + n, left : left + n]
        gx = np.gradient(padded, axis=1)[top : top + n, left : left + n]
        # the probe's Spark aggregate sums dzdx.cast("bigint") — a
        # PER-CELL truncation toward zero (mixed-res seams produce
        # half-integer central differences), so the reference must
        # truncate per cell too, not round the float total
        sx += int(np.trunc(gx).sum())
        sy += int(np.trunc(gy).sum())
    return sx, sy


def probe(spark, label: str, coords_sizes) -> dict:
    from aw3d30_parquet_spark.sources.geotiff import (
        _halo_partition,
        _region_pruned_files,
        read_tile_gradients_seamless,
    )
    from aw3d30_parquet_spark.session import ship_package

    tif_dir = f"/tmp/halo_probe_{label}"
    build_mosaic(tif_dir, coords_sizes)
    ship_package(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "ALPSMLC30_*_DSM.tif")
        .load(tif_dir)
        .select("path", "content")
    )
    files = _region_pruned_files(files, "world")
    halo_rel = files.mapInPandas(
        _halo_partition,
        schema="dla int, dlo int, side string, vals array<int>",
    )
    emitted = halo_rel.agg(
        F.count("*").alias("rows"),
        F.sum(F.size("vals")).alias("samples"),
    ).first()
    existing = {c for c, _ in coords_sizes}
    consumed = (
        halo_rel.filter(
            F.struct("dla", "dlo").isin(
                [F.struct(F.lit(a), F.lit(b)) for a, b in sorted(existing)]
            )
        )
        .agg(F.sum(F.size("vals")).alias("samples"))
        .first()["samples"]
    )
    t0 = time.time()
    agg = (
        read_tile_gradients_seamless(spark, tif_dir, "world")
        .agg(
            F.count("*").alias("cells"),
            F.sum(F.col("dzdx").cast("bigint")).alias("sx"),
            F.sum(F.col("dzdy").cast("bigint")).alias("sy"),
        )
        .first()
    )
    wall = round(time.time() - t0, 2)
    ref_sx, ref_sy = stitched_reference(coords_sizes)
    cells = int(agg["cells"])
    return {
        "label": label,
        "n_tiles": len(coords_sizes),
        "tile_px": sorted({n for _, n in coords_sizes}),
        "cells": cells,
        "halo_rows_emitted": int(emitted["rows"]),
        "halo_samples_emitted": int(emitted["samples"]),
        "halo_samples_consumed": int(consumed),
        "halo_frac": round(int(emitted["samples"]) / cells, 6),
        "gradient_matches_numpy_stitch": bool(
            int(agg["sx"]) == ref_sx and int(agg["sy"]) == ref_sy
        ),
        "sum_dzdx": int(agg["sx"]),
        "sum_dzdy": int(agg["sy"]),
        "wall_sec": wall,
    }


def main() -> None:
    from aw3d30_parquet_spark.session import get_spark

    spark = get_spark()
    configs = [
        ("2x2_64px", [((51 + a, 4 + b), 64) for a in range(2) for b in range(2)]),
        ("8x8_64px", [((50 + a, b), 64) for a in range(8) for b in range(8)]),
        # same tile COUNT as 2x2 but 4x the edge length: halo_frac must
        # drop 4/64 -> 4/256, the perimeter-vs-area law the 0.11%
        # claim extrapolates to 3600 px
        ("4x4_256px", [((50 + a, 10 + b), 256) for a in range(4) for b in range(4)]),
        # mixed resolution: checkerboard 64/32 px — the g11 resample
        # branch under a full 4x4 mosaic
        (
            "4x4_mixed",
            [
                ((50 + a, 20 + b), 64 if (a + b) % 2 == 0 else 32)
                for a in range(4)
                for b in range(4)
            ],
        ),
    ]
    for label, cs in configs:
        print(json.dumps(probe(spark, label, cs)), flush=True)


if __name__ == "__main__":
    main()
