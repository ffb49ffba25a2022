"""Minimal single-band GeoTIFF codec (pure numpy, network-free).

The reference decodes AW3D30 DEM tiles with GDAL (reference
``src/main.rs:172-180``: open dataset, read ``geo_transform()``, read band
1 as i32). This container ships no raster library, so we implement the
narrow slice of TIFF 6.0 + GeoTIFF the reference actually consumes:

- classic TIFF, little- or big-endian, single IFD
- one sample per pixel, integer sample formats (int8..int32, uint8..uint16)
- strip-based storage, uncompressed (Compression=1) or DEFLATE
  (Compression=8 / legacy 32946, stdlib zlib), with optional horizontal
  differencing (Predictor=2) — the combination GDAL writes for real
  AW3D30 tiles
- geotransform from ModelPixelScaleTag (33550) + ModelTiepointTag (33922),
  the standard north-up GeoTIFF encoding; full 2-D affine via
  ModelTransformationTag (34264) also supported

``decode_geotiff`` is the hot-path function called inside ``mapInPandas``
(one call per tile file); ``encode_geotiff`` exists so tests and the
ingest benchmark can fabricate deterministic tiles without GDAL. When
``rasterio`` is importable it is preferred at decode time (tiled TIFFs,
exotic codecs); this fallback now covers real DEFLATE AW3D30 strips.

Nothing here touches Spark: bytes in, ``(numpy array, 6-float
geotransform)`` out, so the codec is unit-testable without a session.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np

try:  # pragma: no cover - exercised only where rasterio is installed
    import rasterio  # type: ignore
    import rasterio.io  # type: ignore

    _HAVE_RASTERIO = True
except Exception:  # pragma: no cover
    _HAVE_RASTERIO = False

# TIFF tag ids we understand (TIFF 6.0 spec + GeoTIFF spec appendix 6).
_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS_PER_SAMPLE = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_PREDICTOR = 317
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_MODEL_TRANSFORMATION = 34264

# TIFF field types → (struct char, byte size)
_FIELD_TYPES = {
    1: ("B", 1),  # BYTE
    2: ("c", 1),  # ASCII
    3: ("H", 2),  # SHORT
    4: ("I", 4),  # LONG
    5: ("II", 8),  # RATIONAL (2×LONG)
    8: ("h", 2),  # SSHORT
    9: ("i", 4),  # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

GeoTransform = tuple[float, float, float, float, float, float]


def _read_ifd_values(buf: bytes, endian: str, ftype: int, count: int, value_field: bytes):
    """Decode one IFD entry's values (inline if they fit in 4 bytes)."""
    ch, size = _FIELD_TYPES[ftype]
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (offset,) = struct.unpack(endian + "I", value_field)
        raw = buf[offset : offset + total]
    if ftype == 2:
        return raw.rstrip(b"\0").decode("ascii", "replace")
    vals = struct.unpack(endian + ch * count, raw)
    return list(vals)


def _parse_ifd(buf: bytes) -> tuple[dict[int, list], str]:
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(endian + "H", buf[2:4])
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic={magic})")
    (ifd_off,) = struct.unpack(endian + "I", buf[4:8])
    (n_entries,) = struct.unpack(endian + "H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        tag, ftype, count = struct.unpack(endian + "HHI", buf[pos : pos + 8])
        if ftype in _FIELD_TYPES:
            tags[tag] = _read_ifd_values(buf, endian, ftype, count, buf[pos + 8 : pos + 12])
        pos += 12
    return tags, endian


def _geotransform_from_tags(tags: dict[int, list]) -> GeoTransform:
    """GDAL-style geotransform (gt0..gt5) from GeoTIFF georeferencing tags.

    Matches what the reference reads via ``dataset.geo_transform()``
    (reference ``src/main.rs:173``): ``lon = gt0 + x*gt1 + y*gt2``,
    ``lat = gt3 + x*gt4 + y*gt5`` for *pixel-corner* indices.
    """
    if _TAG_MODEL_TRANSFORMATION in tags:
        m = tags[_TAG_MODEL_TRANSFORMATION]  # 4×4 row-major matrix
        return (m[3], m[0], m[1], m[7], m[4], m[5])
    if _TAG_MODEL_PIXEL_SCALE in tags and _TAG_MODEL_TIEPOINT in tags:
        sx, sy = tags[_TAG_MODEL_PIXEL_SCALE][:2]
        i, j, _k, x, y, _z = tags[_TAG_MODEL_TIEPOINT][:6]
        # tiepoint maps raster (i, j) → model (x, y); north-up => negative y step
        return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)
    raise ValueError("no GeoTIFF georeferencing tags (33550+33922 or 34264)")


def _sample_dtype(tags: dict[int, list], endian: str) -> np.dtype:
    bits = tags.get(_TAG_BITS_PER_SAMPLE, [1])[0]
    fmt = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]  # 1=uint, 2=int, 3=float
    base = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if base is None or bits % 8:
        raise ValueError(f"unsupported sample format {fmt}/{bits}-bit")
    return np.dtype(f"{endian}{base}{bits // 8}")


def decode_geotiff(data: bytes) -> tuple[np.ndarray, GeoTransform]:
    """Decode single-band GeoTIFF bytes → (2-D int32 array, geotransform).

    Pixels are returned as int32 regardless of storage width, mirroring the
    reference's ``read_band_as::<i32>()`` (``src/main.rs:180``).
    """
    if _HAVE_RASTERIO:  # pragma: no cover - not installed in this container
        with rasterio.io.MemoryFile(data) as mem, mem.open() as ds:
            band = ds.read(1).astype(np.int32)
            t = ds.transform  # affine: (a, b, c, d, e, f) = (gt1, gt2, gt0, gt4, gt5, gt3)
            return band, (t.c, t.a, t.b, t.f, t.d, t.e)
    tags, endian = _parse_ifd(data)
    compression = tags.get(_TAG_COMPRESSION, [1])[0]
    if compression not in (1, 8, 32946):
        raise ValueError(
            f"fallback codec reads uncompressed or DEFLATE TIFF only "
            f"(Compression={compression}; install rasterio)"
        )
    if tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0] != 1:
        raise ValueError("single-band rasters only (reference reads band 1)")
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported Predictor={predictor}")
    width = int(tags[_TAG_WIDTH][0])
    height = int(tags[_TAG_LENGTH][0])
    dtype = _sample_dtype(tags, endian)
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_BYTE_COUNTS]
    if compression == 1:
        chunks = [
            np.frombuffer(data, dtype, c // dtype.itemsize, o)
            for o, c in zip(offsets, counts)
        ]
    else:  # DEFLATE (8 or legacy 32946): zlib stream per strip
        chunks = [
            np.frombuffer(zlib.decompress(data[o : o + c]), dtype)
            for o, c in zip(offsets, counts)
        ]
    if predictor == 2:
        # horizontal differencing: samples are row-wise deltas; undo with
        # a same-dtype cumulative sum (wraparound arithmetic per spec)
        chunks = [
            c.reshape(-1, width).cumsum(axis=1, dtype=dtype).reshape(-1)
            for c in chunks
        ]
    band = np.concatenate(chunks).reshape(height, width).astype(np.int32)
    return band, _geotransform_from_tags(tags)


def encode_geotiff(
    band: np.ndarray,
    gt: GeoTransform,
    compression: str = "none",
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode a 2-D int32 array + geotransform as a minimal valid GeoTIFF.

    Little-endian, ModelPixelScale+ModelTiepoint georeferencing (north-up
    only: gt2 == gt4 == 0). ``compression`` is ``"none"`` or ``"deflate"``
    (per-strip zlib, Compression=8, what GDAL writes for real AW3D30
    tiles); ``predictor=2`` applies horizontal differencing first. Used by
    tests and the ingest benchmark to fabricate deterministic tiles — the
    synthetic analogue of the reference's S3 download
    (``src/main.rs:136-161``).
    """
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise ValueError("encoder supports north-up geotransforms only")
    if compression not in ("none", "deflate"):
        raise ValueError(f"unsupported compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    band = np.ascontiguousarray(band, dtype="<i4")
    height, width = band.shape
    rps = height if rows_per_strip is None else max(1, rows_per_strip)

    strips: list[bytes] = []
    for y0 in range(0, height, rps):
        rows = band[y0 : y0 + rps]
        if predictor == 2:
            # horizontal differencing (wraparound): first column kept,
            # remaining columns become row-wise deltas
            rows = np.concatenate(
                [rows[:, :1], np.diff(rows.astype(np.int32), axis=1)], axis=1
            ).astype("<i4")
        raw = rows.tobytes()
        strips.append(zlib.compress(raw) if compression == "deflate" else raw)

    entries = []  # (tag, ftype, count, raw)

    def entry(tag: int, ftype: int, values: list) -> None:
        ch, _size = _FIELD_TYPES[ftype]
        raw = struct.pack("<" + ch * len(values), *values)
        entries.append((tag, ftype, len(values), raw))

    n_strips = len(strips)
    entry(_TAG_WIDTH, 4, [width])
    entry(_TAG_LENGTH, 4, [height])
    entry(_TAG_BITS_PER_SAMPLE, 3, [32])
    entry(_TAG_COMPRESSION, 3, [1 if compression == "none" else 8])
    entry(_TAG_PHOTOMETRIC, 3, [1])
    entry(_TAG_STRIP_OFFSETS, 4, [0] * n_strips)  # patched below
    entry(_TAG_SAMPLES_PER_PIXEL, 3, [1])
    entry(_TAG_ROWS_PER_STRIP, 4, [rps])
    entry(_TAG_STRIP_BYTE_COUNTS, 4, [len(s) for s in strips])
    if predictor == 2:
        entry(_TAG_PREDICTOR, 3, [2])
    entry(_TAG_SAMPLE_FORMAT, 3, [2])
    entry(_TAG_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
    entry(_TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])

    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tag order
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4  # after entry table + next-IFD pointer

    # first pass: lay out out-of-line values to learn where strips land
    blob_len = sum(len(raw) for _t, _f, _c, raw in entries if len(raw) > 4)
    strips_off = data_off + blob_len
    strip_offsets = []
    pos = strips_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # patch StripOffsets with the real positions
    patched = []
    for tag, ftype, count, raw in entries:
        if tag == _TAG_STRIP_OFFSETS:
            raw = struct.pack("<" + "I" * n_strips, *strip_offsets)
        patched.append((tag, ftype, count, raw))

    blob = bytearray()
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n)
    for tag, ftype, count, raw in patched:
        if len(raw) <= 4:
            field = raw.ljust(4, b"\0")
        else:
            field = struct.pack("<I", data_off + len(blob))
            blob += raw
        out += struct.pack("<HHI", tag, ftype, count) + field
    out += struct.pack("<I", 0)  # no next IFD
    out += blob
    for s in strips:
        out += s
    return bytes(out)


def flatten_raster(
    band: np.ndarray, gt: GeoTransform, chunk_rows: int = 512_000
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Raster grid → (lat, lon, elevation) column chunks, vectorized.

    The Spark-side analogue of the reference's per-cell loop
    (``src/main.rs:182-191``): ``lon = gt0 + x*gt1 + y*gt2``,
    ``lat = gt3 + x*gt4 + y*gt5`` over integer pixel indices, except
    computed as numpy outer products instead of 13M scalar iterations,
    and yielded in bounded chunks so a 3600² tile (~13M rows, ~260 MB)
    never materializes as one Arrow batch (SURVEY §7.3 item 2).
    """
    height, width = band.shape
    x = np.arange(width, dtype=np.float64)
    y = np.arange(height, dtype=np.float64)
    rows_per_chunk = max(1, chunk_rows // width)
    for y0 in range(0, height, rows_per_chunk):
        y1 = min(y0 + rows_per_chunk, height)
        yy = y[y0:y1]
        lon = (gt[0] + x * gt[1])[None, :] + (yy * gt[2])[:, None]
        lat = (x * gt[4])[None, :] + (gt[3] + yy * gt[5])[:, None]
        n = (y1 - y0) * width
        yield (
            np.broadcast_to(lat, (y1 - y0, width)).reshape(n),
            np.broadcast_to(lon, (y1 - y0, width)).reshape(n),
            band[y0:y1].reshape(n),
        )
