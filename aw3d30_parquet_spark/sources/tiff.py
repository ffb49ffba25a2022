"""Minimal single-band GeoTIFF codec (pure numpy, network-free).

The reference decodes AW3D30 DEM tiles with GDAL (reference
``src/main.rs:172-180``: open dataset, read ``geo_transform()``, read band
1 as i32). This container ships no raster library, so we implement the
narrow slice of TIFF 6.0 + GeoTIFF the reference actually consumes:

- classic TIFF, little- or big-endian, single IFD
- one sample per pixel, integer sample formats (int8..int32, uint8..uint16)
- strip-based storage, uncompressed (Compression=1)
- geotransform from ModelPixelScaleTag (33550) + ModelTiepointTag (33922),
  the standard north-up GeoTIFF encoding; full 2-D affine via
  ModelTransformationTag (34264) also supported

``decode_geotiff`` is the hot-path function called inside ``mapInPandas``
(one call per tile file); ``encode_geotiff`` exists so tests and the
ingest benchmark can fabricate deterministic tiles without GDAL. When
``rasterio`` is importable it is preferred at decode time — real AW3D30
tiles are DEFLATE-compressed, beyond this fallback.

Nothing here touches Spark: bytes in, ``(numpy array, 6-float
geotransform)`` out, so the codec is unit-testable without a session.
"""

from __future__ import annotations

import struct
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
    if tags.get(_TAG_COMPRESSION, [1])[0] != 1:
        raise ValueError("fallback codec reads uncompressed TIFF only (install rasterio)")
    if tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0] != 1:
        raise ValueError("single-band rasters only (reference reads band 1)")
    width = int(tags[_TAG_WIDTH][0])
    height = int(tags[_TAG_LENGTH][0])
    dtype = _sample_dtype(tags, endian)
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_BYTE_COUNTS]
    chunks = [np.frombuffer(data, dtype, c // dtype.itemsize, o) for o, c in zip(offsets, counts)]
    band = np.concatenate(chunks).reshape(height, width).astype(np.int32)
    return band, _geotransform_from_tags(tags)


def encode_geotiff(band: np.ndarray, gt: GeoTransform) -> bytes:
    """Encode a 2-D int32 array + geotransform as a minimal valid GeoTIFF.

    Little-endian, one strip, uncompressed, ModelPixelScale+ModelTiepoint
    georeferencing (north-up only: gt2 == gt4 == 0). Used by tests and the
    ingest benchmark to fabricate deterministic tiles — the synthetic
    analogue of the reference's S3 download (``src/main.rs:136-161``).
    """
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise ValueError("encoder supports north-up geotransforms only")
    band = np.ascontiguousarray(band, dtype="<i4")
    height, width = band.shape
    pixel_bytes = band.tobytes()

    entries = []  # (tag, ftype, count, packed_or_deferred)
    deferred: list[bytes] = []

    def entry(tag: int, ftype: int, values: list) -> None:
        ch, size = _FIELD_TYPES[ftype]
        raw = struct.pack("<" + ch * len(values), *values)
        entries.append((tag, ftype, len(values), raw))

    entry(_TAG_WIDTH, 4, [width])
    entry(_TAG_LENGTH, 4, [height])
    entry(_TAG_BITS_PER_SAMPLE, 3, [32])
    entry(_TAG_COMPRESSION, 3, [1])
    entry(_TAG_PHOTOMETRIC, 3, [1])
    entry(_TAG_STRIP_OFFSETS, 4, [0])  # patched below
    entry(_TAG_SAMPLES_PER_PIXEL, 3, [1])
    entry(_TAG_ROWS_PER_STRIP, 4, [height])
    entry(_TAG_STRIP_BYTE_COUNTS, 4, [len(pixel_bytes)])
    entry(_TAG_SAMPLE_FORMAT, 3, [2])
    entry(_TAG_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
    entry(_TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])

    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tag order
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4  # after entry table + next-IFD pointer

    # lay out out-of-line values, then the pixel strip
    blob = bytearray()
    packed_entries = bytearray()
    for tag, ftype, count, raw in entries:
        if len(raw) <= 4:
            field = raw.ljust(4, b"\0")
        else:
            field = struct.pack("<I", data_off + len(blob))
            blob += raw
        packed_entries += struct.pack("<HHI", tag, ftype, count) + field

    strip_off = data_off + len(blob)
    # patch StripOffsets (it sorted into a known position; rebuild instead)
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n)
    for i, (tag, ftype, count, raw) in enumerate(entries):
        if tag == _TAG_STRIP_OFFSETS:
            field = struct.pack("<I", strip_off)
        else:
            field = bytes(packed_entries[i * 12 + 8 : i * 12 + 12])
        out += struct.pack("<HHI", tag, ftype, count) + field
    out += struct.pack("<I", 0)  # no next IFD
    out += blob
    out += pixel_bytes
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
