"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (SURVEY §2.2 "Multimodal columns", same plumbing as the GeoTIFF
ingest): media travels as a ``BinaryType`` column; decode /
feature-extract / resize / frame-sample run as vectorized kernels inside
``mapInPandas`` so only Arrow buffers cross the JVM↔Python boundary, and
every operator stays a shuffle-free map stage (at 100 TB: one task per
input split, no driver involvement, no Python round-trips per row).

Container formats: real image/audio/video codecs are not installed in
this container, so decoding is a registry keyed on the payload's magic
bytes:

- ``RAW0``/``PCM0``/``VID0`` — a self-describing 16-byte-header format
  (defined here) that the fabricator emits; decode/resize/frame-sample
  are REAL numpy implementations over these bytes;
- WAV (RIFF/WAVE) — REAL decode via the stdlib ``wave`` module, so the
  standard-format dispatch is exercised by tests in any environment;
- PNG/JPEG — Pillow behind a conditional import (r9); ISO-BMFF video —
  PyAV behind a conditional import. Where the library is absent the
  branch raises a loud ``NotImplementedError`` naming it; installing
  the library lights the path with no code change, and
  ``extract_features`` routes such rows through a per-row slow path
  inside the same Arrow batch (RAW rows stay fully vectorized).

Media is fabricated deterministically from ``documents.doc_id`` (the
driver's table), which makes the decoded-metadata aggregate (m01)
SQL-derivable: the oracle recomputes sizes from the same arithmetic —
the Spark side must parse them back out of the binary headers to match.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aw3d30_parquet_spark.numeric import round_half_up
from aw3d30_parquet_spark.session import register_views

_MAGIC_IMAGE = b"RAW0"
_MAGIC_AUDIO = b"PCM0"
_MAGIC_VIDEO = b"VID0"
_HEADER_FMT = "<4sIII"  # magic, a, b, c (semantics per kind)
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def _pack_header(magic: bytes, a: int, b: int, c: int) -> bytes:
    # plain function (not a cached struct.Struct): nested mapInPandas
    # kernels capture referenced globals by value, and Struct objects
    # don't pickle
    return struct.pack(_HEADER_FMT, magic, a, b, c)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("intensity", DoubleType(), True),  # mean pixel / RMS
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


# ---------------------------------------------------------------------------
# Deterministic fabrication (media params are pure functions of doc_id —
# mirrored by the m01 oracle SQL; keep both in sync)
# ---------------------------------------------------------------------------


#: video frame-count law: n_frames = VID_FRAMES_BASE + doc_id %
#: VID_FRAMES_MOD. The m06 oracle's frame-index generator is bounded by
#: MAX_VID_FRAMES derived from the SAME constants — changing the video
#: arm here re-sizes the oracle automatically instead of silently
#: undercounting frames (ADVICE r5).
VID_FRAMES_BASE = 4
VID_FRAMES_MOD = 6
MAX_VID_FRAMES = VID_FRAMES_BASE + VID_FRAMES_MOD - 1


def media_params(doc_id: int) -> dict:
    kind = ("image", "audio", "video")[doc_id % 3]
    p: dict = {"kind": kind, "seed": doc_id % 256}
    if kind == "image":
        p.update(
            width=16 + (doc_id % 8) * 4,
            height=12 + (doc_id % 5) * 4,
            channels=1 + (doc_id % 2),
        )
    elif kind == "audio":
        p.update(sample_rate=8000 + (doc_id % 4) * 4000, n_samples=256 + (doc_id % 10) * 64)
    else:
        p.update(
            width=16 + (doc_id % 4) * 8,
            height=16,
            n_frames=VID_FRAMES_BASE + doc_id % VID_FRAMES_MOD,
        )
    return p


def _fabricate_payload(doc_id: int) -> bytes:
    p = media_params(doc_id)
    s = p["seed"]
    if p["kind"] == "image":
        n = p["width"] * p["height"] * p["channels"]
        head = _pack_header(_MAGIC_IMAGE, p["width"], p["height"], p["channels"])
        return head + (((s + np.arange(n)) % 256).astype(np.uint8)).tobytes()
    if p["kind"] == "audio":
        n = p["n_samples"]
        head = _pack_header(_MAGIC_AUDIO, p["sample_rate"], n, 0)
        return head + (((s + np.arange(n)) % 4096 - 2048).astype("<i2")).tobytes()
    n = p["width"] * p["height"] * p["n_frames"]
    head = _pack_header(_MAGIC_VIDEO, p["width"], p["height"], p["n_frames"])
    return head + (((s + np.arange(n)) % 256).astype(np.uint8)).tobytes()


def _fabricate_batch(mids: np.ndarray) -> list[bytes]:
    """Vectorized `_fabricate_payload` over a batch of ids.

    All body values follow (seed_i + arange(n_i)) <mod>; one flat ramp
    ``global_idx - row_start + seed`` over the batch generates every
    body in a single numpy pass, and the per-row cost drops to a slice
    + header concat. Byte-identical to `_fabricate_payload` (pinned by
    a pytest property), which stays as the readable one-row spec.
    """
    mids = np.asarray(mids, dtype=np.int64)
    kinds = mids % 3  # 0 image, 1 audio, 2 video (media_params order)
    seeds = mids % 256
    w = np.where(kinds == 0, 16 + (mids % 8) * 4, 16 + (mids % 4) * 8)
    h = np.where(kinds == 0, 12 + (mids % 5) * 4, 16)
    c = np.where(kinds == 0, 1 + (mids % 2), 4 + mids % 6)  # channels|frames
    ns = np.where(kinds == 1, 256 + (mids % 10) * 64, w * h * c)
    starts = np.concatenate([[0], np.cumsum(ns)])
    ramp = (
        np.arange(starts[-1], dtype=np.int64)
        - np.repeat(starts[:-1], ns)
        + np.repeat(seeds, ns)
    )
    # each element feeds exactly one kind: transform only its segment
    # (computing both dtypes over the full ramp would double the work
    # and triple transient memory per batch for no output difference)
    is_aud = np.repeat(kinds == 1, ns)
    u8 = (ramp[~is_aud] % 256).astype(np.uint8)  # image/video bodies
    i2 = (ramp[is_aud] % 4096 - 2048).astype("<i2")  # audio bodies
    pix_lens = np.where(kinds == 1, 0, ns)
    aud_lens = np.where(kinds == 1, ns, 0)
    u8_starts = np.concatenate([[0], np.cumsum(pix_lens)])
    i2_starts = np.concatenate([[0], np.cumsum(aud_lens)])
    out: list[bytes] = []
    for i, mid in enumerate(mids):
        if kinds[i] == 0:
            head = _pack_header(_MAGIC_IMAGE, int(w[i]), int(h[i]), int(c[i]))
            out.append(head + u8[u8_starts[i] : u8_starts[i + 1]].tobytes())
        elif kinds[i] == 1:
            sr = 8000 + int(mid % 4) * 4000
            head = _pack_header(_MAGIC_AUDIO, sr, int(ns[i]), 0)
            out.append(head + i2[i2_starts[i] : i2_starts[i + 1]].tobytes())
        else:
            head = _pack_header(_MAGIC_VIDEO, int(w[i]), int(h[i]), int(c[i]))
            out.append(head + u8[u8_starts[i] : u8_starts[i + 1]].tobytes())
    return out


#: media kind by id (media_params' doc_id % 3 arm) — lets callers prune
#: the work list BEFORE fabrication/decode (a filter above mapInPandas
#: cannot be pushed through the Python stage by Catalyst).
_KIND_MOD = {"image": 0, "audio": 1, "video": 2}


def media_table(
    spark: SparkSession, sf_dir: str, kind: str | None = None
) -> DataFrame:
    """documents → media table (media_id, kind, payload binary).

    ``kind`` prunes the id list before any payload is fabricated or
    decoded — the analogue of partition pruning for the media corpus
    (real pipelines store kind as a partition column for exactly this
    reason)."""
    register_views(spark, sf_dir)
    from aw3d30_parquet_spark.session import spread

    # fabrication + downstream decode are compute-bound Python kernels:
    # fan the single-split scan out to all cores (no-op at real scale)
    ids = spread(
        spark.table("documents").select(F.col("doc_id").alias("media_id")),
        dense=True,  # per-row payload generator: bytes-in is no work proxy
    )
    if kind is not None:
        ids = ids.filter(F.pmod("media_id", F.lit(3)) == _KIND_MOD[kind])

    def fabricate(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mids = pdf["media_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": np.take(
                        np.array(["image", "audio", "video"]), mids % 3
                    ),
                    "payload": _fabricate_batch(mids),
                }
            )

    return ids.mapInPandas(fabricate, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Decode registry (magic → kernel); unknown formats raise, clearly marked
# ---------------------------------------------------------------------------


#: Standard-format signatures for the real-codec dispatch (r9, the r8
#: verdict's deploy-completeness ask): the RAW0/PCM0/VID0 family is the
#: synthetic corpus container; real formats route by signature to their
#: libraries — stdlib ``wave`` for PCM WAV (present in every CPython,
#: so this branch is EXERCISED, not skipped, by this container's
#: tests), Pillow for PNG/JPEG and PyAV for ISO-BMFF video behind
#: conditional imports (the rasterio pattern from sources/geotiff.py)
#: that raise a loud NotImplementedError naming the missing library.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8\xff"


#: PNG color type → sample count (IHDR byte 25; PLTE counts as 1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: sample count → PNG color type (the encoder's inverse of
#: _PNG_CHANNELS; palette type 3 is decode-only so the map is 1:1)
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


def _png_encode(arr: np.ndarray, filters) -> bytes:
    """Encode an ``(h, w, ch)`` uint8 array as a REAL bit-depth-8 PNG
    with stdlib zlib + numpy only — no Pillow.

    ``filters[r]`` picks the per-row filter type (0 None / 1 Sub /
    2 Up / 3 Average / 4 Paeth). Forward filtering reads only RAW
    neighbor bytes (the sequential data dependency is in the DECODE
    direction), so every row vectorizes here. The IDAT stream is a
    single hand-framed deflate STORED block (zlib level-0 framing:
    2-byte header, 5-byte block header, raw scanlines, 4-byte adler32)
    — that makes the container size a pure function of the dimensions,
    ``len = h*(w*ch+1) + 68``, which is the framing arithmetic m08's
    oracle pins (a silent reroute through the RAW arm or a mis-framed
    chunk walk breaks the driver hash, not just a pytest)."""
    import zlib

    h, w, ch = arr.shape
    sl = w * ch
    raw = arr.reshape(h, sl).astype(np.int16)
    prev = np.zeros(sl, np.int16)
    lines = []
    for r in range(h):
        cur = raw[r]
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        f = int(filters[r])
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - (left + prev) // 2
        elif f == 4:
            upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            out = cur - pred
        else:
            raise ValueError(f"bad PNG filter type {f}")
        lines.append(bytes([f]) + (out % 256).astype(np.uint8).tobytes())
        prev = cur
    data = b"".join(lines)
    if len(data) > 0xFFFF:
        raise ValueError(
            "encoder frames one stored block: scanline stream "
            f"{len(data)} bytes > 65535"
        )
    zdata = (
        b"\x78\x01\x01"  # zlib CMF/FLG + BFINAL|stored block header
        + len(data).to_bytes(2, "little")
        + (len(data) ^ 0xFFFF).to_bytes(2, "little")
        + data
        + zlib.adler32(data).to_bytes(4, "big")
    )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, _PNG_COLOR_TYPE[ch], 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zdata)
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(data: np.ndarray, h: int, sl: int, bpp: int) -> np.ndarray:
    """Reconstruct ``h`` scanlines of ``sl`` bytes from the inflated
    filtered stream (PNG spec §9 Recon): None/Up are pure vector ops,
    Sub is a per-channel-offset cumsum (the left-neighbor recurrence IS
    a prefix sum mod 256), Average/Paeth carry a genuine sequential
    left dependency and run per byte IN PYTHON — acceptable for the
    fabricated fixture corpus this container exercises (rows ≤ a few
    hundred bytes; whole-suite cost ~1 s) but interpreter-speed
    O(h·w·ch) on arbitrary real images: a single 4K RGBA row is
    ~16 KB, so a corpus of large real PNGs should not route through
    this arm — deployments with such data install Pillow and flip the
    dispatch preference in ``_decode_image_real`` (one branch swap;
    the exotic-variant fallback already lands there). Correctness
    holds at any size; only speed is scoped. The kernel runs inside
    an Arrow-batched mapInPandas stage, so the loop never touches the
    driver."""
    rows = data.reshape(h, sl + 1)
    out = np.zeros((h, sl), np.int64)
    prev = np.zeros(sl, np.int64)
    for r in range(h):
        f = int(rows[r, 0])
        raw = rows[r, 1:].astype(np.int64)
        if f == 0:
            cur = raw
        elif f == 1:
            cur = raw.copy()
            for c in range(bpp):
                cur[c::bpp] = np.cumsum(cur[c::bpp]) % 256
        elif f == 2:
            cur = (raw + prev) % 256
        elif f in (3, 4):
            cur = np.zeros(sl, np.int64)
            for i in range(sl):
                left = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                if f == 3:
                    cur[i] = (raw[i] + (left + up) // 2) % 256
                else:
                    ul = prev[i - bpp] if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul)
                    )
                    cur[i] = (raw[i] + pred) % 256
        else:
            raise ValueError(f"corrupt PNG: filter type {f}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8)


def _png_decode_pure(payload: bytes) -> tuple[dict, np.ndarray]:
    """Full pure-python PNG decode — stdlib zlib + numpy, no Pillow:
    chunk walk with CRC verification, IDAT concatenation + inflate,
    scanline unfiltering for all five filter types. Covers bit depth 8,
    color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), non-interlaced —
    the same effort class as the any-layout TIFF LZW codec
    (sources/tiff.py). Palette / 16-bit / Adam7 raise
    NotImplementedError (the caller falls through to Pillow where
    installed); malformed bytes raise ValueError per the codec-layer
    error contract."""
    import zlib

    pos, n = 8, len(payload)
    meta: dict | None = None
    depth = ctype = interlace = -1
    idat: list[bytes] = []
    seen_iend = False
    while pos + 12 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        end = pos + 8 + ln
        if end + 4 > n:
            raise ValueError(f"corrupt PNG: truncated {tag!r} chunk")
        body = payload[pos + 8 : end]
        if zlib.crc32(tag + body) != int.from_bytes(
            payload[end : end + 4], "big"
        ):
            raise ValueError(f"corrupt PNG: bad {tag!r} CRC")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("corrupt PNG: IHDR body != 13 bytes")
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, interlace = body[8], body[9], body[12]
            ch = _PNG_CHANNELS.get(ctype)
            if ch is None:
                raise ValueError(f"corrupt PNG payload: color type {ctype}")
            meta = {"width": w, "height": h, "channels": ch}
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            seen_iend = True
            break
        pos = end + 4
    if meta is None or not seen_iend or not idat:
        raise ValueError("corrupt PNG: missing IHDR/IDAT/IEND")
    if ctype == 3 or depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"no pure decoder for PNG depth={depth} color_type={ctype} "
            f"interlace={interlace}: only 8-bit non-interlaced "
            "gray/RGB/gray+alpha/RGBA are wired Pillow-free"
        )
    w, h, ch = meta["width"], meta["height"], meta["channels"]
    expected = h * (w * ch + 1)
    # bounded inflate: cap output at the IHDR-declared scanline-stream
    # size + 1 so a decompression-bomb IDAT (tiny compressed bytes
    # declaring a huge inflate) can allocate at most expected+1 bytes
    # in the executor before the corrupt-PNG error fires (ADVICE r11 —
    # a bare zlib.decompress would materialize the whole bomb first)
    dec = zlib.decompressobj()
    try:
        stream = dec.decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: IDAT inflate failed: {exc}") from exc
    if len(stream) > expected or dec.unconsumed_tail:
        raise ValueError(
            f"corrupt PNG: IDAT inflates past the IHDR-declared "
            f"{expected}-byte scanline stream"
        )
    if len(stream) != expected or not dec.eof:
        raise ValueError(
            f"corrupt PNG: scanline stream {len(stream)} bytes "
            f"(complete={dec.eof}), expected {expected}"
        )
    pixels = _png_unfilter(
        np.frombuffer(stream, np.uint8), h, w * ch, ch
    ).reshape(h, w, ch)
    return meta, pixels


def _jpeg_meta(payload: bytes) -> dict:
    """Header-only JPEG metadata: a pure marker-segment walk (ITU-T
    T.81 §B): skip APPn/DQT/DHT/... segments by their 2-byte lengths
    until the frame header (SOF₀–SOF₁₅, minus the non-frame 0xC4 DHT /
    0xC8 JPG / 0xCC DAC codes), whose payload carries precision,
    height, width, component count — so ``metadata_only`` needs no
    Pillow for JPEG either, completing the header-only contract for
    every real format (r11; the JPEG twin of the PNG IHDR read and the
    BMFF moov walk). Entropy-coded data is never reached: SOF precedes
    SOS in every legal stream. Malformed streams raise ValueError."""
    n = len(payload)
    pos = 2  # past the 0xFFD8 SOI the dispatch already matched
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(
                f"corrupt JPEG: expected marker at {pos}, "
                f"got 0x{payload[pos]:02x}"
            )
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte, marker continues
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)):
            # standalone TEM/RSTn are only legal INSIDE entropy-coded
            # data (T.81 §B.1.1.3), which starts after SOS — in the
            # header segment area this walk covers they mark a
            # malformed stream, so reject rather than skip (ADVICE r11:
            # the old leniency parsed some broken streams as valid)
            raise ValueError(
                f"corrupt JPEG: standalone marker 0x{marker:02x} "
                "before SOS (TEM/RSTn are entropy-data-only)"
            )
        if marker in (0xD8, 0xD9):  # SOI/EOI before any SOF
            raise ValueError("corrupt JPEG: no SOF before SOI/EOI")
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError(
                f"corrupt JPEG: segment 0x{marker:02x} length {seg_len} "
                "overruns"
            )
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            body = payload[pos + 4 : pos + 2 + seg_len]
            if len(body) < 6:
                raise ValueError("corrupt JPEG: truncated SOF payload")
            return {
                "width": int.from_bytes(body[3:5], "big"),
                "height": int.from_bytes(body[1:3], "big"),
                "channels": body[5],
            }
        if marker == 0xDA:  # SOS: entropy data follows — SOF never did
            raise ValueError("corrupt JPEG: SOS before any SOF marker")
        pos += 2 + seg_len
    raise ValueError("corrupt JPEG: no SOF marker in stream")


def _decode_image_real(
    payload: bytes, metadata_only: bool = False
) -> tuple[str, dict, np.ndarray | None]:
    if metadata_only and payload[:3] == _JPEG_SIG:
        # header-only JPEG: SOF marker walk, no Pillow, no entropy data
        return "image", _jpeg_meta(payload), None
    if metadata_only and payload.startswith(_PNG_SIG):
        # header-only PNG: width/height/channels live in the fixed-
        # position IHDR chunk — no pixel decode, no Pillow needed, so
        # the metadata_only contract holds even where the library is
        # absent
        if len(payload) < 26:
            raise ValueError(
                f"corrupt PNG payload: {len(payload)} bytes, no IHDR"
            )
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        ch = _PNG_CHANNELS.get(payload[25])
        if ch is None:
            raise ValueError(
                f"corrupt PNG payload: color type {payload[25]}"
            )
        return "image", {"width": w, "height": h, "channels": ch}, None
    if payload.startswith(_PNG_SIG):
        # full PNG decode is Pillow-free for the common shape (8-bit,
        # non-interlaced, non-palette): stdlib zlib inflate + numpy
        # scanline unfiltering — this is the arm m08's driver hash
        # exercises on REAL container bytes. Exotic variants fall
        # through to Pillow where installed.
        try:
            meta, arr = _png_decode_pure(payload)
            return "image", meta, arr
        except NotImplementedError as pure_exc:
            try:
                from PIL import Image  # noqa: F401 — presence probe
            except ImportError:
                raise NotImplementedError(
                    f"{pure_exc} — install Pillow for this PNG variant"
                ) from pure_exc
    try:
        from PIL import Image  # conditional: absent in this container
    except ImportError as exc:
        raise NotImplementedError(
            "no decoder for JPEG payload: install Pillow — the "
            "dispatch is wired (decode_payload), only the library is "
            "absent"
        ) from exc
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            if metadata_only:
                w, h = im.size
                return (
                    "image",
                    {"width": w, "height": h, "channels": len(im.getbands())},
                    None,
                )
            arr = np.asarray(im)
    except Exception as exc:
        if isinstance(exc, (NotImplementedError, ValueError)):
            raise
        raise ValueError(f"corrupt image payload: {exc}") from exc
    if arr.ndim == 2:  # grayscale → explicit single channel
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    return "image", {"width": w, "height": h, "channels": ch}, arr


def _decode_wav(
    payload: bytes, metadata_only: bool = False
) -> tuple[str, dict, np.ndarray | None]:
    """PCM16 WAV via the stdlib ``wave`` module — a REAL codec branch
    with no third-party dependency. Output shape matches the PCM0 arm:
    int16 samples, {sample_rate, n_samples} metadata, where
    ``n_samples`` is the TOTAL int16 count (frames × channels) — the
    PCM0 convention — so the feature column means the same thing for
    every audio format (ADVICE r9: a stereo WAV must not report half
    the figure of an equivalent PCM0 row). ``metadata_only`` stops
    after the chunk headers (``wave`` reads data lazily), so the
    header-only contract holds for real formats too. Corrupt RIFF
    surfaces as ValueError, not a bare ``wave.Error``."""
    import io
    import wave as _wave

    try:
        with _wave.open(io.BytesIO(payload), "rb") as wf:
            sw, ch = wf.getsampwidth(), wf.getnchannels()
            if sw != 2:
                raise NotImplementedError(
                    f"no decoder for {8 * sw}-bit WAV: only PCM16 is wired"
                )
            sr, n = wf.getframerate(), wf.getnframes()
            meta = {"sample_rate": sr, "n_samples": n * ch}
            if metadata_only:
                return "audio", meta, None
            frames = wf.readframes(n)
    except NotImplementedError:
        raise  # our own named refusal (a RuntimeError subclass!)
    except (_wave.Error, EOFError, OSError, RuntimeError) as exc:
        # wave delegates chunk walking to chunk.py and its own _Chunk
        # wrapper, which leak EOFError/OSError/bare RuntimeError on
        # truncated or lying chunk tables — all of these are "corrupt
        # container" here (the input is a BytesIO, so OSError cannot
        # mean a real I/O fault; every op in the try is wave-internal)
        raise ValueError(f"corrupt WAV payload: {exc}") from exc
    arr = np.frombuffer(frames, "<i2")
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return "audio", meta, arr


def _bmff_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO-BMFF box in
    buf[start:end] (ISO/IEC 14496-12 §4.2: 32-bit size + fourcc, with
    the size==1 64-bit largesize and size==0 to-end escapes)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("corrupt ISO-BMFF: truncated largesize")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"corrupt ISO-BMFF: box {btype!r} size {size} overruns"
            )
        yield btype, pos + hdr, pos + size
        pos += size


def _bmff_video_meta(payload: bytes) -> dict:
    """Header-only ISO-BMFF metadata: width/height from the video
    track's ``tkhd`` (16.16 fixed point, the box's last 8 bytes) and
    n_frames from its ``stbl/stsz`` sample_count — a pure moov-box walk
    with no codec library, the video twin of the Pillow-free PNG IHDR
    path, so extract_features(metadata_only=True) never touches frame
    bodies (ADVICE r9)."""

    def children(span):  # (start, end) → {type: (start, end), ...} first-wins
        out = {}
        for t, s, e in _bmff_boxes(payload, *span):
            out.setdefault(t, (s, e))
        return out

    top = children((0, len(payload)))
    if b"moov" not in top:
        raise ValueError("corrupt ISO-BMFF: no moov box")
    for t, s, e in _bmff_boxes(payload, *top[b"moov"]):
        if t != b"trak":
            continue
        trak = children((s, e))
        if b"tkhd" not in trak or b"mdia" not in trak:
            continue
        mdia = children(trak[b"mdia"])
        hdlr = mdia.get(b"hdlr")
        # handler_type 'vide' marks the video track (byte 8 of hdlr
        # body); clamp the read to the box end so a short lying hdlr
        # can never match against the NEXT sibling box's bytes
        if (
            not hdlr
            or payload[hdlr[0] + 8 : min(hdlr[0] + 12, hdlr[1])] != b"vide"
        ):
            continue
        ts, te = trak[b"tkhd"]
        # tkhd is a FullBox with a fixed body: 84 bytes for version 0,
        # 96 for version 1 (ISO 14496-12 §8.2.2) — any other length is
        # malformed, and reading "the last 8 bytes" of it would yield
        # silent garbage dimensions instead of the codec-layer
        # ValueError every other malformation raises (ADVICE r10)
        if (
            te - ts < 1
            or payload[ts] not in (0, 1)
            or (te - ts) != (84, 96)[payload[ts]]
        ):
            raise ValueError(
                f"corrupt ISO-BMFF: tkhd body {te - ts} bytes "
                "(84 for v0 / 96 for v1)"
            )
        w = int.from_bytes(payload[te - 8 : te - 4], "big") >> 16
        h = int.from_bytes(payload[te - 4 : te], "big") >> 16
        n_frames = None
        if b"minf" in mdia:
            stbl = children(mdia[b"minf"]).get(b"stbl")
            if stbl:
                stsz = children(stbl).get(b"stsz")
                if stsz and stsz[1] - stsz[0] >= 12:
                    # stsz body: version+flags, sample_size, sample_count
                    n_frames = int.from_bytes(
                        payload[stsz[0] + 8 : stsz[0] + 12], "big"
                    )
        if n_frames is None:
            raise ValueError("corrupt ISO-BMFF: video track without stsz")
        return {"width": w, "height": h, "n_frames": n_frames}
    raise ValueError("corrupt ISO-BMFF: no video track in moov")


def _decode_video_real(
    payload: bytes, metadata_only: bool = False
) -> tuple[str, dict, np.ndarray | None]:
    if metadata_only:
        # moov box walk — no PyAV, no frame decode (ADVICE r9: the
        # header-only contract must hold for every format)
        return "video", _bmff_video_meta(payload), None
    try:
        import av  # conditional: absent in this container
    except ImportError as exc:
        raise NotImplementedError(
            "no decoder for ISO-BMFF video payload: install PyAV (av) "
            "— the dispatch is wired, only the library is absent"
        ) from exc
    import io

    frames = []
    with av.open(io.BytesIO(payload)) as container:
        for frame in container.decode(container.streams.video[0]):
            frames.append(frame.to_ndarray(format="gray"))
    arr = (
        np.stack(frames) if frames else np.empty((0, 0, 0), np.uint8)
    )
    n, h, w = arr.shape
    return "video", {"width": w, "height": h, "n_frames": n}, arr


def decode_payload(
    payload: bytes, metadata_only: bool = False
) -> tuple[str, dict, np.ndarray | None]:
    """Binary payload → (kind, metadata, sample array).

    The RAW container family (synthetic corpus) decodes inline and
    vectorized; standard formats dispatch by signature (see _PNG_SIG
    block comment) — WAV and 8-bit non-interlaced PNG decode for real
    everywhere (stdlib zlib/wave + numpy), exotic PNG variants, JPEG
    and video frame bodies light up when Pillow/PyAV are installed,
    with no code change.

    ``metadata_only=True`` returns (kind, metadata, None) without
    touching the body — WAV reads chunk headers only, PNG parses the
    IHDR directly, JPEG walks marker segments to the SOF, ISO-BMFF
    walks the moov tree (all library-free), the RAW family skips the
    buffer view. Error contract: unknown-but-plausible formats raise
    NotImplementedError naming the missing library; malformed bytes
    (too short, corrupt container) raise ValueError at this layer —
    never a bare struct/wave error from the internals."""
    if payload.startswith(_PNG_SIG) or payload[:3] == _JPEG_SIG:
        return _decode_image_real(payload, metadata_only)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, metadata_only)
    if payload[4:8] == b"ftyp":  # ISO-BMFF (MP4/MOV) box structure
        return _decode_video_real(payload, metadata_only)
    if len(payload) < _HEADER_SIZE:
        raise ValueError(
            f"payload too short for any known container "
            f"({len(payload)} bytes < {_HEADER_SIZE}-byte RAW header)"
        )
    magic, a, b, c = struct.unpack_from(_HEADER_FMT, payload, 0)
    if magic == _MAGIC_IMAGE:
        meta = {"width": a, "height": b, "channels": c}
        if metadata_only:
            return "image", meta, None
        arr = np.frombuffer(
            payload, np.uint8, a * b * c, _HEADER_SIZE
        ).reshape(b, a, c)
        return "image", meta, arr
    if magic == _MAGIC_AUDIO:
        meta = {"sample_rate": a, "n_samples": b}
        if metadata_only:
            return "audio", meta, None
        return "audio", meta, np.frombuffer(payload, "<i2", b, _HEADER_SIZE)
    if magic == _MAGIC_VIDEO:
        meta = {"width": a, "height": b, "n_frames": c}
        if metadata_only:
            return "video", meta, None
        arr = np.frombuffer(
            payload, np.uint8, a * b * c, _HEADER_SIZE
        ).reshape(c, b, a)
        return "video", meta, arr
    raise NotImplementedError(
        f"no decoder for magic {magic!r}: known formats are the RAW "
        "container family plus WAV (stdlib), PNG (stdlib zlib; exotic "
        "variants and JPEG via Pillow), and ISO-BMFF video (header "
        "walk; frame bodies via PyAV)"
    )


def extract_features(media: DataFrame, metadata_only: bool = False) -> DataFrame:
    """Decode + feature-extract: one output row per media row.

    Map-only stage; batch shape preserved (one pandas frame in → one
    out), so Arrow batch sizing (spark.sql.execution.arrow.
    maxRecordsPerBatch) fully controls peak memory.

    ``metadata_only=True`` decodes headers but skips the body scan
    (``intensity`` comes back 0.0) — hand-applied projection pushdown
    for consumers that aggregate sizes/dims only: Catalyst cannot prune
    columns *inside* a Python kernel, so the caller must say what it
    reads. At 100 TB this is the difference between touching 16 bytes
    and the full payload per row.
    """

    def _segment_sums(values: np.ndarray, lens: np.ndarray) -> np.ndarray:
        # per-segment sums over a concatenation of variable-length rows:
        # one cumsum + a gather, no per-row Python (reduceat would
        # overflow on uint8; the cumsum accumulates in float64/int64)
        cs = np.concatenate([[0], np.cumsum(values, dtype=np.float64)])
        ends = np.cumsum(lens)
        return cs[ends] - cs[ends - lens]

    def kernel(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            n = len(payloads)
            if n == 0:
                continue
            heads = np.frombuffer(
                # ljust: a short real-format payload (not RAW) must not
                # corrupt the vectorized header scan — its row routes
                # through the per-row slow path below anyway
                b"".join(p[:_HEADER_SIZE].ljust(_HEADER_SIZE, b"\0")
                         for p in payloads),
                dtype=np.dtype(
                    [("magic", "S4"), ("a", "<u4"), ("b", "<u4"), ("c", "<u4")]
                ),
            )
            magic = heads["magic"]
            a = heads["a"].astype(np.int64)
            b = heads["b"].astype(np.int64)
            c = heads["c"].astype(np.int64)
            is_img = magic == _MAGIC_IMAGE
            is_aud = magic == _MAGIC_AUDIO
            is_vid = magic == _MAGIC_VIDEO
            unknown = ~(is_img | is_aud | is_vid)
            # real-format rows (WAV/PNG/JPEG/video containers) take the
            # per-row decode_payload slow path — still inside this Arrow
            # batch, so the RAW fast lanes stay fully vectorized and a
            # genuinely unknown magic raises loudly from the dispatch.
            # The decoded row is merged back below; zero out the header
            # fields so the vectorized lanes never read real-format
            # rows' garbage a/b/c.
            slow: dict[int, tuple] = {}
            if unknown.any():
                for i in np.nonzero(unknown)[0]:
                    # metadata_only propagates: header-only real-format
                    # parses (WAV chunk headers, PNG IHDR) keep the
                    # "touch 16 bytes, not the body" contract on the
                    # slow path too
                    slow[int(i)] = decode_payload(
                        payloads[int(i)], metadata_only=metadata_only
                    )
                a[unknown] = b[unknown] = c[unknown] = 0

            intensity = np.zeros(n, np.float64)
            pix = is_img | is_vid  # both carry uint8 bodies of a·b·c
            # degenerate zero-length bodies (0-frame video, 0-sample
            # audio) keep the lanes' 0.0 default instead of emitting a
            # 0/0 NaN with a runtime warning (ADVICE r9)
            if not metadata_only and pix.any():
                idx = np.nonzero(pix)[0]
                lens = (a * b * c)[idx]
                big = np.frombuffer(
                    b"".join(payloads[i][_HEADER_SIZE:] for i in idx), np.uint8
                )
                intensity[idx] = np.divide(
                    _segment_sums(big, lens),
                    lens,
                    out=np.zeros(len(idx)),
                    where=lens > 0,
                )
            if not metadata_only and is_aud.any():
                idx = np.nonzero(is_aud)[0]
                lens = b[idx]
                xs = np.frombuffer(
                    b"".join(payloads[i][_HEADER_SIZE:] for i in idx), "<i2"
                ).astype(np.float64)
                intensity[idx] = np.sqrt(
                    np.divide(
                        _segment_sums(xs * xs, lens),
                        lens,
                        out=np.zeros(len(idx)),
                        where=lens > 0,
                    )
                )

            def opt(vals: np.ndarray, mask: np.ndarray) -> pd.Series:
                s = pd.Series(vals.astype("int32"), dtype="Int32")
                s[~mask] = pd.NA
                return s

            kind = np.where(is_img, "image", np.where(is_aud, "audio", "video"))
            body = np.where(is_aud, 2 * b, a * b * c)
            frame = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kind,
                    "payload_bytes": _HEADER_SIZE + body,
                    "width": opt(a, pix),
                    "height": opt(b, pix),
                    "channels": opt(c, is_img),
                    "sample_rate": opt(a, is_aud),
                    "n_samples": opt(b, is_aud),
                    "n_frames": opt(c, is_vid),
                    "intensity": intensity,
                }
            )
            # merge the real-format slow-path rows (same feature
            # semantics as the RAW lanes: mean pixel / RMS sample;
            # empty decoded arrays — zero-frame video, zero-frame WAV —
            # take the lanes' 0.0 default, not a NaN-with-warning
            # (ADVICE r9))
            for i, (k, meta, arr) in slow.items():
                frame.loc[i, "kind"] = k
                frame.loc[i, "payload_bytes"] = len(payloads[i])
                if k == "image":
                    frame.loc[i, "width"] = meta["width"]
                    frame.loc[i, "height"] = meta["height"]
                    frame.loc[i, "channels"] = meta["channels"]
                    if not metadata_only:
                        frame.loc[i, "intensity"] = (
                            float(arr.mean()) if arr.size else 0.0
                        )
                elif k == "audio":
                    frame.loc[i, "sample_rate"] = meta["sample_rate"]
                    frame.loc[i, "n_samples"] = meta["n_samples"]
                    if not metadata_only:
                        xs = arr.astype(np.float64)
                        frame.loc[i, "intensity"] = (
                            float(np.sqrt((xs * xs).mean()))
                            if xs.size
                            else 0.0
                        )
                else:
                    frame.loc[i, "width"] = meta["width"]
                    frame.loc[i, "height"] = meta["height"]
                    frame.loc[i, "n_frames"] = meta["n_frames"]
                    if not metadata_only:
                        frame.loc[i, "intensity"] = (
                            float(arr.mean()) if arr.size else 0.0
                        )
            yield frame

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


#: RAW0-family 16-byte header layout (magic + three <u4 fields) — the
#: vectorized kernels' one-pass header scan (same layout extract_features
#: parses inline).
_RAW_HEAD_DTYPE = np.dtype(
    [("magic", "S4"), ("a", "<u4"), ("b", "<u4"), ("c", "<u4")]
)


def _raw_heads(payloads: list) -> "np.ndarray":
    """Vectorized header parse of a payload batch (short rows padded —
    they route through the per-row slow path, which re-checks lengths)."""
    return np.frombuffer(
        b"".join(
            p[:_HEADER_SIZE].ljust(_HEADER_SIZE, b"\0") for p in payloads
        ),
        dtype=_RAW_HEAD_DTYPE,
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of image payloads (non-images dropped).
    Real numpy implementation — index-map resampling, re-encoded RAW0.

    r12 optimization (guide §4.2): RAW0 images batch-decode per
    (w, h, c) shape group — one ``frombuffer`` + two fancy-index
    gathers resample EVERY image of that shape at once (the corpus has
    ≤80 distinct shapes by the fabrication law), replacing the
    per-row decode→index→resample Python loop. Non-RAW payloads (real
    PNG/JPEG) and short rows keep the per-row ``decode_payload`` slow
    path; outputs are byte-identical either way (same index-map
    arithmetic, pinned by tests)."""

    def kernel(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            n = len(payloads)
            if n == 0:
                continue
            heads = _raw_heads(payloads)
            a = heads["a"].astype(np.int64)
            b = heads["b"].astype(np.int64)
            c = heads["c"].astype(np.int64)
            lens = np.array([len(p) for p in payloads], np.int64)
            fast = (heads["magic"] == _MAGIC_IMAGE) & (
                lens >= _HEADER_SIZE + a * b * c
            )
            out: list = [None] * n
            for i in np.nonzero(~fast)[0]:
                kind, meta, arr = decode_payload(payloads[int(i)])
                if kind != "image":
                    continue
                ys = (np.arange(height) * meta["height"] // height).astype(
                    np.intp
                )
                xs = (np.arange(width) * meta["width"] // width).astype(
                    np.intp
                )
                head = _pack_header(
                    _MAGIC_IMAGE, width, height, meta["channels"]
                )
                out[int(i)] = head + np.ascontiguousarray(
                    arr[ys][:, xs]
                ).tobytes()
            if fast.any():
                shapes = np.stack([a, b, c], axis=1)
                fi = np.nonzero(fast)[0]
                for key in np.unique(shapes[fi], axis=0):
                    w0, h0, c0 = (int(v) for v in key)
                    idx = fi[np.all(shapes[fi] == key, axis=1)]
                    body = w0 * h0 * c0
                    big = np.frombuffer(
                        b"".join(
                            payloads[int(i)][
                                _HEADER_SIZE : _HEADER_SIZE + body
                            ]
                            for i in idx
                        ),
                        np.uint8,
                    ).reshape(len(idx), h0, w0, c0)
                    ys = (np.arange(height) * h0 // height).astype(np.intp)
                    xs = (np.arange(width) * w0 // width).astype(np.intp)
                    res = np.ascontiguousarray(big[:, ys][:, :, xs]).reshape(
                        len(idx), -1
                    )
                    head = _pack_header(_MAGIC_IMAGE, width, height, c0)
                    for j, i in enumerate(idx):
                        out[int(i)] = head + res[j].tobytes()
            keep = [i for i in range(n) if out[i] is not None]
            yield pd.DataFrame(
                {
                    "media_id": [
                        int(pdf["media_id"].iloc[i]) for i in keep
                    ],
                    "kind": ["image"] * len(keep),
                    "payload": [out[i] for i in keep],
                }
            )

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def decimate_audio(media: DataFrame, factor: int = 2) -> DataFrame:
    """Audio downsample by integer decimation (keep every ``factor``-th
    sample, divide the rate) — the 1-D twin of the image resize's
    index-map resampling. Non-audio rows are dropped; output is
    re-encoded PCM0. (Real resampling would low-pass first — with
    soundfile/scipy absent this is the honest index-map core, and the
    arithmetic stays exactly oracle-reproducible.)

    r12 optimization (guide §4.2): RAW0 (mono PCM0) rows batch-decode
    per sample-count group — one ``frombuffer`` + one strided slice
    decimates every same-length clip at once (≤10 distinct lengths by
    the fabrication law). Multi-channel WAV and other real formats
    keep the per-row slow path (frame-axis decimation, interleaved
    re-flatten); outputs byte-identical either way."""

    def kernel(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            n = len(payloads)
            if n == 0:
                continue
            heads = _raw_heads(payloads)
            a = heads["a"].astype(np.int64)
            b = heads["b"].astype(np.int64)
            lens = np.array([len(p) for p in payloads], np.int64)
            fast = (heads["magic"] == _MAGIC_AUDIO) & (
                lens >= _HEADER_SIZE + 2 * b
            )
            out: list = [None] * n
            for i in np.nonzero(~fast)[0]:
                kind, meta, arr = decode_payload(payloads[int(i)])
                if kind != "audio":
                    continue
                # arr is (n,) mono or (n, ch) for multi-channel WAV
                # (decodable since r9): decimate along the FRAME axis,
                # then flatten interleaved so the PCM0 invariant
                # body == 2·b (b = total int16 count) always holds —
                # packing frame count with an interleaved body would
                # truncate half the samples on the next decode.
                dec = np.ascontiguousarray(arr[::factor]).reshape(-1)
                head = _pack_header(
                    _MAGIC_AUDIO, meta["sample_rate"] // factor, dec.size, 0
                )
                out[int(i)] = head + dec.astype("<i2").tobytes()
            if fast.any():
                fi = np.nonzero(fast)[0]
                for n0 in np.unique(b[fi]):
                    idx = fi[b[fi] == n0]
                    n0 = int(n0)
                    big = np.frombuffer(
                        b"".join(
                            payloads[int(i)][
                                _HEADER_SIZE : _HEADER_SIZE + 2 * n0
                            ]
                            for i in idx
                        ),
                        "<i2",
                    ).reshape(len(idx), n0)
                    dec = np.ascontiguousarray(big[:, ::factor])
                    n_dec = dec.shape[1]
                    for j, i in enumerate(idx):
                        head = _pack_header(
                            _MAGIC_AUDIO, int(a[i]) // factor, n_dec, 0
                        )
                        out[int(i)] = head + dec[j].tobytes()
            keep = [i for i in range(n) if out[i] is not None]
            yield pd.DataFrame(
                {
                    "media_id": [
                        int(pdf["media_id"].iloc[i]) for i in keep
                    ],
                    "kind": ["audio"] * len(keep),
                    "payload": [out[i] for i in keep],
                }
            )

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling — a UDTF (1 row → n_frames/k rows), the same
    generator shape as the GeoTIFF flatten (SURVEY §2.2 R5).

    r12 optimization (guide §4.2): RAW0 videos batch-decode per
    (w, h, n_frames) group (≤24 distinct combos by the fabrication
    law) — one ``frombuffer`` + one strided frame slice per group
    replaces the per-row decode→per-frame-copy Python loop; the
    emitted rows (order, indices, bytes) are identical. Non-RAW
    payloads keep the per-row ``decode_payload`` slow path (which for
    real ISO-BMFF raises until PyAV is installed, as before)."""

    def kernel(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            n = len(payloads)
            if n == 0:
                continue
            heads = _raw_heads(payloads)
            a = heads["a"].astype(np.int64)
            b = heads["b"].astype(np.int64)
            c = heads["c"].astype(np.int64)
            lens = np.array([len(p) for p in payloads], np.int64)
            fast = (heads["magic"] == _MAGIC_VIDEO) & (
                lens >= _HEADER_SIZE + a * b * c
            )
            # (frame_idx list, frame bytes list) per input row, merged
            # in input order below so the emitted row order matches the
            # old per-row loop exactly
            out: list = [None] * n
            for i in np.nonzero(~fast)[0]:
                kind, meta, arr = decode_payload(payloads[int(i)])
                if kind != "video":
                    continue
                idxs = list(range(0, meta["n_frames"], every_k))
                out[int(i)] = (idxs, [arr[j].tobytes() for j in idxs])
            if fast.any():
                shapes = np.stack([a, b, c], axis=1)
                fi = np.nonzero(fast)[0]
                for key in np.unique(shapes[fi], axis=0):
                    w0, h0, f0 = (int(v) for v in key)
                    idx = fi[np.all(shapes[fi] == key, axis=1)]
                    body = w0 * h0 * f0
                    fsize = w0 * h0
                    sel = np.ascontiguousarray(
                        np.frombuffer(
                            b"".join(
                                payloads[int(i)][
                                    _HEADER_SIZE : _HEADER_SIZE + body
                                ]
                                for i in idx
                            ),
                            np.uint8,
                        )
                        .reshape(len(idx), f0, fsize)[:, ::every_k]
                    )
                    idxs = list(range(0, f0, every_k))
                    for j, i in enumerate(idx):
                        out[int(i)] = (
                            idxs,
                            [sel[j, q].tobytes() for q in range(len(idxs))],
                        )
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for i in range(n):
                if out[i] is None:
                    continue
                mid = int(pdf["media_id"].iloc[i])
                idxs, frames = out[i]
                rows["media_id"].extend([mid] * len(idxs))
                rows["frame_idx"].extend(idxs)
                rows["frame"].extend(frames)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Driver-contract query: decoded-header metadata aggregate, SQL oracle
# ---------------------------------------------------------------------------


def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate → decode → per-kind aggregate. The Spark side reads
    sizes out of the binary headers it decoded; the oracle recomputes
    them arithmetically from doc_id (media_params mirrored in SQL).
    Header-only decode (metadata_only): the aggregate reads sizes and
    dims, never pixel/sample content — m02/m04/m05 pin body content."""
    feats = extract_features(media_table(spark, sf_dir), metadata_only=True)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("payload_bytes").alias("total_bytes"),
            round_half_up(
                F.avg(F.coalesce(F.col("width"), F.col("n_samples"))), 2
            ).alias("avg_dim"),
        )
        .orderBy("kind")
    )


#: media_params / _fabricate_payload expressed arithmetically. Payload
#: bytes: image 16 + w·h·c; audio 16 + 2·n; video 16 + w·h·f.
_M01_ORACLE = """
WITH params AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         16 + (doc_id % 8) * 4 AS img_w,
         12 + (doc_id % 5) * 4 AS img_h,
         1 + (doc_id % 2)      AS img_c,
         256 + (doc_id % 10) * 64 AS aud_n,
         16 + (doc_id % 4) * 8 AS vid_w,
         4 + doc_id % 6        AS vid_f
  FROM documents
), sized AS (
  SELECT kind,
         CASE kind
           WHEN 'image' THEN 16 + img_w * img_h * img_c
           WHEN 'audio' THEN 16 + 2 * aud_n
           ELSE 16 + vid_w * 16 * vid_f
         END AS payload_bytes,
         CASE kind WHEN 'audio' THEN aud_n
                   WHEN 'image' THEN img_w ELSE vid_w END AS dim
  FROM params
)
SELECT kind, count(*) AS cnt,
       CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
       CAST(floor(avg(CAST(dim AS DOUBLE)) * 100 + 0.5) AS BIGINT) / 100.0
         AS avg_dim
FROM sized GROUP BY kind ORDER BY kind
"""

def m02_image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate → nearest-neighbor resize to 8×8 → decode → aggregate.

    Drives the full resize path (decode, index-map resample, re-encode,
    re-decode) and pins its CONTENT: ``intensity`` is the mean pixel of
    the resized image — every picked pixel is ``(seed + flat_idx) % 256``
    so the oracle recomputes the identical sum arithmetically. The
    per-row intensity is an exact binary rational (denominator 64·c, a
    power of two), so the float sum is merge-order-exact."""
    feats = extract_features(
        resize_images(media_table(spark, sf_dir, kind="image"), 8, 8)
    )
    return (
        feats.groupBy("channels")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("payload_bytes").alias("total_bytes"),
            # a sum of 1/128-grid fractions CAN land exactly on 2-dp
            # midpoints (e.g. x.125) — the floor contract is load-bearing
            round_half_up(F.sum("intensity"), 2).alias("sum_intensity"),
        )
        .orderBy("channels")
    )


#: resized pixel (y',x',ch) picks source flat index
#: (y'·h//8)·w·c + (x'·w//8)·c + ch; value = (seed + idx) % 256.
_M02_ORACLE = """
WITH params AS (
  SELECT doc_id, doc_id % 256 AS seed,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         16 + (doc_id % 8) * 4 AS w,
         12 + (doc_id % 5) * 4 AS h,
         1 + (doc_id % 2)      AS c
  FROM documents
), imgs AS (
  SELECT * FROM params WHERE kind = 'image'
), pix AS (
  SELECT i.doc_id, i.c,
         (i.seed + ((y.y * i.h) // 8) * i.w * i.c
                 + ((x.x * i.w) // 8) * i.c + ch.ch) % 256 AS v
  FROM imgs i, range(8) y(y), range(8) x(x), range(2) ch(ch)
  WHERE ch.ch < i.c
), per_doc AS (
  SELECT doc_id, c, sum(v) AS sum_v FROM pix GROUP BY doc_id, c
)
SELECT CAST(c AS INTEGER) AS channels, count(*) AS cnt,
       CAST(count(*) * (16 + 64 * c) AS BIGINT) AS total_bytes,
       CAST(floor(sum(CAST(sum_v AS DOUBLE) / (64.0 * c)) * 100 + 0.5)
            AS BIGINT) / 100.0 AS sum_intensity
FROM per_doc GROUP BY c ORDER BY channels
"""


def m03_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate → sample every 2nd video frame (UDTF: 1 row →
    ceil(n_frames/2) rows) → aggregate row counts and frame bytes —
    pins the generator's fan-out and per-frame sizing."""
    frames = sample_frames(media_table(spark, sf_dir, kind="video"), every_k=2)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("media_id").alias("n_videos"),
        F.sum(F.octet_length("frame")).alias("total_bytes"),
    )


_M03_ORACLE = """
WITH params AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         16 + (doc_id % 4) * 8 AS vid_w,
         4 + doc_id % 6        AS vid_f
  FROM documents
)
SELECT CAST(sum((vid_f + 1) // 2) AS BIGINT) AS n_frames,
       count(*) AS n_videos,
       CAST(sum(((vid_f + 1) // 2) * vid_w * 16) AS BIGINT) AS total_bytes
FROM params WHERE kind = 'video'
"""

def m04_audio_energy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate → decode audio → per-sample-rate energy aggregate.

    Pins the audio DECODE content exactly: ``intensity`` is the decoded
    signal's RMS, so ``round(intensity²·n_samples)`` recovers the exact
    integer sum-of-squares (sumsq < 2⁵³, float64-exact up to the one
    division sqrt round-trips through), and the per-rate totals are
    integer sums — merge-order-proof, unlike summing float RMS values.
    The oracle regenerates the identical samples arithmetically.
    """
    feats = extract_features(media_table(spark, sf_dir, kind="audio"))
    energy = F.floor(
        F.col("intensity") * F.col("intensity") * F.col("n_samples") + 0.5
    ).cast("bigint")
    return (
        feats.groupBy("sample_rate")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_samples").alias("total_samples"),
            F.sum(energy).alias("total_energy"),
        )
        .orderBy("sample_rate")
    )


#: audio sample i of doc d: ((d%256 + i) % 4096) - 2048, n = 256+(d%10)·64
_M04_ORACLE = """
WITH params AS (
  SELECT doc_id, doc_id % 256 AS s,
         8000 + (doc_id % 4) * 4000 AS sr,
         256 + (doc_id % 10) * 64 AS n
  FROM documents WHERE doc_id % 3 = 1
), pix AS (
  SELECT doc_id, sr, n, ((s + unnest(range(n))) % 4096) - 2048 AS v
  FROM params
), per_doc AS (
  SELECT doc_id, sr, n, sum(v * v) AS sumsq
  FROM pix GROUP BY doc_id, sr, n
)
SELECT CAST(sr AS INTEGER) AS sample_rate, count(*) AS cnt,
       CAST(sum(n) AS BIGINT) AS total_samples,
       CAST(sum(sumsq) AS BIGINT) AS total_energy
FROM per_doc GROUP BY sr ORDER BY sample_rate
"""


def m05_audio_decimate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate → decimate by 2 → decode → energy aggregate: drives
    the audio transform path end-to-end and pins its CONTENT via m04's
    exact-integer energy recovery, now over the decimated signal
    (samples at even source indices, rate halved)."""
    feats = extract_features(
        decimate_audio(media_table(spark, sf_dir, kind="audio"), 2)
    )
    energy = F.floor(
        F.col("intensity") * F.col("intensity") * F.col("n_samples") + 0.5
    ).cast("bigint")
    return (
        feats.groupBy("sample_rate")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_samples").alias("total_samples"),
            F.sum(energy).alias("total_energy"),
        )
        .orderBy("sample_rate")
    )


#: decimated sample j of doc d reads source index 2j; rate halves
_M05_ORACLE = """
WITH params AS (
  SELECT doc_id, doc_id % 256 AS s,
         (8000 + (doc_id % 4) * 4000) // 2 AS sr,
         256 + (doc_id % 10) * 64 AS n
  FROM documents WHERE doc_id % 3 = 1
), pix AS (
  SELECT doc_id, sr, (n + 1) // 2 AS n_dec,
         ((s + 2 * unnest(range((n + 1) // 2))) % 4096) - 2048 AS v
  FROM params
), per_doc AS (
  SELECT doc_id, sr, n_dec, sum(v * v) AS sumsq
  FROM pix GROUP BY doc_id, sr, n_dec
)
SELECT CAST(sr AS INTEGER) AS sample_rate, count(*) AS cnt,
       CAST(sum(n_dec) AS BIGINT) AS total_samples,
       CAST(sum(sumsq) AS BIGINT) AS total_energy
FROM per_doc GROUP BY sr ORDER BY sample_rate
"""


def m06_frame_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m06: FRAME-level dedup audit — the multimodal member of the
    dedup family (d01 dedups documents by digest; this dedups FRAMES
    by digest, the rewatch-loop / repeated-intro / shared-b-roll case
    a video training pipeline must catch before frame features are
    paid for).

    Plan: fabricate → sample every 2nd frame (m03's UDTF) → md5 each
    frame's BYTES (the operator treats frames as opaque binary — no
    generator knowledge) → per video: sampled vs DISTINCT frame
    counts (within-video duplicates, the rewatch-loop signal) +
    ``n_videos_sharing`` = how many OTHER videos contain at least one
    identical frame (the shared-b-roll signal, via a digest-keyed
    distinct self-join — d04's inverted-index posture: candidates are
    actual hash collisions, never videos²).

    The oracle never sees the bytes: it re-derives frame identity
    arithmetically from the generator law (equal bytes ⇔ equal
    (width, start mod 256) — the m03/m04 oracle pattern), so the hash
    match certifies the decode+hash+join pipeline against first
    principles. On the fixture every video whose width is 16 steps
    its sampled frames by 2·16·16 = 512 ≡ 0 (mod 256) bytes — all
    identical — so the within-video audit is non-vacuous at every sf;
    cross-video sharing needs ids 768 apart and lights up from sf0.1.
    """
    from aw3d30_parquet_spark.functions.dedup import _scratch_persist_eager

    frames = sample_frames(
        media_table(spark, sf_dir, kind="video"), every_k=2
    )
    # r12 optimization: ONE persisted (media_id, digest, count)
    # aggregate replaces the two-tier fh/dist persist pair. The old
    # shape cached the raw hashed-frame stream and had AQE launch its
    # two consumers (per-video agg + distinct) as CONCURRENT jobs that
    # raced the unmaterialized cache — profile_jobs showed both 32-task
    # stages spanning the whole Python fabricate→decode→md5 pass, the
    # losers blocked on cache locks while holding task slots. The
    # grouped relation gives the Python kernel exactly one consumer
    # (its exchange), and both audit relations fall out for free:
    # n_sampled = Σc, n_distinct = group count, dist = the group keys.
    # Byte-identical output (same oracle).
    #
    # EAGER (r13): the cache itself still had two concurrent first-wave
    # readers (the per_video agg and the sharing subtree), and each
    # racing reader of the UNMATERIALIZED cache executed its own copy
    # of the Python chain — profiled at 32c: two ~10 s-task-time
    # fabricate→sample→md5 stages per invocation (stages 67/71,
    # r13 profile). The count() barrier fills once; both consumers
    # then read InMemoryTableScan. Same fix class as t09/d04/d07 (r12
    # change 12); m06 was the one racing-consumer site it missed.
    g = _scratch_persist_eager(
        "m06",
        frames.select("media_id", F.md5("frame").alias("h"))
        .groupBy("media_id", "h")
        .agg(F.count("*").alias("c")),
    )
    per_video = g.groupBy("media_id").agg(
        F.sum("c").alias("n_sampled"),
        F.count("*").alias("n_distinct"),
    )
    dist = g.select("media_id", "h")
    n_dist, cand = _m06_gate(spark, sf_dir, dist)
    if cand <= M06_PAIRWISE_RATIO_CAP * n_dist:
        # cold digests (the sf0.1 shape: Σc(c−1) within a few × of the
        # relation itself): ONE pairwise join beats the hybrid's extra
        # stages — interleaved A/B measured the hybrid at med 2.41 s vs
        # 1.94 s here, pure stage overhead at a 9 240-candidate volume
        sharing = _sharing_pairwise(dist)
    else:
        # hot digests (saturated digest space): candidates are
        # quadratic in the corpus — the dens100 probe measured 112.8 M
        # vs the hybrid's 340 k join rows (SCALING.md round-11)
        sharing = _sharing_counts(dist, per_video)
    return (
        per_video.join(sharing, "media_id", "left")
        .select(
            "media_id",
            "n_sampled",
            "n_distinct",
            F.coalesce("n_videos_sharing", F.lit(0)).alias(
                "n_videos_sharing"
            ),
        )
        .orderBy("media_id")
    )


#: m06 plan-choice gate: the pairwise sharing join is KEPT while its
#: measured candidate volume Σ_h c_h·(c_h−1) stays within this factor
#: of the distinct (video, digest) relation itself — i.e. while the
#: join is effectively linear and one join beats the hybrid's extra
#: stage overhead (interleaved A/B at sf0.1: pairwise med 1.94 s vs
#: hybrid 2.41 s at a 9 240-candidate volume). Above it, digests are
#: hot and the closed-form hybrid takes over (340 k vs 112.8 M join
#: rows at dens100). The same measured-scalar discipline as p05's
#: broadcast gate and d08's edge-count gate.
M06_PAIRWISE_RATIO_CAP = 8.0

#: (applicationId, sf_dir) → (dist rows, Σ c·(c−1)) — memoized like
#: p05's gate count so repeated plan compilations (the suite-wide
#: plan-hygiene walk) don't re-materialize the frame-digest relation
#: for the same immutable input dir (ADVICE r10's p05 finding applies
#: verbatim here).
_M06_GATE_MEMO: dict[tuple[str, str], tuple[int, int]] = {}


def _m06_gate(
    spark: SparkSession, sf_dir: str, dist: DataFrame
) -> tuple[int, int]:
    from aw3d30_parquet_spark.session import session_token

    key = (session_token(spark), sf_dir)
    if key not in _M06_GATE_MEMO:
        row = (
            dist.groupBy("h")
            .agg(F.count("*").alias("c"))
            .agg(
                F.coalesce(F.sum("c"), F.lit(0)).alias("rows"),
                F.coalesce(
                    F.sum(F.col("c") * (F.col("c") - 1)), F.lit(0)
                ).alias("cand"),
            )
            .first()
        )
        _M06_GATE_MEMO[key] = (int(row["rows"]), int(row["cand"]))
    return _M06_GATE_MEMO[key]


def _sharing_pairwise(dist: DataFrame) -> DataFrame:
    """The direct digest-keyed self-join (d04's inverted-index
    posture): candidates are actual hash collisions. The right plan
    while per-digest density is small — the gate proves it is."""
    a, b = dist.alias("a"), dist.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.media_id") != F.col("b.media_id")),
        )
        .groupBy(F.col("a.media_id").alias("media_id"))
        .agg(F.count_distinct(F.col("b.media_id")).alias("n_videos_sharing"))
    )


def _sharing_counts(dist: DataFrame, per_video: DataFrame) -> DataFrame:
    """``n_videos_sharing`` per video from the distinct (media_id, h)
    relation — the r11 HYBRID plan (byte-identical output to the plain
    digest self-join, pinned by pytest against a brute-force twin):

    - **single-digest videos take a closed form.** A video whose
      frames all hash to ONE digest h shares with exactly the other
      ``c_h − 1`` videos carrying h, where ``c_h`` is the digest's
      video frequency — one linear groupBy + one digest-keyed join,
      no pairwise enumeration. This matters because hot digests are
      precisely where the pairwise join blows up: candidate volume is
      Σ_h c_h², and the r11 dens100 probe measured it QUADRATIC on
      the fixture (9.2 k → 1.11 M → 112.8 M candidates for
      1×/10×/100× docs; every fixture video is single-digest, digest
      space saturates at 256 keys — SCALING.md round-11).
    - **multi-digest videos keep the exact pairwise join** (a-side
      restricted to THEIR rows; b-side the full relation), because
      their partner set is a union across digests that has no linear
      decomposition. On real content per-digest density is small and
      this side IS d04's inverted-index posture (candidates = actual
      collisions); on the fixture it is empty, so the quadratic term
      is gone entirely.

    At 100 TB the closed form also carries the production reading: a
    digest with c_h in the thousands is shared b-roll/boilerplate
    (p11's class) — its partner COUNT is what curation needs, and
    that count never requires materializing the c_h² pair relation."""
    freq = dist.groupBy("h").agg(F.count("*").alias("c"))
    n_dist = per_video.select("media_id", "n_distinct")
    single = (
        dist.join(n_dist, "media_id")
        .filter(F.col("n_distinct") == 1)
        .join(freq, "h")
        .select(
            "media_id", (F.col("c") - 1).cast("bigint").alias("n_videos_sharing")
        )
        .filter(F.col("n_videos_sharing") > 0)
    )
    multi = dist.join(n_dist, "media_id").filter(F.col("n_distinct") > 1)
    a, b = multi.alias("a"), dist.alias("b")
    multi_sharing = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.media_id") != F.col("b.media_id")),
        )
        .groupBy(F.col("a.media_id").alias("media_id"))
        .agg(F.count_distinct(F.col("b.media_id")).alias("n_videos_sharing"))
    )
    return single.unionByName(multi_sharing)


_M06_ORACLE = f"""
WITH params AS (
  SELECT doc_id,
         16 + (doc_id % 4) * 8 AS w,
         {VID_FRAMES_BASE} + doc_id % {VID_FRAMES_MOD} AS nf,
         doc_id % 256          AS s
  FROM documents WHERE doc_id % 3 = 2
), frames AS (
  -- every-2nd-frame start byte: frame k begins at (s + k*w*16) mod 256
  SELECT doc_id, w, (s + k.k * w * 16) % 256 AS start
  FROM params
  CROSS JOIN (SELECT unnest(range(0, {MAX_VID_FRAMES})) AS k) k
  WHERE k.k < nf AND k.k % 2 = 0
), per_video AS (
  SELECT doc_id, count(*) AS n_sampled,
         count(DISTINCT (w, start)) AS n_distinct
  FROM frames GROUP BY doc_id
), dist AS (
  SELECT DISTINCT doc_id, w, start FROM frames
), sharing AS (
  SELECT a.doc_id, count(DISTINCT b.doc_id) AS n_videos_sharing
  FROM dist a
  JOIN dist b ON a.w = b.w AND a.start = b.start
            AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id
)
SELECT p.doc_id AS media_id, p.n_sampled, p.n_distinct,
       COALESCE(s.n_videos_sharing, 0) AS n_videos_sharing
FROM per_video p LEFT JOIN sharing s ON s.doc_id = p.doc_id
ORDER BY media_id
"""


def wav_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container WAV corpus: the audio documents re-encoded as
    RIFF/WAVE through the stdlib ``wave`` module (present in every
    CPython — no new dependency), alternating mono/stereo by doc_id
    parity. Same sample law as the PCM0 corpus (``media_params``), so
    m04's exact-integer oracle arithmetic carries over — but every
    payload now enters ``extract_features`` through the r9 SIGNATURE
    dispatch (``_decode_wav``), not the RAW arm: this is the corpus
    that makes "real formats work" a driver-checked fact (r9 verdict
    item 2)."""
    register_views(spark, sf_dir)
    from aw3d30_parquet_spark.session import spread

    ids = spread(
        spark.table("documents").select(F.col("doc_id").alias("media_id")),
        dense=True,  # per-row codec kernel: bytes-in is no work proxy
    ).filter(F.pmod("media_id", F.lit(3)) == _KIND_MOD["audio"])

    def fabricate(batches: Iterable) -> Iterator:
        import io
        import wave as _wave

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = media_params(mid)
                samples = (
                    (p["seed"] + np.arange(p["n_samples"])) % 4096 - 2048
                ).astype("<i2")
                buf = io.BytesIO()
                with _wave.open(buf, "wb") as wf:
                    # stereo on odd ids: the total int16 count stays
                    # n_samples (always even), frames halve — pins the
                    # frames×channels convention through the decoder
                    wf.setnchannels(1 + mid % 2)
                    wf.setsampwidth(2)
                    wf.setframerate(p["sample_rate"])
                    wf.writeframes(samples.tobytes())
                out["media_id"].append(mid)
                out["kind"].append("audio")
                out["payload"].append(buf.getvalue())
            yield pd.DataFrame(out)

    return ids.mapInPandas(fabricate, schema=MEDIA_SCHEMA)


def m07_wav_ingest_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m07: REAL-format ingest — WAV containers through the signature
    dispatch into the m04 exact-integer energy aggregate.

    ``total_payload_bytes`` pins the CONTAINER framing (the 44-byte
    RIFF/fmt/data header the stdlib encoder emits plus 2 bytes per
    int16), so a regression that silently rerouted these rows through
    the RAW arm — or mis-sized the header walk — breaks the hash, not
    just a pytest. ``total_energy`` pins the decoded CONTENT exactly
    (round(rms²·n) recovers the integer sum of squares; sumsq < 2⁵³)."""
    feats = extract_features(wav_media_table(spark, sf_dir))
    energy = F.floor(
        F.col("intensity") * F.col("intensity") * F.col("n_samples") + 0.5
    ).cast("bigint")
    return (
        feats.groupBy("sample_rate")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_samples").alias("total_samples"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
            F.sum(energy).alias("total_energy"),
        )
        .orderBy("sample_rate")
    )


#: WAV framing: 12-byte RIFF/WAVE + 24-byte fmt chunk + 8-byte data
#: header = 44 bytes, then 2 bytes per int16 sample (PCM16)
_M07_ORACLE = """
WITH params AS (
  SELECT doc_id, doc_id % 256 AS s,
         8000 + (doc_id % 4) * 4000 AS sr,
         256 + (doc_id % 10) * 64 AS n
  FROM documents WHERE doc_id % 3 = 1
), pix AS (
  SELECT doc_id, sr, n, ((s + unnest(range(n))) % 4096) - 2048 AS v
  FROM params
), per_doc AS (
  SELECT doc_id, sr, n, sum(v * v) AS sumsq
  FROM pix GROUP BY doc_id, sr, n
)
SELECT CAST(sr AS INTEGER) AS sample_rate, count(*) AS cnt,
       CAST(sum(n) AS BIGINT) AS total_samples,
       CAST(sum(44 + 2 * n) AS BIGINT) AS total_payload_bytes,
       CAST(sum(sumsq) AS BIGINT) AS total_energy
FROM per_doc GROUP BY sr ORDER BY sample_rate
"""


def png_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container PNG corpus: the image documents re-encoded as
    bit-depth-8 PNG through the pure-stdlib encoder (``_png_encode`` —
    no Pillow, present everywhere). Same pixel law as the RAW corpus
    (``media_params``: value k = (seed + k) % 256 row-major), gray for
    ch=1 / gray+alpha for ch=2, and row ``r`` carries filter type
    ``(doc_id + r) % 5`` — every image exercises ALL FIVE PNG filters,
    so the m08 content hash certifies the unfiltering math, not just
    the inflate."""
    register_views(spark, sf_dir)
    from aw3d30_parquet_spark.session import spread

    ids = spread(
        spark.table("documents").select(F.col("doc_id").alias("media_id")),
        dense=True,  # per-row codec kernel: bytes-in is no work proxy
    ).filter(F.pmod("media_id", F.lit(3)) == _KIND_MOD["image"])

    def fabricate(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = media_params(mid)
                w, h, ch = p["width"], p["height"], p["channels"]
                arr = (
                    ((p["seed"] + np.arange(w * h * ch)) % 256)
                    .astype(np.uint8)
                    .reshape(h, w, ch)
                )
                out["media_id"].append(mid)
                out["kind"].append("image")
                out["payload"].append(
                    _png_encode(arr, [(mid + r) % 5 for r in range(h)])
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(fabricate, schema=MEDIA_SCHEMA)


def m08_png_ingest_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m08: REAL-format image ingest — PNG containers through the
    signature dispatch into a full PURE-PYTHON decode (zlib IDAT
    inflate + numpy scanline unfiltering, all five filter types), the
    image twin of m07's WAV row (r10 verdict item 2).

    ``total_pixel_sum`` pins the decoded CONTENT exactly —
    floor(mean·n + 0.5) recovers the integer pixel sum, and any
    unfiltering error in any of the five per-row filter types shifts
    it. ``total_payload_bytes`` pins the CONTAINER framing (sig 8 +
    IHDR 25 + IDAT 12+(L+11) + IEND 12 = L+68 for a stored-block
    stream of L = h·(w·ch+1) scanline bytes), so a silent reroute
    through the RAW arm or a mis-walked chunk table breaks the hash."""
    feats = extract_features(png_media_table(spark, sf_dir))
    n_px = (
        F.col("width") * F.col("height") * F.col("channels")
    ).cast("bigint")
    pixel_sum = F.floor(F.col("intensity") * n_px + 0.5).cast("bigint")
    return (
        feats.groupBy("channels")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(n_px).alias("total_pixels"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
            F.sum(pixel_sum).alias("total_pixel_sum"),
        )
        .orderBy("channels")
    )


#: PNG framing: 8-byte signature + 25-byte IHDR chunk + IDAT chunk of
#: 12 + (L + 11) bytes (hand-framed single stored block: 2-byte zlib
#: header + 5-byte block header + L scanline bytes + 4-byte adler) +
#: 12-byte IEND = L + 68, with L = h*(w*ch + 1) (one filter byte per
#: row). Pixel law shared with the RAW corpus: (seed + k) % 256.
_M08_ORACLE = """
WITH params AS (
  SELECT doc_id, doc_id % 256 AS s,
         16 + (doc_id % 8) * 4 AS w,
         12 + (doc_id % 5) * 4 AS h,
         1 + (doc_id % 2) AS ch
  FROM documents WHERE doc_id % 3 = 0
), px AS (
  SELECT doc_id, ch, w * h * ch AS n, h * (w * ch + 1) AS sl,
         (s + unnest(range(w * h * ch))) % 256 AS v
  FROM params
), per_doc AS (
  SELECT doc_id, ch, n, sl, sum(v) AS pix_sum
  FROM px GROUP BY doc_id, ch, n, sl
)
SELECT CAST(ch AS INTEGER) AS channels, count(*) AS cnt,
       CAST(sum(n) AS BIGINT) AS total_pixels,
       CAST(sum(sl + 68) AS BIGINT) AS total_payload_bytes,
       CAST(sum(pix_sum) AS BIGINT) AS total_pixel_sum
FROM per_doc GROUP BY ch ORDER BY channels
"""


def _bmff_box(tag: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + tag + body


def _bmff_encode(w: int, h: int, n_frames: int, frames: bytes) -> bytes:
    """Minimal REAL ISO-BMFF container (ISO/IEC 14496-12): ftyp + a
    moov/trak/mdia/minf/stbl skeleton carrying exactly the boxes the
    header walk reads — tkhd v0 (84-byte body, width/height 16.16
    fixed in the last 8), hdlr 'vide', uniform-size stsz (sample_size
    = w·h, sample_count = n_frames, no entry table) — then an mdat
    with the frame bytes. Every box size is fixed arithmetic: total =
    209 + len(frames), the framing pin m09's oracle relies on."""
    tkhd = (
        bytes(4)  # version 0 + flags
        + bytes(4 * 3)  # creation, modification, track_ID
        + bytes(4)  # reserved
        + n_frames.to_bytes(4, "big")  # duration (frames at 1 tick)
        + bytes(8)  # reserved
        + bytes(2 * 4)  # layer, alternate_group, volume, reserved
        + bytes(36)  # identity matrix slot (all-zero is fine here)
        + (w << 16).to_bytes(4, "big")
        + (h << 16).to_bytes(4, "big")
    )
    hdlr = bytes(4) + bytes(4) + b"vide" + bytes(12) + b"\x00"
    stsz = (
        bytes(4)
        + (w * h).to_bytes(4, "big")  # uniform sample_size
        + n_frames.to_bytes(4, "big")  # sample_count
    )
    stbl = _bmff_box(b"stbl", _bmff_box(b"stsz", stsz))
    minf = _bmff_box(b"minf", stbl)
    mdia = _bmff_box(b"mdia", _bmff_box(b"hdlr", hdlr) + minf)
    trak = _bmff_box(b"trak", _bmff_box(b"tkhd", tkhd) + mdia)
    return (
        _bmff_box(b"ftyp", b"isom" + (0x200).to_bytes(4, "big"))
        + _bmff_box(b"moov", trak)
        + _bmff_box(b"mdat", frames)
    )


def bmff_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container video corpus: the video documents re-encoded as
    minimal ISO-BMFF (``_bmff_encode`` — pure arithmetic, zero
    dependencies). The mdat carries the RAW corpus' pixel ramp so the
    container is a faithful re-encoding, but m09 reads it
    ``metadata_only`` — the moov walk must never touch frame bodies."""
    register_views(spark, sf_dir)
    from aw3d30_parquet_spark.session import spread

    ids = spread(
        spark.table("documents").select(F.col("doc_id").alias("media_id")),
        dense=True,  # per-row codec kernel: bytes-in is no work proxy
    ).filter(F.pmod("media_id", F.lit(3)) == _KIND_MOD["video"])

    def fabricate(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = media_params(mid)
                w, h, nf = p["width"], p["height"], p["n_frames"]
                frames = (
                    ((p["seed"] + np.arange(w * h * nf)) % 256)
                    .astype(np.uint8)
                    .tobytes()
                )
                out["media_id"].append(mid)
                out["kind"].append("video")
                out["payload"].append(_bmff_encode(w, h, nf, frames))
            yield pd.DataFrame(out)

    return ids.mapInPandas(fabricate, schema=MEDIA_SCHEMA)


def m09_bmff_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m09: REAL-format video metadata — ISO-BMFF containers through
    the signature dispatch into the header-only moov walk
    (``_bmff_video_meta``), driver-checked (r10 verdict item 3: the
    third modality's real-container row; pytest-only until now).

    Runs ``metadata_only`` by contract: the walk reads tkhd/hdlr/stsz
    and never the mdat — a regression that started decoding frame
    bodies would raise (PyAV absent), so a green hash IS the
    header-only proof. ``total_payload_bytes`` pins the box framing
    (fixed 209-byte skeleton + w·h·n_frames mdat bytes);
    ``total_frames``/``total_frame_bytes`` pin the parsed tkhd/stsz
    fields against the fabrication arithmetic."""
    feats = extract_features(
        bmff_media_table(spark, sf_dir), metadata_only=True
    )
    frame_bytes = (
        F.col("width") * F.col("height") * F.col("n_frames")
    ).cast("bigint")
    return (
        feats.groupBy("width")
        .agg(
            F.count("*").alias("cnt"),
            F.max("height").alias("max_height"),
            F.sum("n_frames").alias("total_frames"),
            F.sum(frame_bytes).alias("total_frame_bytes"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
        )
        .orderBy("width")
    )


#: BMFF framing: ftyp 16 + moov 185 (trak 177 = tkhd 92 + mdia 77
#: [hdlr 33 + minf 36 {stbl 28 (stsz 20)}]) + mdat header 8 = 209
#: fixed bytes, then w*h*n_frames frame bytes in the mdat body.
_M09_ORACLE = """
WITH params AS (
  SELECT doc_id, 16 + (doc_id % 4) * 8 AS w, 16 AS h,
         4 + doc_id % 6 AS nf
  FROM documents WHERE doc_id % 3 = 2
)
SELECT CAST(w AS INTEGER) AS width, count(*) AS cnt,
       CAST(max(h) AS INTEGER) AS max_height,
       CAST(sum(nf) AS BIGINT) AS total_frames,
       CAST(sum(w * h * nf) AS BIGINT) AS total_frame_bytes,
       CAST(sum(209 + w * h * nf) AS BIGINT) AS total_payload_bytes
FROM params GROUP BY w ORDER BY width
"""


def _jpeg_encode_headers(
    w: int, h: int, ch: int, comment: bytes
) -> bytes:
    """Minimal spec-legal baseline-JPEG header stream (ITU-T T.81
    §B.2): SOI, APP0/JFIF, COM carrying ``comment``, DQT (ramp table),
    SOF0, EOI — every marker segment a real encoder emits before the
    frame header and none of the entropy data, which ``_jpeg_meta``
    never reads (it returns at SOF). A pure-python entropy ENCODE
    (Huffman + DCT) is the forsworn library-reimplementation class
    (SURVEY §7.4), and the header walk m10 certifies stops at SOF by
    contract — so header-only fabrication exercises exactly the code
    under test. Framing is fixed arithmetic: total = 2 (SOI)
    + 18 (APP0) + 4+len(comment) (COM) + 69 (DQT) + 10+3·ch (SOF0)
    + 2 (EOI) = 105 + 3·ch + len(comment) — the m10 oracle's
    ``total_payload_bytes`` pin."""
    app0 = (
        b"\xff\xe0"
        + (16).to_bytes(2, "big")
        + b"JFIF\x00"
        + bytes([1, 1])  # version 1.1
        + bytes([0])  # density units: none
        + (1).to_bytes(2, "big")  # Xdensity
        + (1).to_bytes(2, "big")  # Ydensity
        + bytes([0, 0])  # no thumbnail
    )
    com = b"\xff\xfe" + (2 + len(comment)).to_bytes(2, "big") + comment
    dqt = (
        b"\xff\xdb"
        + (67).to_bytes(2, "big")
        + bytes([0])  # Pq=0 (8-bit), Tq=0
        + bytes(range(1, 65))  # ramp quant table (all-nonzero: legal)
    )
    sof_body = (
        bytes([8])  # precision
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ch])
    )
    for cid in range(1, ch + 1):  # id, 1×1 sampling, quant table 0
        sof_body += bytes([cid, 0x11, 0])
    sof0 = b"\xff\xc0" + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
    return b"\xff\xd8" + app0 + com + dqt + sof0 + b"\xff\xd9"


def jpeg_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container JPEG corpus: the image documents re-framed as
    baseline-JPEG header streams (``_jpeg_encode_headers`` — pure
    arithmetic, zero dependencies). Width/height follow the image law
    (``media_params``); component count maps the RAW 1/2-channel law
    onto JPEG-legal 1 (grayscale) / 3 (YCbCr); each stream carries a
    ``doc_id % 13``-byte COM segment so the walk's length-skip logic
    is load-bearing in the framing pin, not just pass-through."""
    register_views(spark, sf_dir)
    from aw3d30_parquet_spark.session import spread

    ids = spread(
        spark.table("documents").select(F.col("doc_id").alias("media_id")),
        dense=True,  # per-row codec kernel: bytes-in is no work proxy
    ).filter(F.pmod("media_id", F.lit(3)) == _KIND_MOD["image"])

    def fabricate(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = media_params(mid)
                ch = 2 * p["channels"] - 1  # RAW 1/2 → JPEG 1/3
                comment = bytes((mid + i) % 256 for i in range(mid % 13))
                out["media_id"].append(mid)
                out["kind"].append("image")
                out["payload"].append(
                    _jpeg_encode_headers(
                        p["width"], p["height"], ch, comment
                    )
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(fabricate, schema=MEDIA_SCHEMA)


def m10_jpeg_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m10: REAL-format JPEG metadata — baseline-JPEG containers
    through the signature dispatch into the header-only SOF marker
    walk (``_jpeg_meta``), driver-checked (r11 verdict item 2: the
    fourth and last real container format without a driver hash row;
    the JPEG twin of m09's BMFF moov walk).

    Runs ``metadata_only`` by contract: the walk skips APP0/COM/DQT by
    their 2-byte lengths and returns at SOF0 — Pillow is absent in
    this container, so a green hash proves the walk alone produced
    every parsed field. ``total_pixels`` pins the parsed SOF
    width/height/components against the fabrication law;
    ``total_payload_bytes`` pins the marker-segment framing (105 +
    3·ch + doc_id%13 per stream — a mis-skipped segment or a reroute
    through Pillow-gated full decode breaks it)."""
    feats = extract_features(
        jpeg_media_table(spark, sf_dir), metadata_only=True
    )
    n_px = (
        F.col("width") * F.col("height") * F.col("channels")
    ).cast("bigint")
    return (
        feats.groupBy("channels")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("width").alias("total_width"),
            F.max("height").alias("max_height"),
            F.sum(n_px).alias("total_pixels"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
        )
        .orderBy("channels")
    )


#: JPEG framing: SOI 2 + APP0 18 + COM (4 + doc_id%13) + DQT 69 +
#: SOF0 (10 + 3·ch) + EOI 2 = 105 + 3·ch + doc_id%13 bytes, with the
#: image-law w/h and ch = 1 + (doc_id % 2)·2 (RAW 1/2 → JPEG 1/3).
_M10_ORACLE = """
WITH params AS (
  SELECT doc_id,
         16 + (doc_id % 8) * 4 AS w,
         12 + (doc_id % 5) * 4 AS h,
         1 + (doc_id % 2) * 2 AS ch,
         doc_id % 13 AS k
  FROM documents WHERE doc_id % 3 = 0
)
SELECT CAST(ch AS INTEGER) AS channels, count(*) AS cnt,
       CAST(sum(w) AS BIGINT) AS total_width,
       CAST(max(h) AS INTEGER) AS max_height,
       CAST(sum(w * h * ch) AS BIGINT) AS total_pixels,
       CAST(sum(105 + 3 * ch + k) AS BIGINT) AS total_payload_bytes
FROM params GROUP BY ch ORDER BY channels
"""


QUERIES = {
    "m01_media_metadata": m01_media_metadata,
    "m02_image_resize_stats": m02_image_resize_stats,
    "m03_frame_sample_stats": m03_frame_sample_stats,
    "m04_audio_energy_stats": m04_audio_energy_stats,
    "m05_audio_decimate_stats": m05_audio_decimate_stats,
    "m06_frame_dedup_audit": m06_frame_dedup_audit,
    "m07_wav_ingest_energy": m07_wav_ingest_energy,
    "m08_png_ingest_intensity": m08_png_ingest_intensity,
    "m09_bmff_video_metadata": m09_bmff_video_metadata,
    "m10_jpeg_metadata": m10_jpeg_metadata,
}
ORACLE_SQL = {
    "m01_media_metadata": _M01_ORACLE,
    "m02_image_resize_stats": _M02_ORACLE,
    "m03_frame_sample_stats": _M03_ORACLE,
    "m04_audio_energy_stats": _M04_ORACLE,
    "m05_audio_decimate_stats": _M05_ORACLE,
    "m06_frame_dedup_audit": _M06_ORACLE,
    "m07_wav_ingest_energy": _M07_ORACLE,
    "m08_png_ingest_intensity": _M08_ORACLE,
    "m09_bmff_video_metadata": _M09_ORACLE,
    "m10_jpeg_metadata": _M10_ORACLE,
}
