"""Multimodal column plumbing: schema, batch shape, real RAW decode,
resize/frame-sample kernels, codec-stub contract, m01 oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aw3d30_parquet_spark.functions import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, SF)


def test_media_schema_and_kinds(spark, media):
    assert media.schema == mm.MEDIA_SCHEMA
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert media.count() == 500  # one media row per document


def test_fabricate_batch_matches_scalar_spec():
    """The vectorized batch fabricator is byte-identical to the one-row
    spec `_fabricate_payload` across all kinds and seed wraps."""
    ids = np.array([0, 1, 2, 3, 7, 100, 255, 256, 257, 499, 1023])
    got = mm._fabricate_batch(ids)
    for mid, payload in zip(ids, got):
        assert payload == mm._fabricate_payload(int(mid)), mid


def test_decode_roundtrip_golden():
    """Fabricated payload decodes back to the exact seeded sample array."""
    for doc_id in (0, 1, 2, 7, 100, 255, 256, 499):
        payload = mm._fabricate_payload(doc_id)
        kind, meta, arr = mm.decode_payload(payload)
        p = mm.media_params(doc_id)
        assert kind == p["kind"]
        s = p["seed"]
        if kind == "image":
            assert (meta["width"], meta["height"], meta["channels"]) == (
                p["width"],
                p["height"],
                p["channels"],
            )
            n = p["width"] * p["height"] * p["channels"]
            np.testing.assert_array_equal(arr.ravel(), (s + np.arange(n)) % 256)
        elif kind == "audio":
            assert meta["sample_rate"] == p["sample_rate"]
            np.testing.assert_array_equal(arr, (s + np.arange(p["n_samples"])) % 4096 - 2048)
        else:
            assert meta["n_frames"] == p["n_frames"]
            assert arr.shape == (p["n_frames"], 16, p["width"])


def test_unknown_magic_raises():
    jpeg_ish = b"\xff\xd8\xff\xe0" + struct.pack("<III", 1, 2, 3) + b"\0" * 64
    with pytest.raises(NotImplementedError, match="no decoder"):
        mm.decode_payload(jpeg_ish)


def test_extract_features_values(spark, media):
    feats = mm.extract_features(media).toPandas().set_index("media_id")
    assert len(feats) == 500
    for doc_id in (0, 1, 2, 33, 499):
        p = mm.media_params(doc_id)
        row = feats.loc[doc_id]
        assert row["kind"] == p["kind"]
        _, _, arr = mm.decode_payload(mm._fabricate_payload(doc_id))
        if p["kind"] == "audio":
            expect = float(np.sqrt(np.mean(arr.astype(np.float64) ** 2)))
        else:
            expect = float(arr.mean())
        assert row["intensity"] == pytest.approx(expect)
        assert row["payload_bytes"] == len(mm._fabricate_payload(doc_id))


def test_resize_nearest_neighbor(spark, media):
    out = mm.resize_images(media.filter("media_id = 3"), 8, 8).collect()
    # doc_id 3 → kind image (3 % 3 == 0)
    assert len(out) == 1
    kind, meta, arr = mm.decode_payload(bytes(out[0].payload))
    assert (meta["width"], meta["height"]) == (8, 8)
    p = mm.media_params(3)
    _, _, orig = mm.decode_payload(mm._fabricate_payload(3))
    ys = (np.arange(8) * p["height"] // 8).astype(np.intp)
    xs = (np.arange(8) * p["width"] // 8).astype(np.intp)
    np.testing.assert_array_equal(arr, orig[ys][:, xs])


def test_sample_frames_udtf_shape(spark, media):
    videos = media.filter("kind = 'video'")
    frames = mm.sample_frames(videos, every_k=2)
    pdf = frames.toPandas()
    # per video: ceil(n_frames / 2) sampled frames
    import math

    expect = sum(
        math.ceil(mm.media_params(int(r.media_id))["n_frames"] / 2)
        for r in videos.select("media_id").collect()
    )
    assert len(pdf) == expect
    assert set(pdf["frame_idx"]) <= {0, 2, 4, 6, 8}
    # frames are width×height grayscale bytes
    mid = int(pdf["media_id"].iloc[0])
    p = mm.media_params(mid)
    sample = pdf[pdf["media_id"] == mid]["frame"].iloc[0]
    assert len(bytes(sample)) == p["width"] * p["height"]


def test_m01_oracle(spark, duck_t2):
    from aw3d30_parquet_spark.oracle import compare

    df = mm.m01_media_metadata(spark, "/root/testdata/sf0.01")
    ok, h1, h2 = compare(df, duck_t2, mm.ORACLE_SQL["m01_media_metadata"])
    assert ok, (h1, h2)


def test_m06_frame_dedup_audit_matches_python(spark):
    """m06 vs a pure-python recomputation through the REAL byte path:
    fabricate payloads, decode, sample every 2nd frame, hash bytes —
    no generator arithmetic (that's the oracle's angle; this one
    certifies the binary pipeline end to end)."""
    import hashlib

    import pandas as pd

    sf = "/root/testdata/sf0.001"
    doc_ids = pd.read_parquet(f"{sf}/documents.parquet")["doc_id"]
    want = {}
    frames_by_vid = {}
    for d in doc_ids:
        d = int(d)
        if d % 3 != 2:
            continue
        kind, meta, arr = mm.decode_payload(mm._fabricate_payload(d))
        assert kind == "video"
        hs = [
            hashlib.md5(arr[k].tobytes()).hexdigest()
            for k in range(0, meta["n_frames"], 2)
        ]
        frames_by_vid[d] = set(hs)
        want[d] = [len(hs), len(set(hs)), 0]
    for a in want:
        want[a][2] = sum(
            1
            for b in want
            if b != a and frames_by_vid[a] & frames_by_vid[b]
        )
    rows = mm.m06_frame_dedup_audit(spark, sf).collect()
    got = {
        r.media_id: [r.n_sampled, r.n_distinct, r.n_videos_sharing]
        for r in rows
    }
    assert got == want
    # non-vacuous: the fixture must contain within-video duplicates
    assert any(n > d for n, d, _ in got.values())
