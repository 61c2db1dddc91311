"""Multimodal plumbing tests: binary columns through mapInPandas.

The reference has no media surface (its payloads are JSON text,
cdc_system.py:145-194); this covers the driver-mandated multimodal
extension: opaque binary payloads, Arrow-batched decode, feature
extraction, frame fan-out, and the explicit stub boundary for real
codecs.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.operators import multimodal as M
from cdc_system_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return M.synthesize_media(docs)


def test_media_schema_is_binary_plus_typed_metadata(media):
    schema = {f.name: f.dataType for f in media.schema.fields}
    assert isinstance(schema["content"], T.BinaryType)
    assert isinstance(schema["byte_len"], T.LongType)
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_matches_codec_on_raw_bytes(media):
    decoded = M.decode_media(media)
    assert decoded.schema == M.DECODED_SCHEMA
    row = decoded.filter(F.col("media_id") == 0).head()
    src = media.filter(F.col("media_id") == 0).head()
    expect = M.FakeCodec().decode(0, src["kind"], bytes(src["content"]))
    assert row.asDict() == expect
    # kind-dependent nullability: audio rows carry no image dims
    audio = decoded.filter(F.col("kind") == "audio")
    assert audio.filter(F.col("width").isNotNull()).count() == 0
    assert audio.filter(F.col("sample_rate").isNull()).count() == 0


def test_byte_histogram_is_normalized_feature_vector(media):
    hist = M.byte_histogram(media, bins=8)
    row = hist.head()
    assert len(row["hist"]) == 8
    assert abs(sum(row["hist"]) - 1.0) < 1e-4  # rounding at 1e-6 per bin
    assert all(0.0 <= v <= 1.0 for v in row["hist"])


def test_frame_sample_fans_out_and_hashes_windows(media):
    frames = M.frame_sample(media, frame_bytes=32, stride=4)
    src = media.filter(F.col("media_id") == 1).head()
    buf = bytes(src["content"])
    got = {
        r["frame_idx"]: r["frame_md5"]
        for r in frames.filter(F.col("media_id") == 1).collect()
    }
    import math

    n_chunks = max(math.ceil(len(buf) / 32), 1)
    expect_idx = list(range(0, n_chunks, 4))
    assert sorted(got) == expect_idx
    for i in expect_idx:
        assert got[i] == hashlib.md5(buf[i * 32 : (i + 1) * 32]).hexdigest()


def test_frame_sample_total_fanout(media):
    # every media item emits ≥1 frame; fan-out exceeds input rows
    n_media = media.count()
    frames = M.frame_sample(media, frame_bytes=32, stride=4)
    assert frames.select("media_id").distinct().count() == n_media
    assert frames.count() > n_media


def test_resize_fake_codec_crops_deterministically(media):
    # FakeCodec resize: crop to width*height/256 bytes; only image-kind
    # rows pass through, and len/md5 match the pure-Python computation
    out = {r["media_id"]: r for r in M.resize_images(media, 64, 48).collect()}
    imgs = {r["media_id"]: bytes(r["content"]) for r in media.filter("kind = 'image'").collect()}
    assert set(out) == set(imgs)
    cap = (64 * 48) // 256
    for mid, buf in imgs.items():
        expect = buf[:cap] if buf else b""
        assert out[mid]["out_len"] == max(len(expect), 0)
        assert out[mid]["out_md5"] == hashlib.md5(expect).hexdigest()
        assert (out[mid]["width"], out[mid]["height"]) == (64, 48)


def test_real_codec_is_an_explicit_stub():
    with pytest.raises(M.RealCodecUnavailable):
        M.RealImageCodec()


def test_audio_features_windows_bytes_as_pcm(spark):
    rows = [
        (1, "audio", bytes([10, 20, 30, 40, 50])),  # 2 windows of 4: [10..40],[50]
        (2, "audio", b""),                           # empty clip -> one zero window
        (3, "image", bytes([255] * 8)),              # wrong kind -> excluded
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
    out = {
        (r["media_id"], r["window_idx"]): r
        for r in M.audio_features(media, window=4).collect()
    }
    assert set(out) == {(1, 0), (1, 1), (2, 0)}
    assert out[(1, 0)]["n_samples"] == 4
    assert out[(1, 0)]["mean_amp"] == 25.0
    assert out[(1, 0)]["peak_amp"] == 40
    assert out[(1, 1)]["n_samples"] == 1 and out[(1, 1)]["peak_amp"] == 50
    assert out[(2, 0)]["n_samples"] == 0 and out[(2, 0)]["mean_amp"] == 0.0
    with pytest.raises(ValueError, match="window"):
        M.audio_features(media, window=0)


# -- image dHash near-dup ------------------------------------------------------


def test_image_dhash_matches_codec(spark):
    from cdc_system_spark.operators.multimodal import FakeCodec, image_dhash

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"abcdefgh" * 20)), (2, "image", bytearray(b""))],
        "media_id long, kind string, content binary",
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    codec = FakeCodec()
    assert got[1] == codec.dhash("image", b"abcdefgh" * 20)
    assert got[2] == 0  # empty payload -> zero hash
    assert 0 <= got[1] < (1 << FakeCodec.DHASH_BITS)


def test_image_neardup_finds_copies_and_light_edits(spark):
    from cdc_system_spark.operators.multimodal import image_neardup_pairs

    base = b"the quick brown fox jumps over the lazy dog " * 8
    edited = b"Z" + base[1:]  # length-preserving single-byte edit
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(base)),
            (2, "image", bytearray(base)),        # exact copy
            (3, "image", bytearray(edited)),      # near copy
            (4, "image", bytearray(b"completely different payload content! " * 9)),
            (5, "audio", bytearray(base)),        # wrong kind -> excluded
        ],
        "media_id long, kind string, content binary",
    )
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in image_neardup_pairs(media).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 4
    assert all(4 not in p and 5 not in p for p in pairs)


def test_hamming_band_pairs_validates_geometry(spark):
    import pytest as _pytest

    from cdc_system_spark.operators.dedup import hamming_band_pairs

    sig = spark.createDataFrame([(1, 5)], "doc_id long, s long")
    with _pytest.raises(ValueError):
        hamming_band_pairs(sig, "s", bits=48, n_bands=7)  # 48 % 7 != 0
    with _pytest.raises(ValueError):
        hamming_band_pairs(sig, "s", bits=48, n_bands=8, max_hamming=8)


def test_scene_changes_flags_content_shifts(spark):
    from cdc_system_spark.operators.multimodal import scene_changes

    # video 1: 3 identical 32-byte frames then 2 different ones;
    # video 2: one frame only (no pairs)
    v1 = b"A" * 96 + b"Z" * 32 + b"Q" * 32
    v2 = b"B" * 32
    media = spark.createDataFrame(
        [(1, "video", bytearray(v1)), (2, "video", bytearray(v2))],
        "media_id long, kind string, content binary",
    )
    out = scene_changes(media, frame_bytes=32, stride=1, max_hamming=0)
    rows = {(r["media_id"], r["frame_idx"]): r for r in out.collect()}
    # 4 consecutive pairs for video 1, none for video 2
    assert set(rows) == {(1, 1), (1, 2), (1, 3), (1, 4)}
    assert rows[(1, 1)]["hamming"] == 0 and not rows[(1, 1)]["is_cut"]
    assert rows[(1, 2)]["hamming"] == 0 and not rows[(1, 2)]["is_cut"]
    assert rows[(1, 3)]["is_cut"] and rows[(1, 3)]["hamming"] > 0  # A->Z
    assert rows[(1, 4)]["is_cut"]                                  # Z->Q
    assert rows[(1, 3)]["prev_idx"] == 2
    # deterministic across layouts
    again = {
        (r["media_id"], r["frame_idx"]): (r["hamming"], r["is_cut"])
        for r in scene_changes(
            media.repartition(5), frame_bytes=32, stride=1, max_hamming=0
        ).collect()
    }
    assert again == {
        k: (r["hamming"], r["is_cut"]) for k, r in rows.items()
    }
