"""Perceptual image dedup: dhash64, generic hamming_pairs blocking,
and the PNG decode -> hash -> block pipeline."""

from __future__ import annotations

import random

import numpy as np

from block_explorer_spark.functions import codecs as C
from block_explorer_spark.operators import dedup as D
from block_explorer_spark.operators import multimodal as M


def test_dhash_gradient_images():
    # strictly increasing columns -> every left pixel < right: all bits 0
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert C.dhash64(inc) == 0
    # strictly decreasing -> all 64 bits set -> signed -1
    dec = inc[:, ::-1].copy()
    assert C.dhash64(dec) == -1


def test_dhash_single_pixel_change_is_local():
    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    h0 = C.dhash64(base)
    mod = base.copy()
    mod[4, 4] = (int(mod[4, 4]) + 90) % 256
    h1 = C.dhash64(mod)
    # one pixel participates in at most 2 comparisons
    diff = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
    assert diff <= 2


def test_dhash_resizes_larger_images():
    rng = np.random.RandomState(7)
    small = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    # 2x block-upscaled image has identical block means -> same hash
    big = np.kron(small, np.ones((2, 2), dtype=np.uint8))
    assert C.dhash64(big) == C.dhash64(small)
    # RGB with equal channels == grayscale
    rgb = np.repeat(small[:, :, None], 3, axis=2)
    assert C.dhash64(rgb) == C.dhash64(small)


def test_hamming_pairs_matches_bruteforce(spark):
    rng = random.Random(5)
    # clustered hashes: a few bases, per-row up to 3 flipped bits
    bases = [rng.getrandbits(64) for _ in range(4)]
    rows = []
    for i in range(40):
        h = bases[i % 4]
        for _ in range(rng.randint(0, 3)):
            h ^= 1 << rng.randrange(64)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        rows.append((i, signed))
    df = spark.createDataFrame(rows, ["id", "h"])
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_pairs(df, "id", "h", max_hamming=6, blocks=8).collect()
    }
    want = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want.add((ia, ib, d))
    assert got == want


def test_perceptual_dedup_pairs_on_png_fixtures(spark):
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    far = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    near = base.copy()
    near[2, 3] = (int(near[2, 3]) + 80) % 256
    rows = [
        (1, bytearray(C.png_encode(base))),
        (2, bytearray(C.png_encode(near))),
        (3, bytearray(C.png_encode(far))),
        (4, bytearray(b"not a png at all")),  # corrupt -> NULL, dropped
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in M.perceptual_dedup_pairs(media, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert all(a != 4 and b != 4 for a, b in pairs)
    # sanity: unrelated random images stay apart (expected ~32 bits)
    assert (1, 3) not in pairs


def test_perceptual_hashes_null_for_corrupt(spark):
    media = spark.createDataFrame(
        [(9, bytearray(b"\x89PNG\r\n\x1a\ngarbage"))], "media_id long, payload binary"
    )
    rows = M.perceptual_hashes(media).collect()
    assert len(rows) == 1 and rows[0].dhash is None
