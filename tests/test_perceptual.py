"""Perceptual image dedup: dhash64, generic hamming_pairs blocking,
and the PNG decode -> hash -> block pipeline."""

from __future__ import annotations

import random

import numpy as np
import pytest

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


# ---------------------------------------------------- round 6: audio (q99)


def _wav(v):
    import numpy as np

    return C.wav_encode(np.asarray(v, dtype=np.float32))


def _rand_signal(seed, n=128):
    import numpy as np

    rng = np.random.RandomState(seed)
    return (rng.randint(0, 256, n) - 128) / 128.0


def test_audio_fingerprint_roundtrip_stable():
    """encode -> decode -> fingerprint must be bit-stable across a
    second WAV roundtrip (the integer PCM grid guarantees it)."""
    import numpy as np

    v = _rand_signal(1)
    s, r = C.wav_decode(_wav(v))
    f1 = C.audio_fingerprint64(s, r)
    s2, _ = C.wav_decode(C.wav_encode(np.asarray(s, dtype=np.float32)))
    assert C.audio_fingerprint64(s2) == f1


def test_audio_fingerprint_locality_and_discrimination():
    """A tiny perturbation moves few bits; unrelated signals are ~32
    bits apart — the property hamming blocking needs."""
    import numpy as np

    def fp(v):
        s, _ = C.wav_decode(_wav(v))
        return C.audio_fingerprint64(s)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    v = _rand_signal(1)
    v2 = v.copy()
    v2[40] += 13 / 128.0
    assert ham(fp(v), fp(v2)) <= 4
    assert ham(fp(v), fp(_rand_signal(2))) >= 15


def test_audio_fingerprint_short_and_stereo():
    import numpy as np

    short = _rand_signal(3, n=20)  # zero-padded to FP_SAMPLES
    s, _ = C.wav_decode(_wav(short))
    assert isinstance(C.audio_fingerprint64(s), int)
    stereo = np.stack([_rand_signal(4), _rand_signal(5)], axis=1)
    s2, _ = C.wav_decode(C.wav_encode(stereo.astype(np.float32)))
    assert s2.shape[1] == 2
    assert isinstance(C.audio_fingerprint64(s2), int)


def test_audio_dedup_pairs_blocked_equals_bruteforce(spark):
    """audio_dedup_pairs (pigeonhole blocking) must equal the
    all-pairs hamming filter, and corrupt payloads drop to NULL."""
    import itertools

    import numpy as np

    base = _rand_signal(7)
    rows = []
    fps = {}
    for i in range(8):
        v = base.copy()
        v[i * 3] += (i % 5) / 128.0  # near-dup family
        rows.append((i, bytearray(_wav(v))))
    for i in range(8, 12):
        rows.append((i, bytearray(_wav(_rand_signal(100 + i)))))
    rows.append((99, bytearray(b"RIFFgarbage")))
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in M.audio_dedup_pairs(media, max_hamming=6).collect()
    }
    hashes = {
        r.media_id: r.afp
        for r in M.audio_fingerprints(media).collect()
        if r.afp is not None
    }
    assert 99 not in hashes  # corrupt -> NULL, dropped
    want = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        h = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
        if h <= 6:
            want[(a, b)] = h
    assert got == want
    assert got  # the family produced at least one pair


# ---------------------------------------------------- round 6: video (q100)


def _frames(seed, n=3, h=8, w=9):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


def test_video_keyframe_hashes_and_all_slots_rule(spark):
    """Two videos pair only when EVERY sampled keyframe matches: a
    shared intro frame alone must not pair different videos."""
    base = _frames(1)
    near = [f.copy() for f in base]
    near[1][3, 4] += 7  # one pixel in one frame: tiny hamming
    intro_only = [base[0]] + _frames(2, n=2)  # same intro, different rest
    unrelated = _frames(3)
    rows = [
        (1, bytearray(C.y4m_encode(base, "Cmono"))),
        (2, bytearray(C.y4m_encode(near, "Cmono"))),
        (3, bytearray(C.y4m_encode(intro_only, "Cmono"))),
        (4, bytearray(C.y4m_encode(unrelated, "Cmono"))),
        (9, bytearray(b"not y4m")),  # corrupt: skipped
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = M.video_keyframe_hashes(media, n_frames=3).collect()
    assert {r.media_id for r in hashes} == {1, 2, 3, 4}
    assert all(sum(1 for r in hashes if r.media_id == m) == 3 for m in (1, 2, 3, 4))

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in M.video_dedup_pairs(media, n_frames=3, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert (1, 3) not in pairs  # intro matches, later slots don't
    assert (1, 4) not in pairs


@pytest.mark.slow
def test_video_dedup_blocked_equals_bruteforce(spark):
    """The per-slot blocking + all-slots join equals the brute-force
    formulation over the same keyframe hashes."""
    import itertools

    rows = []
    base = _frames(5, n=2)
    for i in range(6):
        fr = [f.copy() for f in base]
        fr[i % 2][i % 8, i % 9] += i  # drifting family
        rows.append((i, bytearray(C.y4m_encode(fr, "Cmono"))))
    for i in range(6, 9):
        rows.append((i, bytearray(C.y4m_encode(_frames(50 + i, n=2), "Cmono"))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    hashes = {}
    for r in M.video_keyframe_hashes(media, n_frames=2).collect():
        hashes.setdefault(r.media_id, {})[r.frame_idx] = r.vhash
    want = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        hs = [
            bin((hashes[a][j] ^ hashes[b][j]) & ((1 << 64) - 1)).count("1")
            for j in (0, 1)
        ]
        if max(hs) <= 6:
            want[(a, b)] = max(hs)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in M.video_dedup_pairs(media, n_frames=2, max_hamming=6).collect()
    }
    assert got == want and got


@pytest.mark.slow
def test_hamming_pairs_multi_block_keys_match_bruteforce(spark):
    """Round-6: Manku-style key_arity (agree on >= arity blocks ->
    wider bucket keys) must return exactly the brute-force pair set at
    every legal arity; illegal arities fail loudly."""
    import itertools
    import random

    import pytest as _pytest

    rng = random.Random(5)
    rows = []
    base = rng.getrandbits(64)
    for i in range(30):  # planted near-dup family
        h = base
        for _ in range(rng.randint(0, 4)):
            h ^= 1 << rng.randrange(64)
        rows.append((i, h - (1 << 64) if h >= (1 << 63) else h))
    for i in range(30, 60):  # uniform noise
        h = rng.getrandbits(64)
        rows.append((i, h - (1 << 64) if h >= (1 << 63) else h))
    df = spark.createDataFrame(rows, "id long, h long")

    def brute(k):
        return sorted(
            (x, y, bin((hx ^ hy) & ((1 << 64) - 1)).count("1"))
            for (x, hx), (y, hy) in itertools.combinations(rows, 2)
            if bin((hx ^ hy) & ((1 << 64) - 1)).count("1") <= k
        )

    for k, arities in ((3, (1, 2, 5)), (6, (1, 2))):
        want = brute(k)
        for a in arities:
            got = sorted(
                (r.id_a, r.id_b, r.hamming)
                for r in D.hamming_pairs(
                    df, "id", "h", max_hamming=k, blocks=8, key_arity=a
                ).collect()
            )
            assert got == want, (k, a)
    with _pytest.raises(AssertionError, match="key_arity"):
        D.hamming_pairs(df, "id", "h", max_hamming=6, blocks=8, key_arity=3)


def test_hamming_equal_family_sharding_exact(spark, monkeypatch):
    """The chunk-sharded distance-0 expansion must emit exactly the
    same pair set as brute force, across chunk boundaries (chunk size
    forced to 7 so a 23-dup family spans 4 chunks) and alongside
    cross-value candidates."""
    import itertools

    monkeypatch.setattr(D, "_EQUAL_FAMILY_CHUNK", 7)
    rng = random.Random(13)
    base = rng.getrandbits(63)  # positive long
    rows = [(i, base) for i in range(23)]  # one mass-dup family
    rows += [(100 + i, base ^ (1 << rng.randrange(60))) for i in range(5)]
    rows += [(200, base ^ 0xFFFF)]  # far value: filtered by hamming
    df = spark.createDataFrame(rows, ["id", "h"])
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_pairs(df, "id", "h", max_hamming=3, blocks=8).collect()
    )
    want = sorted(
        (x, y, bin(hx ^ hy).count("1"))
        for (x, hx), (y, hy) in itertools.combinations(rows, 2)
        if bin(hx ^ hy).count("1") <= 3
    )
    assert got == want


def test_hamming_mass_duplicate_family_bounded(spark, monkeypatch):
    """A single hash value shared by 20k rows (boilerplate/black-frame
    shape) must stream its C(m,2) pairs through the sharded join, not
    materialize them as one in-row struct array. The old formulation
    built ~2e8 structs on ONE row here; the sharded plan's per-task
    state is bounded by the chunk size. Exact count certified."""
    from pyspark.sql import functions as F

    monkeypatch.setattr(D, "_EQUAL_FAMILY_CHUNK", 1024)
    m = 20_000
    df = spark.range(m).select(
        F.col("id"), F.lit(0x7A5A5A5A5A5A5A5).cast("long").alias("h")
    )
    out = D.hamming_pairs(df, "id", "h", max_hamming=6, blocks=8)
    # plan census: the equal path shards via posexplode + join; the
    # quadratic in-row transform(slice) expansion must not appear on
    # a pure-equal input (no cross-value buckets survive to pair).
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "posexplode" in plan
    assert out.count() == m * (m - 1) // 2
