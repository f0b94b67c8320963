"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side shape — schema, partition-friendly layout,
Arrow-batched mapInPandas UDFs with bounded batch sizes — carries two
codec tiers:

- `real_decode` / `real_resize` / `real_frame_sample`: REAL codecs.
  PIL/pyav are used when installed (import-guarded); without them,
  pure-stdlib decoders in functions/codecs.py handle PNG (full
  RFC-2083 filter pipeline), PCM WAV, and Y4M video. Corrupt or
  unrecognized payloads yield NULL features — corrupt media is data,
  not an error, at 100 TB.
- `fake_decode` (& friends): deterministic digest-derived stand-ins,
  kept as the default for the oracle-checkable gate path (q32 pins
  sha256/n_bytes, not features) and for tests that need
  format-independent determinism.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
import hashlib
import io

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from block_explorer_spark.functions import codecs

try:  # optional: preferred image codec when the lib exists
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None

try:  # optional: preferred video codec when the lib exists
    import av as _pyav  # type: ignore
except ImportError:
    _pyav = None

#: media table: opaque payload + typed metadata. Partition by
#: (modality, shard) at scale; payloads never leave the executor.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


#: Per-chunk decoded-memory budget for the mapInPandas codec stages.
#: Chunks are cut when the cumulative codec-header decoded-size
#: estimate (codecs.decoded_size_estimate) would exceed this, so peak
#: python-worker memory is bounded by BYTES, not row count — row-count
#: batching lets a few large blobs multiply past the heap (the
#: round-9 sf1 q99/q100 OOM class, VERDICT r9 item 1). 64 MB x 32
#: concurrent tasks ≈ 2 GB worst-case decode scratch per host.
DEFAULT_CHUNK_BYTES = 64 << 20


def _payload_chunks(
    pdf: pd.DataFrame,
    payload_col: str,
    batch_size: int,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
) -> Iterator[pd.DataFrame]:
    """Split one Arrow batch into sub-frames bounded BOTH by row count
    (`batch_size`) and by cumulative estimated decoded bytes
    (`chunk_bytes`). A single oversized blob still gets its own
    1-row chunk — bounding is best-effort per chunk, exact across
    chunks. The JVM->python input batch itself is byte-bounded by
    spark.sql.execution.arrow.maxBytesPerBatch (session.py)."""
    est = [
        codecs.decoded_size_estimate(bytes(p)) if p is not None else 1
        for p in pdf[payload_col]
    ]
    start, acc = 0, 0
    for i in range(len(pdf)):
        rows = i - start
        if rows and (rows >= batch_size or acc + est[i] > chunk_bytes):
            yield pdf.iloc[start:i]
            start, acc = i, 0
        acc += est[i]
    if start < len(pdf):
        yield pdf.iloc[start:]


def fake_decode(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic digest-derived features — the format-independent
    stand-in used where the gate needs byte-level determinism
    (oracle-replicable), regardless of which codec libs exist."""
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:n_features]]


def _pil_image_features(payload: bytes, n_features: int) -> list[float]:
    img = _PILImage.open(io.BytesIO(payload)).convert("L")
    return [
        x / 255.0
        for x in codecs._bucket_means(np.asarray(img, dtype=np.float64), n_features)
    ]


def real_decode(payload: bytes, n_features: int = 8) -> list[float] | None:
    """REAL feature extraction: sniff the container, decode, pool to
    n_features floats. PIL handles images when installed; otherwise
    the pure-stdlib PNG decoder does. WAV -> windowed RMS energy;
    Y4M video -> per-frame luma means. Unknown/corrupt payloads
    return None (NULL features) instead of failing the task.
    """
    payload = payload or b""
    kind = codecs.sniff(payload)
    try:
        if kind == "png":
            if _PILImage is not None:
                return _pil_image_features(payload, n_features)
            return codecs.image_features(payload, n_features)
        if kind == "wav":
            return codecs.audio_features(payload, n_features)
        if kind == "y4m":
            return codecs.video_features(payload, n_features)
        if _PILImage is not None:  # non-PNG image formats (JPEG, ...)
            return _pil_image_features(payload, n_features)
    except (codecs.CodecError, OSError, ValueError):
        return None
    return None


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] = fake_decode,
    batch_size: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams columnar batches into Python; we re-chunk to at most
    `batch_size` rows AND at most DEFAULT_CHUNK_BYTES of estimated
    decoded footprint (_payload_chunks), so peak executor-python
    memory is bounded by bytes even when blob sizes vary 1000x —
    decoded media blows up 10-100x over the stored payload, and a
    row-count bound alone lets large blobs multiply past the heap.
    Payload bytes are dropped from the output — downstream stages join
    features back by media_id instead of re-shuffling blobs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _payload_chunks(pdf, "payload", batch_size):
                payloads = [bytes(p) if p is not None else b"" for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "modality": chunk["modality"].values,
                        "payload_sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                        "n_bytes": [len(p) for p in payloads],
                        "features": [decode_fn(p) for p in payloads],
                    }
                )

    cols = ["media_id", "modality", "payload"]
    return media.select(cols).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: truncate/pad the
    payload to width*height bytes — the format-independent contract
    check (binary in, binary out, bounded batches)."""
    target = max(1, width * height)
    data = (payload or b"")[:target]
    return data + b"\x00" * (target - len(data))


def real_resize(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL image resize: PIL (LANCZOS->PNG) when installed, else the
    pure-stdlib decode -> nearest-neighbor -> re-encode path. Corrupt
    or non-image payloads resize to None (NULL), never a task error."""
    payload = payload or b""
    try:
        if _PILImage is not None:
            img = _PILImage.open(io.BytesIO(payload))
            out = io.BytesIO()
            img.resize((width, height)).save(out, format="PNG")
            return out.getvalue()
        return codecs.png_resize_nearest(payload, width, height)
    except (codecs.CodecError, OSError, ValueError):
        return None


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resize_fn: Callable[[bytes, int, int], bytes] = fake_resize,
    batch_size: int = 64,
) -> DataFrame:
    """mapInPandas image resize: image rows only, re-chunked batches.

    Decoded images amplify memory 10-100x over the stored payload, so
    the batch size is small by default; output carries the new
    dimensions so downstream schema stays typed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _payload_chunks(pdf, "payload", batch_size):
                payloads = [bytes(p) if p is not None else b"" for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "width": [width] * len(chunk),
                        "height": [height] * len(chunk),
                        "resized": [resize_fn(p, width, height) for p in payloads],
                    }
                )

    images = media.filter(F.col("modality") == "image").select("media_id", "payload")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_frame_sample(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: n_frames even
    slices of the payload — the format-independent contract check."""
    data = payload or b"\x00"
    step = max(1, len(data) // n_frames)
    return [data[i * step : (i + 1) * step] or b"\x00" for i in range(n_frames)]


def real_frame_sample(payload: bytes, n_frames: int) -> list[bytes]:
    """REAL video frame sampling: pyav when installed (any container
    it can demux), else the pure-stdlib Y4M parser — n_frames evenly
    spaced raw frames. Corrupt payloads yield an empty list (rows
    simply absent for that media_id), never a task error."""
    payload = payload or b""
    try:
        if _pyav is not None and codecs.sniff(payload) != "y4m":
            with _pyav.open(io.BytesIO(payload)) as container:
                frames = [
                    bytes(fr.to_ndarray(format="gray").tobytes())
                    for fr in container.decode(video=0)
                ]
            if not frames:
                return []
            idx = [
                i * (len(frames) - 1) // max(1, n_frames - 1) for i in range(n_frames)
            ]
            return [frames[i] for i in idx]
        return codecs.y4m_sample_frames(payload, n_frames)
    except (codecs.CodecError, OSError, ValueError):
        return []


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    sample_fn: Callable[[bytes, int], list[bytes]] = fake_frame_sample,
    batch_size: int = 16,
) -> DataFrame:
    """mapInPandas video frame sampling: one output row per sampled
    frame (media_id, frame_idx, frame_ms, frame bytes).

    The 1→N row expansion happens inside the Arrow batch — frames of
    one video never split across executors mid-flight, and duration_ms
    spaces frame timestamps evenly when present.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _payload_chunks(pdf, "payload", batch_size):
                out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame": []}
                for _, row in chunk.iterrows():
                    payload = bytes(row["payload"]) if row["payload"] is not None else b""
                    dur = row["duration_ms"]
                    frames = sample_fn(payload, n_frames)
                    for i, fr in enumerate(frames):
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(i)
                        out["frame_ms"].append(
                            int(dur) * i // max(1, n_frames - 1) if dur is not None else None
                        )
                        out["frame"].append(fr)
                yield pd.DataFrame(out)

    videos = media.filter(F.col("modality") == "video").select(
        "media_id", "payload", "duration_ms"
    )
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM per-modality stats (no decode): bytes, counts, dims."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )


def perceptual_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_size: int = 256,
) -> DataFrame:
    """(id, dhash) per image payload: decode (PIL when installed,
    else the stdlib PNG path) -> 64-bit difference hash
    (codecs.dhash64 — grayscale, area-mean 8x9, horizontal-gradient
    bits). Corrupt/undecodable payloads yield NULL, not an error.

    Doc-local and Arrow-batched: the expensive part (decode) never
    shuffles; only the 8-byte hash leaves the executor. Near-dup
    joins over the result go through dedup.hamming_pairs (pigeonhole
    blocking — exact, never all-pairs)."""

    def _decode(payload: bytes) -> np.ndarray | None:
        try:
            if payload[:8] == codecs.PNG_SIG:
                return codecs.png_decode(payload)
            if _PILImage is not None:
                img = _PILImage.open(io.BytesIO(payload))
                return np.asarray(img.convert("L"))
        except (codecs.CodecError, OSError, ValueError):
            return None
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _payload_chunks(pdf, payload_col, batch_size):
                hashes = []
                for p in chunk[payload_col]:
                    img = _decode(bytes(p)) if p is not None else None
                    hashes.append(codecs.dhash64(img) if img is not None else None)
                yield pd.DataFrame({id_col: chunk[id_col].values, "dhash": hashes})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("dhash", T.LongType(), True),
        ]
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def perceptual_dedup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    blocks: int = 8,
    key_arity: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs: dHash + exact hamming blocking.
    (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming."""
    from block_explorer_spark.operators import dedup as D

    hashes = perceptual_hashes(media, id_col, payload_col).filter(
        F.col("dhash").isNotNull()
    )
    return D.hamming_pairs(
        hashes, id_col, "dhash", max_hamming=max_hamming, blocks=blocks,
        key_arity=key_arity,
    ).select("id_a", "id_b", "hamming")


def audio_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_size: int = 256,
) -> DataFrame:
    """(id, afp) per audio payload: WAV decode (stdlib PCM path) ->
    64-bit perceptual fingerprint (codecs.audio_fingerprint64 —
    windowed band-energy delta signs, integer end-to-end). Corrupt or
    undecodable payloads yield NULL, not an error.

    Doc-local and Arrow-batched like perceptual_hashes: decode never
    shuffles, only the 8-byte fingerprint leaves the executor; pairing
    goes through dedup.hamming_pairs (pigeonhole blocking)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _payload_chunks(pdf, payload_col, batch_size):
                fps = []
                for p in chunk[payload_col]:
                    try:
                        samples, rate = codecs.wav_decode(bytes(p))
                        fps.append(codecs.audio_fingerprint64(samples, rate))
                    except (codecs.CodecError, TypeError, ValueError):
                        fps.append(None)
                yield pd.DataFrame({id_col: chunk[id_col].values, "afp": fps})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
        ]
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_dedup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    blocks: int = 8,
    key_arity: int | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs (round-6 item 8): WAV decode ->
    audio_fingerprint64 -> exact pigeonhole hamming blocking.
    (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming —
    perceptual_dedup_pairs' audio twin."""
    from block_explorer_spark.operators import dedup as D

    fps = audio_fingerprints(media, id_col, payload_col).filter(
        F.col("afp").isNotNull()
    )
    return D.hamming_pairs(
        fps, id_col, "afp", max_hamming=max_hamming, blocks=blocks,
        key_arity=key_arity,
    ).select("id_a", "id_b", "hamming")


def video_keyframe_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    batch_size: int = 64,
) -> DataFrame:
    """(id, frame_idx, vhash) per Y4M payload: parse the stream,
    sample `n_frames` evenly spaced keyframes (codecs.y4m_sample_frames'
    index rule), dHash each frame's luma plane (codecs.dhash64 — the
    q98 image recipe applied per keyframe). Corrupt payloads emit
    nothing. Decode is doc-local/Arrow-batched; only (8-byte hash,
    slot) rows leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _payload_chunks(pdf, payload_col, batch_size):
                ids, slots, hashes = [], [], []
                for mid, p in zip(chunk[id_col], chunk[payload_col]):
                    try:
                        w, h, _cs, frames = codecs.y4m_parse(bytes(p))
                        if not frames:
                            continue
                        idx = [
                            i * (len(frames) - 1) // max(1, n_frames - 1)
                            for i in range(n_frames)
                        ]
                        for j, fi in enumerate(idx):
                            luma = np.frombuffer(
                                frames[fi][: w * h], dtype=np.uint8
                            ).reshape(h, w)
                            ids.append(mid)
                            slots.append(j)
                            hashes.append(codecs.dhash64(luma))
                    except (codecs.CodecError, ValueError):
                        continue
                yield pd.DataFrame(
                    {id_col: ids, "frame_idx": slots, "vhash": hashes}
                )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("vhash", T.LongType(), False),
        ]
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def video_dedup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    max_hamming: int = 6,
    blocks: int = 8,
    key_arity: int | None = None,
) -> DataFrame:
    """Near-duplicate video pairs (round-6 item 8, optional half):
    keyframe-dHash — two videos pair when EVERY sampled slot's frame
    hashes are within `max_hamming` (all-slots rule: a shared intro
    frame alone never pairs two different videos). Per-slot candidate
    generation goes through the exact pigeonhole blocking, so the
    expensive step is never all-pairs. Output (id_a, id_b, hamming)
    with hamming = the worst slot's distance, id_a < id_b."""
    from block_explorer_spark.operators import dedup as D

    hashes = video_keyframe_hashes(
        media, id_col, payload_col, n_frames=n_frames
    )
    per_slot = None
    for j in range(n_frames):
        slot = hashes.filter(F.col("frame_idx") == j)
        pairs_j = D.hamming_pairs(
            slot, id_col, "vhash", max_hamming=max_hamming, blocks=blocks,
            key_arity=key_arity,
        ).select("id_a", "id_b", "hamming")
        per_slot = pairs_j if per_slot is None else per_slot.unionByName(pairs_j)
    return (
        per_slot.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__slots"),
            F.max("hamming").alias("hamming"),
        )
        .filter(F.col("__slots") == n_frames)
        .select("id_a", "id_b", "hamming")
    )
