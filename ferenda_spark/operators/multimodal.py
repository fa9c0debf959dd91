"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages (training-data pipeline extension; the reference's analog is its
binary-format readers S7/S8, /root/reference/ferenda/pdfreader.py:29-916).

The decode step is STUBBED: the real image/audio libraries are not
available in this container, so ``decode_image``/``decode_audio`` either
raise NotImplementedError (strict mode) or produce a deterministic fake
(test mode).  Everything Spark-side — schemas, batch iteration, UDF
signatures, partitioning advice — is real and tested.

Scale notes: media blobs dominate row size, so
- keep blobs OUT of shuffles: derive metadata/features first (narrow
  map), join features later by key;
- size Arrow batches by bytes, not rows: pass ``target_batch_bytes`` and
  the stage re-chunks each incoming batch;
- at 100 TB, store blobs in separate storage with pointer columns and
  feed ``spark.sql.files.maxPartitionBytes``-sized scans.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import col as F_col

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_sha1", T.StringType()),
    T.StructField("width", T.IntegerType()),      # image/video only
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),  # audio/video only
    T.StructField("feature", T.ArrayType(T.FloatType())),  # small embedding
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("error", T.StringType()),
])

STRICT = False  # flip to raise NotImplementedError instead of faking


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB — real impl would use PIL/opencv (not in this container).
    Deterministic fake: dims from a hash of the payload; 8-dim feature."""
    if STRICT:
        raise NotImplementedError("image decode requires PIL/opencv")
    h = hashlib.sha1(payload).digest()
    w = 64 + h[0] % 192
    hgt = 64 + h[1] % 192
    feat = [x / 255.0 for x in h[:8]]
    return w, hgt, feat


def decode_audio(payload: bytes) -> tuple[float, list[float]]:
    """STUB — real impl would use soundfile/librosa."""
    if STRICT:
        raise NotImplementedError("audio decode requires soundfile")
    h = hashlib.sha1(payload).digest()
    dur = 1.0 + (struct.unpack(">H", h[:2])[0] % 600) / 10.0
    feat = [x / 255.0 for x in h[8:16]]
    return dur, feat


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
            data = bytes(payload) if payload is not None else b""
            row = {
                "media_id": mid, "kind": kind, "n_bytes": len(data),
                "content_sha1": hashlib.sha1(data).hexdigest(),
                "width": None, "height": None, "duration_s": None,
                "feature": None, "decode_ok": True, "error": None,
            }
            try:
                if kind == "image":
                    row["width"], row["height"], row["feature"] = \
                        decode_image(data)
                elif kind in ("audio", "video"):
                    row["duration_s"], row["feature"] = decode_audio(data)
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
            except Exception as e:
                row["decode_ok"] = False
                row["error"] = f"{type(e).__name__}: {e}"
            rows.append(row)
        yield pd.DataFrame(rows,
                           columns=[f.name for f in FEATURES_SCHEMA.fields])


def extract_features(media: DataFrame) -> DataFrame:
    """media -> per-blob features.  Narrow map; blobs never shuffle."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _feature_batches, FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_s", T.DoubleType()),
    T.StructField("frame_sha1", T.StringType()),
    T.StructField("frame_feature", T.ArrayType(T.FloatType())),
])


def rechunk_by_bytes(batches: Iterator[pd.DataFrame],
                     target_bytes: int) -> Iterator[pd.DataFrame]:
    """Re-slice incoming Arrow batches so each processed chunk carries
    at most ~target_bytes of payload — media rows vary by orders of
    magnitude, and a row-count batch policy lets one batch of 4K videos
    OOM a python worker while another holds a thousand icons.  A single
    over-budget row still passes through alone (can't split a blob)."""
    for pdf in batches:
        sizes = pdf["payload"].map(
            lambda p: len(p) if p is not None else 0)
        start, acc = 0, 0
        for i, s in enumerate(sizes):
            if acc + int(s) > target_bytes and i > start:
                yield pdf.iloc[start:i]
                start, acc = i, 0
            acc += int(s)
        if start < len(pdf):
            yield pdf.iloc[start:]


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("orig_w", T.IntegerType()),
    T.StructField("orig_h", T.IntegerType()),
    T.StructField("new_w", T.IntegerType()),
    T.StructField("new_h", T.IntegerType()),
    T.StructField("resized_sha1", T.StringType()),
])


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """image rows -> aspect-preserving resize targets.  The dimension
    math (fit the long side to max_side, never upscale, round the short
    side, floor at 1px) is REAL; the pixel work is stubbed like the
    decodes (real impl: PIL.thumbnail / cv2.resize inside the same
    batch loop).  Narrow map; blobs never shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, _ = decode_image(data)
                scale = min(1.0, max_side / max(w, h))
                nw = max(1, int(round(w * scale)))
                nh = max(1, int(round(h * scale)))
                fake = hashlib.sha1(
                    data + struct.pack(">II", nw, nh)).hexdigest()
                rows.append({"media_id": mid, "orig_w": w, "orig_h": h,
                             "new_w": nw, "new_h": nh,
                             "resized_sha1": fake})
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields])
            rows = []

    return (media.where(F_col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(gen, RESIZED_SCHEMA))


def _decode_frames(payload: bytes, fps: float,
                   max_frames: int) -> list[tuple[int, float, bytes]]:
    """STUB — real impl would use pyav/ffmpeg (not in this container).
    Deterministic fake: duration from the payload hash (same rule as
    decode_audio), one frame every 1/fps seconds, frame bytes derived
    from (payload hash, frame index)."""
    if STRICT:
        raise NotImplementedError("video decode requires pyav/ffmpeg")
    h = hashlib.sha1(payload).digest()
    dur = 1.0 + (struct.unpack(">H", h[:2])[0] % 600) / 10.0
    n = min(max_frames, max(1, int(dur * fps)))
    return [(k, round(k / fps, 3),
             hashlib.sha1(h + struct.pack(">I", k)).digest())
            for k in range(n)]


def sample_frames(media: DataFrame, fps: float = 1.0,
                  max_frames: int = 16,
                  target_batch_bytes: int = 64 << 20) -> DataFrame:
    """video rows -> per-frame rows (1->N fan-out inside the pandas
    stage: the output yields MORE rows than the input batch, the batch
    shape a real frame sampler has).  Still a narrow map — blobs never
    shuffle; downstream joins use (media_id, frame_idx)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in rechunk_by_bytes(batches, target_batch_bytes):
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                for k, ts, fb in _decode_frames(data, fps, max_frames):
                    rows.append({
                        "media_id": mid, "frame_idx": k, "ts_s": ts,
                        "frame_sha1": hashlib.sha1(fb).hexdigest(),
                        "frame_feature": [x / 255.0 for x in fb[:8]],
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return (media.where(F_col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(gen, FRAMES_SCHEMA))


def synth_media_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 13)
        rows.append((i, kind, payload, f"application/x-fake-{kind}",
                     {"origin": f"synth:{seed}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
