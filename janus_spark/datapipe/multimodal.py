"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions
over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (``fake=True``) or raises
NotImplementedError (``fake=False``) — but the Spark-side plumbing is
real: schema contracts, Arrow batch shapes, partition-parallel execution,
and metadata pass-through are exactly what a production decode would use
(swap `_fake_decode` for PIL/librosa/ffmpeg in a real container).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta", StringType(), True),  # JSON sidecar
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Build a deterministic fake media corpus from the documents table
    (payload = utf-8 bytes of the text) — test fixture for the plumbing."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.to_json(F.struct(F.col("source"), F.col("lang"))).alias("meta"),
    )


def _digest60(payload: bytes) -> int:
    """60-bit digest from the top 15 hex chars of md5 — chosen because a
    DuckDB oracle reproduces it exactly (``('0x' || substr(md5(x), 1,
    15))::BIGINT``), making the decode gate value-checkable."""
    import hashlib

    return int(hashlib.md5(payload or b"").hexdigest()[:15], 16)


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode (no codecs in this container): derives
    width/height/frames from an md5 digest of the payload.  Replace with
    a real decoder (PIL/librosa/ffmpeg) in production."""
    h = _digest60(payload)
    if media_type == "image":
        return 64 + h % 512, 64 + (h >> 9) % 512, 1
    if media_type == "audio":
        return 1, 1, 1000 + h % 100000  # "samples"
    return 32 + h % 256, 32 + (h >> 8) % 256, 1 + h % 300  # video frames


def decode_media(df: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas (Arrow
    batches).  ``fake=False`` raises NotImplementedError per batch — the
    marker that a real codec belongs here."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in this container"
                )
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "checksum": pdf["payload"].map(_digest60),
            }
            dims = [
                _fake_decode(t, p)
                for t, p in zip(pdf["media_type"], pdf["payload"])
            ]
            out["width"] = pd.Series([d[0] for d in dims], dtype="int32")
            out["height"] = pd.Series([d[1] for d in dims], dtype="int32")
            out["n_frames"] = pd.Series([d[2] for d in dims], dtype="int32")
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling plan for video rows: one output row per sampled
    frame index (pure Column ops — the decode already happened)."""
    v = decoded.where(F.col("media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return v.select("media_id", F.explode(idx).alias("frame_index"))


def resize_plan(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize geometry for image/video rows: fit the longer side to
    ``max_side`` preserving aspect ratio, never upscale.  This is real
    logic, not a stub — the pixel work happens wherever the decode does;
    the plan (target dims per row) is pure Column arithmetic, map-only."""
    longer = F.greatest("width", "height")
    scale = F.when(longer > max_side, F.lit(max_side) / longer).otherwise(F.lit(1.0))
    return decoded.where(F.col("media_type").isin("image", "video")).select(
        "media_id",
        "media_type",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias("target_width"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias("target_height"),
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Embedding extraction over Arrow batches (mapInPandas).  The model
    forward pass is a DETERMINISTIC FAKE (bytes → seeded unit vector);
    ``fake=False`` raises NotImplementedError, marking where a real
    encoder (CLIP/ViT/wav2vec) slots in.  Output embeddings are
    ``array<float>`` compatible with the similarity/ANN operators — the
    full multimodal near-dup pipeline (decode → features → LSH/IVF) is
    exercisable end-to-end."""
    import hashlib
    import math

    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires an encoder model not present in this container"
                )
            embs = []
            for payload in pdf["payload"]:
                # md5 hash family (component i from md5(payload || ':i')) —
                # the cross-engine coin: a SQL oracle reproduces the
                # embedding bit-for-bit, so multimodal→ANN is gateable
                # EXACT.  Sequential float ops only (no numpy pairwise
                # summation) for the same reason.
                p = payload or b""
                comps = [
                    int(hashlib.md5(p + b":" + str(i).encode()).hexdigest()[:8], 16)
                    / 4294967296.0
                    - 0.5
                    for i in range(dim)
                ]
                sq = 0.0
                for c in comps:
                    sq += c * c
                norm = math.sqrt(sq)
                if norm == 0.0:
                    norm = 1.0
                embs.append(np.array([c / norm for c in comps], dtype="float32"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "embedding": embs,
                }
            )

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


def audio_window_features(
    df: DataFrame,
    frame: int = 100,
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Audio analysis plumbing: fake-decode a PCM sample stream per media
    row (deterministic md5 hash family — the cross-engine coin, so the
    whole operator is oracle-EXACT), then compute per-frame features:
    RMS level, peak, and zero-crossing count — the standard silence/
    speech-activity triage signals that decide which audio survives into
    a training mix.

    ``fake=False`` raises NotImplementedError, marking where a real
    decoder (ffmpeg/librosa) slots in; everything AFTER the sample
    array — framing, per-frame aggregation, the explode shape — is the
    real distributed plan (all JVM-side higher-order array ops, one
    narrow projection + explode, no shuffle at all until a caller
    aggregates).

    Sample model: ``n = 200 + h(id) % 300`` samples in [-0.5, 0.5),
    sample i = md5(id || ':s' || i) scaled.  Frames are non-overlapping
    ``frame``-sized windows; a trailing partial frame is kept (its
    aggregates run over the remainder).
    """
    if not fake:
        raise NotImplementedError(
            "audio decode requires codecs not present in this container"
        )
    sid = F.col(id_col).cast("string")
    hv = F.conv(F.substring(F.md5(sid), 1, 15), 16, 10).cast("long")
    n = (F.lit(200) + (hv % 300)).cast("int")
    samples = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.conv(
            F.substring(F.md5(F.concat(sid, F.lit(":s"), i.cast("string"))), 1, 8), 16, 10
        ).cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5),
    )
    base = df.select(F.col(id_col).alias("media_id"), samples.alias("__s"), n.alias("__n"))
    n_frames = F.ceil(F.col("__n") / F.lit(frame)).cast("int")
    framed = base.select(
        "media_id",
        "__s",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("__f", F.slice(F.col("__s"), F.col("frame_idx") * frame + 1, frame))
    sq_sum = F.aggregate(
        F.col("__f"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    peak = F.array_max(F.transform(F.col("__f"), lambda x: F.abs(x)))
    # zero crossings: sign changes between consecutive samples
    signs = F.transform(F.col("__f"), lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(-1)))
    zc = F.aggregate(
        F.zip_with(signs, F.slice(signs, 2, F.greatest(F.size(signs) - 1, F.lit(1))),
                   lambda a, b: F.when(a != b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),
    )
    return framed.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.size("__f").cast("long").alias("n_samples"),
        F.round(F.sqrt(sq_sum / F.size("__f")), 6).alias("rms"),
        F.round(peak, 6).alias("peak"),
        zc.cast("long").alias("zero_crossings"),
    )


def scene_changes(
    decoded: DataFrame,
    threshold: float = 0.4,
    id_col: str = "media_id",
) -> DataFrame:
    """Video scene-change detection over decoded frame features: a scene
    boundary wherever the frame-to-frame feature delta exceeds
    ``threshold``; scenes are numbered per video by a running boundary
    count.  Output one row per scene: (media_id, scene_id, start_frame,
    n_frames).

    The per-frame feature here is the md5-family hash of
    (media_id:frame_index) scaled to [0,1) — the honest stand-in for a
    real luminance/histogram extractor (no codecs in this container),
    SQL-reproducible like every other fake-decode leg, so the gate is
    EXACT.  The Spark-side shape is the real one: frames explode
    arithmetically from ``n_frames`` (no per-frame payload shuffles —
    features would be computed inside the same ``mapInPandas`` pass that
    decoded the video), one window pass per video for the lag delta and
    the running scene id, one grouped aggregate for scene summaries.
    """
    frames = decoded.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_index"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("frame_index").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    lum = (h % 1000).cast("double") / F.lit(1000.0)
    w = Window.partitionBy(id_col).orderBy("frame_index")
    delta = F.abs(lum - F.lag(lum).over(w))
    cut = F.when(delta.isNull(), F.lit(0)).otherwise(
        F.when(delta > F.lit(threshold), F.lit(1)).otherwise(F.lit(0))
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scenes = frames.withColumn("scene_id", (F.lit(1) + F.sum(cut).over(wrun)).cast("long"))
    return scenes.groupBy(id_col, "scene_id").agg(
        F.min("frame_index").alias("start_frame"),
        F.count(F.lit(1)).alias("n_frames"),
    )
