"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (hash-derived pixels); everything
Spark-side — schema, batch shape, partitioning, UDF signatures — is
real and tested. Swapping `_decode_stub` for PIL/ffmpeg is a pure
kernel change.

The synthetic `html` binary column follows FIXTURES.md §1:
b"<html>" + text + b"</html>" — and carries the per-row invariant that
extracted text must round-trip byte-identically (q_text_roundtrip).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, "
    "n_frames INT, payload BINARY"
)

FEATURE_SCHEMA = "doc_id BIGINT, media_type STRING, feature ARRAY<FLOAT>"

FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_feature ARRAY<FLOAT>"


def synth_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed media metadata
    (what a real pipeline gets from a WARC/object-store scan)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(b"<html>"), F.encode(F.col("text"), "UTF-8"), F.lit(b"</html>")
        ).alias("html"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        ((F.col("doc_id") * 37) % 512 + 16).cast("int").alias("width"),
        ((F.col("doc_id") * 53) % 512 + 16).cast("int").alias("height"),
        ((F.col("doc_id") * 7) % 120 + 1).cast("int").alias("n_frames"),
        F.sha2(F.col("text"), 256).cast("binary").alias("payload"),
    )


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Inverse of the synth step: strip the wrapper — the byte-identical
    text invariant (BASELINE.md per-row invariant) is asserted on this."""
    return pages.withColumn(
        "text_rt",
        F.decode(
            F.expr(f"substring({html_col}, 7, length({html_col}) - 13)"), "UTF-8"
        ),
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from the payload hash.
    Real implementation: PIL.Image.open(io.BytesIO(payload)) —
    NotImplemented in this container (no codec libs)."""
    seed = int.from_bytes(payload[:8], "little", signed=False) if payload else 0
    rng = np.random.RandomState(seed % (2**31))
    return rng.rand(min(height, 32), min(width, 32)).astype(np.float32)


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """decode → pooled feature vector, batched via mapInPandas (the
    Arrow batch is the unit of decode work; partition count controls
    decode parallelism at 100 TB)."""

    def op(batches):
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                px = _decode_stub(bytes(payload) if payload is not None else b"", int(w), int(h))
                # pooled row/col means, padded/truncated to dim
                pooled = np.concatenate([px.mean(axis=0), px.mean(axis=1)])
                pooled = np.resize(pooled, dim).astype(np.float32)
                feats.append(pooled.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 10, dim: int = 8) -> DataFrame:
    """Frame sampling for video rows: explode frame indices 0, every,
    2*every, ... < n_frames, then per-frame stub features. The explode
    happens JVM-side (sequence), only the decode is Python."""
    video = media.filter(F.col("media_type") == "video")
    frames = video.select(
        "doc_id",
        "width",
        "height",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )

    def op(batches):
        for pdf in batches:
            feats = []
            for payload, w, h, i in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["frame_idx"]
            ):
                px = _decode_stub(
                    (bytes(payload) if payload is not None else b"") + int(i).to_bytes(4, "little"),
                    int(w),
                    int(h),
                )
                feats.append(np.resize(px.mean(axis=0), dim).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_feature": feats,
                }
            )

    return frames.mapInPandas(op, FRAME_SCHEMA)
