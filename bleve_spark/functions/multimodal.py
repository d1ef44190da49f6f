"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction are Arrow-batched ``mapInPandas`` stages.
The decode kernels themselves are STUBBED (no imaging/audio libs in this
container — clearly marked below); everything Spark-side is real and
tested: schemas, batch shapes, partitioning, the UDF contract, and a
deterministic fake "decoder" so downstream stages (dedup by content
hash, resolution filtering, frame sampling plans) can be exercised
end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "key long, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "key long, media_type string, content_hash string, "
    "n_bytes int, width int, height int, "
    "feature array<float>"
)


def synthesize_media_df(spark, df: DataFrame, key_col: str) -> DataFrame:
    """Attach a deterministic fake binary payload per row: payload =
    ascii(sha256(str(key)).hexdigest()) × 8 — chosen so the content
    hash is reproducible in the ANSI-SQL oracle
    (sha256(repeat(sha256(key::VARCHAR), 8)))."""

    def gen(batches):
        for pdf in batches:
            keys = pdf[key_col].astype("int64")
            payloads = [
                hashlib.sha256(str(int(k)).encode())
                .hexdigest().encode() * 8
                for k in keys
            ]
            yield pd.DataFrame(
                {
                    "key": keys,
                    "media_type": [
                        ["image", "audio", "video"][int(k) % 3]
                        for k in keys
                    ],
                    "payload": payloads,
                    "width": [64 + (int(k) % 8) * 32 for k in keys],
                    "height": [64 + (int(k) % 5) * 32 for k in keys],
                    "duration_ms": [
                        0 if int(k) % 3 == 0 else 1000 + int(k) % 9000
                        for k in keys
                    ],
                }
            )

    return df.select(key_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — real implementation requires an imaging library (PIL /
    cv2), not present in this container. The deterministic fake below
    keeps the pipeline testable; swap the body for
    ``np.asarray(Image.open(io.BytesIO(payload)))`` in production."""
    rng = np.frombuffer(
        hashlib.sha256(payload[:32]).digest(), dtype=np.uint8
    )
    return np.resize(rng, (8, 8)).astype(np.float32)


def _sample_frames(payload: bytes, duration_ms: int, fps: float = 1.0):
    """STUB — frame sampling needs a video decoder (pyav/ffmpeg).
    Returns deterministic fake frames at the real sampling cadence so
    the batch-shape contract is exercised."""
    n = max(1, int(duration_ms / 1000.0 * fps))
    n = min(n, 8)
    return [_decode_image(payload + bytes([i]), 8, 8) for i in range(n)]


def extract_features(media_df: DataFrame, batch_size_hint: int = 256
                     ) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Real Spark plumbing: mapInPandas with bounded batch memory (binary
    payloads stream per Arrow batch; at scale set
    spark.sql.execution.arrow.maxRecordsPerBatch to keep
    batch_bytes ≈ batch_size_hint × avg_payload). Decode kernels are
    stubbed (see _decode_image/_sample_frames)."""

    def extract(batches):
        for pdf in batches:
            feats, hashes, nbytes = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                hashes.append(hashlib.sha256(payload).hexdigest())
                nbytes.append(len(payload))
                if row["media_type"] == "video":
                    frames = _sample_frames(
                        payload, int(row["duration_ms"] or 0)
                    )
                    arr = np.mean([f.mean(axis=0) for f in frames], axis=0)
                else:
                    arr = _decode_image(
                        payload, int(row["width"] or 0),
                        int(row["height"] or 0),
                    ).mean(axis=0)
                feats.append(arr.astype(np.float32).tolist())
            out = pd.DataFrame(
                {
                    "key": pdf["key"],
                    "media_type": pdf["media_type"],
                    "content_hash": hashes,
                    "n_bytes": nbytes,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feature": feats,
                }
            )
            yield out

    return media_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def dedup_by_content_hash(features_df: DataFrame) -> DataFrame:
    """Exact media dedup on the decoded-content hash."""
    return features_df.groupBy("content_hash").agg(
        F.min("key").alias("keep_key"),
        F.count(F.lit(1)).alias("dup_count"),
    )
