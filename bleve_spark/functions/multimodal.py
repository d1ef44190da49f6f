"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction are Arrow-batched ``mapInPandas`` stages.
Only the codec DECODE SEAMS are stubbed (JPEG/PNG/audio codecs need
PIL/cv2/soundfile, absent in this container — each seam is one marked
function producing a deterministic full-shape raster/waveform).
Everything else is REAL and tested: the Spark plumbing (schemas,
batch shapes, partitioning, the UDF contract) AND the feature kernels
— vectorized bilinear resize, per-channel stats, gradient edge
density, luma histograms, frame-cadence sampling, RMS/ZCR/FFT-band
audio DSP — all plain numpy, operating on whatever the decode seam
yields.
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


def synthesize_png_media_df(spark, df: DataFrame,
                            key_col: str) -> DataFrame:
    """Media rows whose payloads are REAL PNGs (functions/png.py
    encoder): a deterministic (24, 16, 3) raster derived from the key
    — img[y, x, c] = (3x + 5y + 7c + 11·key) mod 256 — encoded with
    filter type key mod 5, so the decode path exercises every PNG
    filter. Downstream feature extraction genuinely decodes these."""
    from bleve_spark.functions.png import png_encode

    def gen(batches):
        for pdf in batches:
            keys = pdf[key_col].astype("int64")
            payloads = []
            for k in keys:
                k = int(k)
                y, x, c = np.meshgrid(
                    np.arange(24), np.arange(16), np.arange(3),
                    indexing="ij",
                )
                img = ((3 * x + 5 * y + 7 * c + 11 * k) % 256).astype(
                    np.uint8
                )
                payloads.append(png_encode(img, k % 5))
            yield pd.DataFrame({
                "key": keys,
                "media_type": ["image"] * len(keys),
                "payload": payloads,
                "width": [16] * len(keys),
                "height": [24] * len(keys),
                "duration_ms": [0] * len(keys),
            })

    return df.select(key_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Image decode: PNG payloads decode FOR REAL through the
    pure-stdlib codec (functions/png.py — zlib inflate + per-row
    unfilter, color types 0/2/4/6), normalized to an (H, W, 3) uint8
    raster. Non-PNG payloads (JPEG etc. would need PIL/cv2, absent in
    this container — remaining DECODE SEAM) deterministically expand
    into a full-shape raster (tiled sha256 stream) so every DOWNSTREAM
    kernel still operates on image-shaped data."""
    from bleve_spark.functions.png import is_png, png_decode

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and is_png(payload):
        img = png_decode(payload)
        c = img.shape[2]
        if c == 1:
            return np.repeat(img, 3, axis=2)
        if c == 2:  # gray + alpha: drop alpha, spread gray
            return np.repeat(img[:, :, :1], 3, axis=2)
        if c == 4:  # RGBA: drop alpha
            return np.ascontiguousarray(img[:, :, :3])
        return img
    h = max(int(height) or 8, 1)
    w = max(int(width) or 8, 1)
    need = h * w * 3
    stream = hashlib.sha256(payload[:64]).digest()
    reps = need // len(stream) + 1
    buf = (stream * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL vectorized bilinear resize (no imaging libs needed) —
    align-corners=False convention, float32 output."""
    h, w = img.shape[:2]
    arr = img.astype(np.float32)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
    top = arr[y0][:, x0] * (1 - wx) + arr[y0][:, x1] * wx
    bot = arr[y1][:, x0] * (1 - wx) + arr[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def image_stats(img: np.ndarray) -> np.ndarray:
    """REAL image statistics over an (H, W, 3) raster: per-channel
    mean/std, luma mean, gradient-magnitude edge density, and an
    8-bin luma histogram — 16 float32 features."""
    arr = img.astype(np.float32)
    means = arr.mean(axis=(0, 1)) / 255.0
    stds = arr.std(axis=(0, 1)) / 255.0
    luma = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
            + 0.114 * arr[..., 2]) / 255.0
    gy, gx = np.gradient(luma)
    edge = float(np.sqrt(gy * gy + gx * gx).mean())
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    hist = hist.astype(np.float32) / max(luma.size, 1)
    return np.concatenate(
        [means, stds, [luma.mean(), edge], hist]
    ).astype(np.float32)


def _sample_frames(payload: bytes, duration_ms: int, fps: float = 1.0,
                   width: int = 8, height: int = 8):
    """Frame sampling at a real cadence (min(8, ceil(dur·fps))
    frames); per-frame decode goes through the same decode seam."""
    n = max(1, int(duration_ms / 1000.0 * fps))
    n = min(n, 8)
    return [
        _decode_image(payload + bytes([i]), width, height)
        for i in range(n)
    ]


def _decode_audio(payload: bytes, duration_ms: int) -> np.ndarray:
    """DECODE SEAM — real codecs need soundfile/ffmpeg; swap for a
    proper PCM decode in production. Deterministic float32 waveform
    (zero-mean, derived from the payload stream) keeps the downstream
    DSP kernels real."""
    n = max(int((duration_ms or 1000) * 16), 256)  # 16 samples/ms
    n = min(n, 1 << 15)
    stream = hashlib.sha256(payload[:64]).digest()
    reps = n // len(stream) + 1
    buf = np.frombuffer((stream * reps)[:n], dtype=np.uint8)
    return (buf.astype(np.float32) - 127.5) / 127.5


def audio_stats(wave: np.ndarray) -> np.ndarray:
    """REAL DSP features: RMS, zero-crossing rate, and 8 log-energy
    FFT bands — 10 float32 features."""
    rms = float(np.sqrt(np.mean(wave * wave)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(wave)))))
    spec = np.abs(np.fft.rfft(wave)) ** 2
    bands = np.array_split(spec[1:], 8)
    energy = np.array(
        [np.log1p(b.mean()) if len(b) else 0.0 for b in bands],
        dtype=np.float32,
    )
    return np.concatenate([[rms, zcr], energy]).astype(np.float32)


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
                mt = row["media_type"]
                if mt == "video":
                    frames = _sample_frames(
                        payload, int(row["duration_ms"] or 0),
                        width=int(row["width"] or 8),
                        height=int(row["height"] or 8),
                    )
                    small = [
                        resize_bilinear(f, 32, 32) for f in frames
                    ]
                    arr = np.mean(
                        [image_stats(s) for s in small], axis=0
                    )
                elif mt == "audio":
                    arr = audio_stats(
                        _decode_audio(
                            payload, int(row["duration_ms"] or 0)
                        )
                    )
                else:
                    img = _decode_image(
                        payload, int(row["width"] or 0),
                        int(row["height"] or 0),
                    )
                    arr = image_stats(resize_bilinear(img, 32, 32))
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
