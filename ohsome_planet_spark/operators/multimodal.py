"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
mapInPandas kernels — while the actual codec work is stubbed behind
DECODERS (this container has no image/audio libraries). On a real cluster
the stub is replaced by PIL/torchaudio/decord calls with the same
(bytes → features) signature; nothing else changes.

Deterministic fake decode: features derived from the byte content (length,
checksum-seeded pseudo-stats) so tests are exact and re-runs reproducible.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, "
    "features array<float>, decoded boolean"
)


def make_media_df(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payloads with typed metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=128 + (i * 37) % 512, dtype=np.uint8).tobytes()
        meta = {
            "width": 64 + i % 256 if kind != "audio" else None,
            "height": 48 + i % 128 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 13 if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(kind: str, content: bytes, dim: int) -> np.ndarray:
    """STUB decode: deterministic feature vector from payload bytes.

    Replace with a real decoder (PIL.Image.open → resize → pixel stats,
    torchaudio.load → spectrogram stats, ...) in deployment. Raises
    NotImplementedError for unknown kinds — the real/fake split is explicit.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_features(media: DataFrame, dim: int = 16, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    The kernel sees Arrow batches of (media_id, kind, content); per batch it
    decodes vectorized-per-row (codecs are inherently per-item) and emits a
    compact feature frame. Binary payloads never shuffle after this stage —
    only the small feature rows do.
    """

    def extract(batches):
        for pdf in batches:
            feats = []
            for row in pdf.itertuples():
                content = bytes(row.content)
                vec = _fake_decode(row.kind, content, dim)
                feats.append(
                    (
                        int(row.media_id),
                        row.kind,
                        len(content),
                        zlib.crc32(content),
                        [float(x) for x in vec],
                        True,
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=["media_id", "kind", "n_bytes", "checksum", "features", "decoded"],
            )

    return media.select("media_id", "kind", "content").mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (JVM-side sequence — the decode itself is the stub above)."""
    video = media.where(F.col("kind") == "video")
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    )
    return video.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )
