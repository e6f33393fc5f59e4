"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; all
transforms are Arrow-batched `mapInPandas` so executors stream batches
without materializing whole partitions. The actual media decode is
STUBBED (no image/audio libs in this container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
content-derived fake is produced — the Spark-side plumbing (schema,
batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "doc_id long, media_type string, feature array<float>, feat_dim int"


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from
    a sha256 stream of the payload bytes."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 64, fake: bool = True
) -> DataFrame:
    """binary payload -> feature vector, one Arrow batch at a time.

    Real decoders (PIL/librosa/ffmpeg) slot into `_decode` below; the
    batch shape, schema and partitioning do not change.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    from gopensearch_spark.util import ensure_parallelism

    media = ensure_parallelism(media)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize stub: passthrough payload with updated dims metadata
    (a real implementation decodes/resizes/re-encodes per batch)."""
    if not fake:
        raise NotImplementedError("real resize needs an image library; use fake=True")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)
