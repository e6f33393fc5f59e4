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


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one row per sampled frame at ``every_ms``
    spacing, capped at ``max_frames`` per document (the cap bounds the
    fan-out: a 10-hour video cannot explode one input row into 36k
    output rows mid-pipeline). A real implementation seeks/decodes via
    ffmpeg per batch; the stub emits deterministic content-derived frame
    bytes with the REAL row fan-out, schema and timestamps, so the
    Spark-side shape is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError("real frame sampling needs ffmpeg; use fake=True")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # a NULL duration arrives as NaN (Arrow nullable int ->
                # pandas float), not None
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                # sample at i*every_ms STRICTLY before end-of-media
                # (n = ceil(dur/every_ms)): a dur that is an exact
                # multiple of every_ms must not emit a frame AT dur.
                n = min(max_frames, -(-dur // every_ms)) if dur > 0 else 0
                for i in range(n):
                    ts = i * every_ms  # python int: no int32 overflow at
                    #                    large every_ms * max_frames
                    h = hashlib.sha256((payload or b"") + ts.to_bytes(8, "big")).digest()
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.Series(idxs, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int64"), "frame": frames}
            )

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


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
