"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; all
transforms are Arrow-batched `mapInPandas` so executors stream batches
without materializing whole partitions. Decoding has two paths:

- ``fake=True`` (default): a deterministic content-derived stand-in —
  the oracle path (value-checkable, no codec dependencies). The
  Spark-side plumbing (schema, batching, partitioning, fan-out caps)
  is identical to the real path.
- ``fake=False``: REAL decoding via optional libraries resolved at call
  time — PIL for images (`extract_features`, `resize_images`), the
  ffmpeg binary for video (`sample_frames`). When the dependency is
  absent the call raises NotImplementedError with the exact missing
  piece, never silently degrading to the fake.
"""

from __future__ import annotations

import hashlib
import importlib.util
import shutil
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "doc_id long, media_type string, feature array<float>, feat_dim int"


def has_pil() -> bool:
    return importlib.util.find_spec("PIL") is not None


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from
    a sha256 stream of the payload bytes."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _real_decode_image(payload: bytes, dim: int) -> np.ndarray:
    """PIL decode -> grayscale -> 1 x dim strip -> [0,1] floats.
    Deterministic (fixed resample kernel, no randomness)."""
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(payload)).convert("L").resize((dim, 1), Image.BILINEAR)
    return (np.asarray(img, dtype=np.float32).reshape(-1) / 255.0)[:dim]


def extract_features(
    media: DataFrame, dim: int = 64, fake: bool = True
) -> DataFrame:
    """binary payload -> feature vector, one Arrow batch at a time.

    ``fake=False`` decodes image payloads with PIL (grayscale pixel
    strip); non-image media types in real mode raise per-batch (no
    silent fake fallback). Batch shape, schema and partitioning are
    identical on both paths.
    """
    if not fake and not has_pil():
        raise NotImplementedError(
            "real media decoding requires Pillow (PIL), which is not "
            "installed in this environment; pass fake=True for the "
            "deterministic stub"
        )
    from gopensearch_spark.util import ensure_parallelism

    media = ensure_parallelism(media)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_decode(p if p is not None else b"", dim).tolist()
                    for p in pdf["payload"]
                ]
            else:
                feats = []
                for mt, p in zip(pdf["media_type"], pdf["payload"]):
                    if not str(mt).startswith("image"):
                        raise ValueError(
                            f"real decode implemented for image/* media, got {mt!r}"
                        )
                    feats.append(_real_decode_image(p or b"", dim).tolist())
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
    output rows mid-pipeline). The real path shells out to the ffmpeg
    binary per batch (tempfile in, image2pipe out); the stub emits
    deterministic content-derived frame bytes with the REAL row
    fan-out, schema and timestamps, so the Spark-side shape is
    exercised end-to-end either way.
    """
    if not fake and not has_ffmpeg():
        raise NotImplementedError(
            "real frame sampling requires the ffmpeg binary on PATH "
            "(not present in this environment); pass fake=True for the "
            "deterministic stub"
        )

    def frames_of(payload: bytes, dur: int) -> list[tuple[int, int, bytes]]:
        # sample at i*every_ms STRICTLY before end-of-media
        # (n = ceil(dur/every_ms)): a dur that is an exact multiple of
        # every_ms must not emit a frame AT dur.
        n = min(max_frames, -(-dur // every_ms)) if dur > 0 else 0
        if fake:
            out = []
            for i in range(n):
                ts = i * every_ms  # python int: no int32 overflow
                h = hashlib.sha256((payload or b"") + ts.to_bytes(8, "big")).digest()
                out.append((i, ts, h))
            return out
        return _ffmpeg_sample(payload, [i * every_ms for i in range(n)])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # a NULL duration arrives as NaN (Arrow nullable int ->
                # pandas float), not None
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                for i, ts, fr in frames_of(payload, dur):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(fr)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.Series(idxs, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int64"), "frame": frames}
            )

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


def _ffmpeg_sample(payload: bytes, ts_list: list[int]) -> list[tuple[int, int, bytes]]:
    """Real frame extraction: write the container bytes to a tempfile,
    seek ffmpeg to each timestamp, read one PNG frame from stdout."""
    import subprocess
    import tempfile

    out: list[tuple[int, int, bytes]] = []
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(payload or b"")
        f.flush()
        for i, ts in enumerate(ts_list):
            r = subprocess.run(
                ["ffmpeg", "-v", "error", "-ss", f"{ts / 1000.0:.3f}", "-i", f.name,
                 "-frames:v", "1", "-f", "image2pipe", "-vcodec", "png", "-"],
                capture_output=True,
            )
            if r.returncode != 0:
                raise ValueError(
                    f"ffmpeg failed at ts={ts}ms: {r.stderr.decode(errors='replace')[:200]}"
                )
            out.append((i, ts, r.stdout))
    return out


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize: ``fake=True`` passes the payload through with
    updated dims metadata; ``fake=False`` decodes with PIL, resizes
    (bilinear), and re-encodes as PNG."""
    if not fake and not has_pil():
        raise NotImplementedError(
            "real resize requires Pillow (PIL), which is not installed "
            "in this environment; pass fake=True for the metadata stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            if not fake:
                from io import BytesIO

                from PIL import Image

                payloads = []
                for p in pdf["payload"]:
                    img = Image.open(BytesIO(p or b"")).resize(
                        (width, height), Image.BILINEAR
                    )
                    buf = BytesIO()
                    img.save(buf, format="PNG")
                    payloads.append(buf.getvalue())
                out["payload"] = payloads
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)
