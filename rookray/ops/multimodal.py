"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool decode/feature stages.

The image/audio/video codec libraries are NOT in this container, so the
actual decode is stubbed two ways (clearly marked):

* ``strict=True``  → ``NotImplementedError`` at the decode call — the
  production integration point (swap in PIL/torchaudio/pyav there);
* ``strict=False`` → a deterministic fake decoder (byte-histogram
  features, hash-derived "dimensions"), so the Ray-side plumbing —
  schema, small batch sizes for large payloads, actor signature,
  output layout — is real and tested end-to-end.

Scale notes encoded here: binary payloads dominate bytes, so stages use
small ``batch_size`` and ``batch_format="pyarrow"`` (binary columns do
not round-trip pandas well); feature extraction state (the "model")
loads once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),     # opaque encoded bytes
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("width", pa.int32()),        # metadata (nullable, type-dependent)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeFeatures:
    """Actor-pool stage: payload bytes → fixed-size feature vector.

    ``__init__`` is the once-per-actor model-load point; ``__call__``
    is vectorized over the batch's binary column."""

    FEATURE_DIM = 64

    def __init__(self, strict: bool = False):
        self.strict = strict
        # once-per-actor "model": projection of the byte histogram
        rng = np.random.RandomState(7)
        self.projection = rng.standard_normal((256, self.FEATURE_DIM)).astype(np.float32)

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.strict:
            # PRODUCTION INTEGRATION POINT — no codec libs in this
            # container; plug PIL.Image.open / soundfile / pyav here.
            raise NotImplementedError("media decode requires codec libraries")
        counts = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
        return counts.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hists = np.stack([self._decode(p or b"") for p in payloads])
        norm = hists.sum(axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        feats = (hists / norm) @ self.projection
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "features": pa.array(list(feats), pa.list_(pa.float32())),
                "payload_bytes": pc.binary_length(batch.column("payload")),
            }
        )


class ResizeStub:
    """Image-resize stage stub: validates plumbing (metadata rewrite +
    payload passthrough); the real resample goes where marked."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image resize requires codec libraries")
        n = len(batch)
        # DETERMINISTIC FAKE: payload unchanged, metadata rewritten
        return (
            batch.set_column(batch.column_names.index("width"), "width",
                             pa.array(np.full(n, self.w, np.int32)))
            .set_column(batch.column_names.index("height"), "height",
                        pa.array(np.full(n, self.h, np.int32)))
        )


class FrameSampleStub:
    """Video frame-sampling stage stub: emits one row per sampled frame
    (flat-map shape) with deterministic fake frame payloads."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms, self.strict = every_ms, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("frame sampling requires codec libraries")
        ids, frames, ts = [], [], []
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            for t in range(0, max(dur or 0, 1), self.every_ms):
                ids.append(mid)
                ts.append(t)
                # fake frame: a slice of the payload keyed by timestamp
                off = t % max(1, len(payload or b"\0"))
                frames.append((payload or b"\0")[off:off + 16])
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "frame_ms": pa.array(ts, pa.int32()),
             "frame": pa.array(frames, pa.binary())}
        )


def media_from_documents(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Synthesize a media table from the documents table (text bytes as
    the opaque payload) — test/bench substrate, deterministic."""

    def to_media(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        payload = pc.cast(text, pa.binary())
        n = len(batch)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "payload": payload,
                "media_type": pa.array(
                    np.where(doc % 3 == 0, "image",
                             np.where(doc % 3 == 1, "audio", "video")).astype(object),
                    pa.string()),
                "width": pa.array((doc % 640 + 32).astype(np.int32)),
                "height": pa.array((doc % 480 + 32).astype(np.int32)),
                "duration_ms": pa.array((doc % 5000 + 100).astype(np.int32)),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def decode_features(media: "ray.data.Dataset", concurrency: int = 4,
                    strict: bool = False) -> "ray.data.Dataset":
    return media.map_batches(
        DecodeFeatures, fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow", batch_size=512,  # small: payloads are large
        concurrency=(1, concurrency),
    )
