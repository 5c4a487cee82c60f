"""Multimodal (binary-column) stage plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. Decode / resize / feature-extraction are actor-pool
map_batches stages: the codec is loaded ONCE per actor in __init__ and
the batch size is kept small because rows are megabyte-scale.

The decode codecs themselves are STUBBED here (no image/audio libraries
in this environment): ``DecodeStub`` raises unless
``deterministic_fake=True``, in which case it produces a seeded fake
feature vector from the payload hash — which keeps the Ray-side
plumbing (schema, actor signature, batch sizing, output layout) real
and testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "MediaDecoder", "decode_media", "frame_sample_plan"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class MediaDecoder:
    """Actor-pool stage: ``map_batches(MediaDecoder, concurrency=N,
    batch_size=small, num_cpus=1)``.

    Real deployment: __init__ loads the codec (PIL/ffmpeg/torchaudio);
    __call__ decodes and emits fixed-width feature vectors.
    """

    FEATURE_DIM = 32

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        if not deterministic_fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct with deterministic_fake=True for plumbing tests"
            )

    def _features(self, payload: bytes) -> np.ndarray:
        # seeded fake: feature vector derived from the payload digest —
        # stable across runs and processes
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(digest, "big"))
        return rng.standard_normal(self.FEATURE_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def decode_media(ds, concurrency: int = 2, batch_size: int = 16):
    """The canonical multimodal stage shape: small batches (rows are
    large), actor pool (codec loaded once per actor)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"deterministic_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_plan(duration_ms: int, fps: float = 1.0, max_frames: int = 32) -> list[int]:
    """Deterministic frame-sampling timestamps for a video payload —
    the part of video decode that is pure planning (no codec)."""
    if duration_ms <= 0:
        return []
    step = int(1000 / fps)
    ts = list(range(0, duration_ms, step))[:max_frames]
    return ts
