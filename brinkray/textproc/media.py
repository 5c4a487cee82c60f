"""Multimodal (binary-column) operators.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. Decode / resize / feature-extraction are actor-pool
map_batches stages: codec state is built ONCE per actor in __init__ and
the batch size is kept small because rows are megabyte-scale.

Codecs implemented here with stdlib + numpy only (no image/audio
libraries exist in this environment):

* **BMP** (24-bit uncompressed, the format every encoder can write) —
  full header parse + numpy pixel extraction, block-mean resize,
  channel-statistics features.
* **WAV** (PCM, stdlib ``wave``) — sample extraction, RMS /
  zero-crossing / FFT band-energy features.
* **video** (length-prefixed BMP frame container) — deterministic
  frame sampling (``frame_sample_plan``) + per-frame image decode,
  features averaged over sampled frames.

Compressed IMAGE formats (JPEG/PNG/WebP) decode through an
import-gated PIL slot in ``_decode_image`` — absent in this sandbox,
so they raise a clearly-marked NotImplementedError here, but the same
stage picks them up unmodified wherever PIL is installed (the slot is
pytest-proven via a stub). Compressed audio/video (MP3/MP4) still
need external codecs and stay NotImplementedError-gated.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "MediaDecoder",
    "decode_media",
    "frame_sample_plan",
    "encode_bmp",
    "encode_wav",
    "encode_video",
    "decode_bmp",
    "decode_wav",
]

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


try:  # optional dependency: absent in this sandbox, import-gated
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised via the stub test
    _PILImage = None


def _decode_image(payload: bytes) -> np.ndarray:
    """binary image payload -> (h, w, 3) uint8 RGB. BMP decodes on the
    numpy-only path (always available, deterministic); any other format
    (JPEG/PNG/WebP/...) decodes through PIL when the environment
    provides it — the import is gated, so the same stage works in a
    codec-less sandbox on BMP and picks up compressed formats the
    moment PIL is installed — and raises a clearly-marked
    NotImplementedError otherwise."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if _PILImage is not None:
        img = _PILImage.open(io.BytesIO(payload))
        return np.asarray(img.convert("RGB"), dtype=np.uint8)
    raise NotImplementedError(
        "compressed image formats need PIL (not present in this "
        "environment); BMP decodes on the built-in numpy path"
    )


# ---------------------------------------------------------------- codecs
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # BMP stores bottom-up
        rows.append(pixels[y, :, ::-1].tobytes() + pad)  # BGR order
    return header + dib + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB (numpy-only)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=off)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float [-1, 1] mono -> 16-bit PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float mono samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        raw = f.readframes(n)
        ch = f.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def encode_video(frames: list[np.ndarray], fps: float = 1.0) -> bytes:
    """Length-prefixed BMP-frame container: the deterministic 'video'
    format the sandbox can roundtrip without ffmpeg."""
    parts = [struct.pack("<4sIf", b"BMV1", len(frames), fps)]
    for fr in frames:
        b = encode_bmp(fr)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def _video_frames(payload: bytes):
    magic, n, fps = struct.unpack_from("<4sIf", payload, 0)
    if magic != b"BMV1":
        raise NotImplementedError("only the BMV1 frame container is decodable here")
    off = 12
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(payload[off : off + ln])
        off += ln
    return frames, fps


def block_mean_resize(img: np.ndarray, out_h: int = 8, out_w: int = 8) -> np.ndarray:
    """Block-mean downscale (h, w, c) -> (out_h, out_w, c), numpy-only."""
    h, w, c = img.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(int)
    xs = (np.arange(out_w + 1) * w // out_w).astype(int)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = img[ys[i] : max(ys[i + 1], ys[i] + 1),
                            xs[j] : max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
    return out


class MediaDecoder:
    """Actor-pool stage: ``map_batches(MediaDecoder, concurrency=N,
    batch_size=small, num_cpus=1)``. __init__ builds per-actor state
    (FFT window here; a real deployment loads PIL/ffmpeg the same
    way); __call__ decodes a batch and emits fixed-width features.

    ``deterministic_fake=True`` keeps the legacy hash-seeded path for
    plumbing tests and for payloads in formats this sandbox cannot
    decode."""

    FEATURE_DIM = 32

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        self._window = np.hanning(512)  # per-actor state, built once

    # -- per-kind feature extractors ------------------------------------
    def _image_features(self, payload: bytes) -> np.ndarray:
        img = _decode_image(payload)
        small = block_mean_resize(img, 3, 3) / 255.0  # 27 dims
        stats = np.array(
            [img.mean() / 255.0, img.std() / 255.0, img.shape[0], img.shape[1], 0.0]
        )
        return np.concatenate([small.ravel(), stats]).astype(np.float32)

    def _audio_features(self, payload: bytes) -> np.ndarray:
        x, rate = decode_wav(payload)
        if len(x) == 0:
            return np.zeros(self.FEATURE_DIM, dtype=np.float32)
        rms = float(np.sqrt((x**2).mean()))
        zc = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        seg = x[: len(self._window)]
        if len(seg) < len(self._window):
            seg = np.pad(seg, (0, len(self._window) - len(seg)))
        spec = np.abs(np.fft.rfft(seg * self._window))
        bands = np.array_split(spec, 28)
        band_e = np.array([float(b.mean()) for b in bands])
        feats = np.concatenate([[rms, zc, len(x) / rate, rate / 48000.0], band_e])
        return feats[: self.FEATURE_DIM].astype(np.float32)

    def _video_features(self, payload: bytes) -> np.ndarray:
        frames, fps = _video_frames(payload)
        duration_ms = int(len(frames) / max(fps, 1e-9) * 1000)
        plan = frame_sample_plan(duration_ms, fps=fps, max_frames=8)
        step = max(1, int(1000 / max(fps, 1e-9)))
        picked = [frames[min(t // step, len(frames) - 1)] for t in plan] or frames[:1]
        per_frame = np.stack([self._image_features(f) for f in picked])
        return per_frame.mean(axis=0).astype(np.float32)

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(digest, "big"))
        return rng.standard_normal(self.FEATURE_DIM).astype(np.float32)

    def _features(self, kind: str, payload: bytes) -> np.ndarray:
        if self.fake:
            return self._fake_features(payload)
        if kind == "image":
            f = self._image_features(payload)
        elif kind == "audio":
            f = self._audio_features(payload)
        elif kind == "video":
            f = self._video_features(payload)
        else:
            raise NotImplementedError(f"unknown media kind {kind!r}")
        out = np.zeros(self.FEATURE_DIM, dtype=np.float32)
        out[: len(f)] = f[: self.FEATURE_DIM]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        feats = [
            self._features(k, p)
            for k, p in zip(kinds, batch["payload"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def decode_media(ds, concurrency: int = 2, batch_size: int = 16, fake: bool = False):
    """The canonical multimodal stage shape: small batches (rows are
    large), actor pool (codec/FFT state built once per actor)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"deterministic_fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_plan(duration_ms: int, fps: float = 1.0, max_frames: int = 32) -> list[int]:
    """Deterministic frame-sampling timestamps for a video payload —
    the planning half of video decode (codec-independent)."""
    if duration_ms <= 0:
        return []
    step = int(1000 / fps)
    ts = list(range(0, duration_ms, step))[:max_frames]
    return ts
