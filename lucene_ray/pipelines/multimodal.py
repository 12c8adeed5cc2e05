"""Multimodal (opaque binary) column operators.

Media payloads (image/audio/video) are opaque ``binary`` columns with typed
metadata travelling alongside. The Ray-side plumbing — schema, actor-pool
signature, batch sizing, output layout — is real and tested; the actual
codec call is stubbed behind an import-try (no image/audio libs in this
container) with a deterministic fake so pipelines are end-to-end runnable.

Scale notes: binary payloads dominate block memory, so decode stages run
with a small ``batch_size`` and drop the payload column as soon as features
are extracted (the same wide-row rule as ``html`` in the index build,
SURVEY.md §7.5.6).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data

try:  # pragma: no cover - PIL is absent in the target container
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def media_meta_batch(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    """Cheap typed metadata for an opaque binary column: byte length, a
    magic-prefix sniff, and a stable content digest (vectorized where the
    Arrow kernels exist)."""
    import pyarrow.compute as pc

    payload = batch.column(payload_col)
    n_bytes = pc.binary_length(payload)
    blobs = payload.to_pylist()
    is_html = [bool(b) and bytes(b).lstrip()[:1] == b"<" for b in blobs]
    digest = [hashlib.md5(bytes(b or b"")).hexdigest() for b in blobs]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bytes": n_bytes.cast(pa.int64()),
            "is_markup": pa.array(is_html, pa.bool_()),
            "digest": pa.array(digest, pa.string()),
        }
    )


class ImageDecodeStage:
    """Actor-pool stage: binary image -> (width, height, feature vector).

    With a real codec available the decode happens here (loaded once per
    actor in ``__init__``); without one, ``fake_features=True`` derives a
    deterministic 8-float feature from the payload bytes so downstream
    stages (resize, embed, filter) are testable end-to-end. Set
    ``fake_features=False`` to fail loudly instead.
    """

    FEATURE_DIM = 8

    def __init__(self, payload_col: str = "payload", fake_features: bool = True):
        self.payload_col = payload_col
        self.fake = fake_features
        self.have_codec = _HAVE_PIL

    def _decode_real(self, blob: bytes):  # pragma: no cover
        import io

        img = Image.open(io.BytesIO(blob))
        arr = np.asarray(img, dtype=np.float32)
        feat = arr.mean(axis=(0, 1)).ravel()[: self.FEATURE_DIM]
        return img.width, img.height, np.pad(feat, (0, self.FEATURE_DIM - len(feat)))

    def _decode_fake(self, blob: bytes):
        h = hashlib.blake2b(blob, digest_size=self.FEATURE_DIM * 4).digest()
        feat = (
            np.frombuffer(h, dtype=np.uint32).astype(np.float32)
            / np.float32(2**32)
        )
        return len(blob) % 1024, len(blob) // 1024 + 1, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs: List[bytes] = [
            bytes(b or b"") for b in batch.column(self.payload_col).to_pylist()
        ]
        widths: List[int] = []
        heights: List[int] = []
        feats: List[np.ndarray] = []
        for blob in blobs:
            if self.have_codec:
                w, h, f = self._decode_real(blob)
            elif self.fake:
                w, h, f = self._decode_fake(blob)
            else:
                raise NotImplementedError(
                    "no image codec in this environment; pass fake_features=True "
                    "or install PIL"
                )
            widths.append(int(w))
            heights.append(int(h))
            feats.append(np.asarray(f, dtype=np.float32))
        out_cols = {
            name: batch.column(name)
            for name in batch.schema.names
            if name != self.payload_col  # drop the wide payload immediately
        }
        out_cols["width"] = pa.array(widths, pa.int32())
        out_cols["height"] = pa.array(heights, pa.int32())
        out_cols["features"] = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32())
        )
        return pa.table(out_cols)


def decode_images(
    ds: "ray.data.Dataset",
    payload_col: str = "payload",
    concurrency: int = 4,
    batch_size: int = 64,  # small: payloads are wide
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_args=(payload_col,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Row-expanding stage: one binary "video" payload -> ``n_frames``
    evenly-spaced frame rows (doc_id, frame_idx, frame_off, frame_bytes,
    digest). A real container demuxer would seek keyframes here (loaded
    once per actor); without one the deterministic fallback slices the
    payload into even byte ranges — same schema, same row expansion, same
    memory profile (output rows carry a SLICE, never the whole payload),
    so downstream embed/filter stages are end-to-end testable. This is the
    canonical frame-sampling shape for a 100 TB video corpus: small
    ``batch_size`` (payloads dominate block memory), payload dropped after
    slicing."""

    def __init__(self, payload_col: str = "payload", n_frames: int = 4):
        self.payload_col = payload_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": [], "frame_idx": [], "frame_off": [],
            "frame_bytes": [], "digest": [],
        }
        ids = batch.column("doc_id").to_pylist()
        for did, blob in zip(ids, batch.column(self.payload_col).to_pylist()):
            b = bytes(blob or b"")
            n = len(b)
            for i in range(self.n_frames):
                lo = i * n // self.n_frames
                hi = (i + 1) * n // self.n_frames
                frame = b[lo:hi]
                out["doc_id"].append(did)
                out["frame_idx"].append(i)
                out["frame_off"].append(lo)
                out["frame_bytes"].append(hi - lo)
                out["digest"].append(hashlib.md5(frame).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame_off": pa.array(out["frame_off"], pa.int64()),
                "frame_bytes": pa.array(out["frame_bytes"], pa.int64()),
                "digest": pa.array(out["digest"], pa.string()),
            }
        )


def sample_frames(
    ds: "ray.data.Dataset",
    payload_col: str = "payload",
    n_frames: int = 4,
    concurrency: int = 4,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(payload_col, n_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_wav(blob: bytes):
    """REAL codec path (round 3): PCM WAV decode via the stdlib ``wave``
    module -> (sample_rate, float32 mono samples in [-1, 1]) or None when
    the payload is not a decodable RIFF/WAVE. 8/16/32-bit PCM; channels
    are mean-downmixed."""
    import io
    import wave

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(blob)) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2**31
    else:
        return None
    if ch > 1 and len(arr) % ch == 0:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return sr, arr


class AudioFeatureStage:
    """Binary "audio" payload -> fixed-dim windowed features (one row per
    payload, features = list<float> of ``dim`` values, plus sample_rate /
    n_samples / decoded metadata).

    PCM WAV payloads take the REAL path: stdlib ``wave`` decode (no
    external codecs needed) then per-window RMS energy — a genuine
    audio-quality feature a 100 TB speech pipeline filters on. Anything
    else falls back to the deterministic byte-window hash so the
    schema/batch plumbing and the feature-vector contract (usable by
    knn/hnsw pipelines directly) stay end-to-end testable."""

    FEATURE_DIM = 16

    def __init__(self, payload_col: str = "payload", dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.dim = dim

    def _features_real(self, samples: np.ndarray) -> np.ndarray:
        n = max(len(samples), 1)
        vals = np.empty(self.dim, dtype=np.float32)
        for i in range(self.dim):
            w = samples[i * n // self.dim : (i + 1) * n // self.dim]
            vals[i] = (
                np.sqrt(np.mean(w.astype(np.float64) ** 2))
                if len(w)
                else 0.0
            )
        return vals

    def _features_fake(self, b: bytes) -> np.ndarray:
        n = max(len(b), 1)
        vals = np.empty(self.dim, dtype=np.float32)
        for i in range(self.dim):
            w = b[i * n // self.dim : (i + 1) * n // self.dim]
            h = hashlib.blake2b(w, digest_size=4).digest()
            vals[i] = int.from_bytes(h, "big") / 2**32
        return vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: List[np.ndarray] = []
        srs: List[int] = []
        nsamp: List[int] = []
        decoded: List[bool] = []
        for blob in batch.column(self.payload_col).to_pylist():
            b = bytes(blob or b"")
            wav = decode_wav(b)
            if wav is not None:
                sr, samples = wav
                feats.append(self._features_real(samples))
                srs.append(int(sr))
                nsamp.append(len(samples))
                decoded.append(True)
            else:
                feats.append(self._features_fake(b))
                srs.append(0)
                nsamp.append(0)
                decoded.append(False)
        out_cols = {
            name: batch.column(name)
            for name in batch.schema.names
            if name != self.payload_col
        }
        out_cols["features"] = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32())
        )
        out_cols["sample_rate"] = pa.array(srs, pa.int32())
        out_cols["n_samples"] = pa.array(nsamp, pa.int64())
        out_cols["decoded"] = pa.array(decoded, pa.bool_())
        return pa.table(out_cols)
