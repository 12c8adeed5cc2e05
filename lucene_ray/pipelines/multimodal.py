"""Multimodal (opaque binary) column operators.

Media payloads (image/audio/video) are opaque ``binary`` columns with typed
metadata travelling alongside. REAL pure-stdlib codecs cover PCM WAV audio
(``wave``), PNG (zlib/struct — all five scanline filters, gray/RGB/RGBA/
palette at 8-bit), 24-bit BMP, and uncompressed AVI video (RIFF demux of
'00db' DIB frame chunks + per-frame 24-bit decode); payloads outside those
formats fall back to a deterministic fake (flagged by the ``decoded``
column) so pipelines stay end-to-end runnable without external media
libraries. Compressed video codecs (H.264 etc.) remain env-blocked.

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal 8-bit PNG encoder (stdlib zlib): grayscale (HxW), RGB
    (HxWx3) or RGBA (HxWx4) uint8, filter 0 scanlines, one IDAT. Used to
    synthesize real image payloads for tests/benchmarks — no image libs
    exist in this environment."""
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else int(arr.shape[2])
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes):
    """REAL pure-stdlib PNG decode -> (width, height, channels,
    uint8[h, w, c]) or None when not decodable here.

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette ->
    RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline
    filters (spec §6: None/Sub/Up/Average/Paeth). CRC-checked chunks.
    Adam7 interlace and 1/2/4/16-bit depths return None (documented
    unsupported subset). Filters Sub/Average/Paeth carry a sequential
    dependency along the scanline — decoded with a per-byte loop; None/Up
    are vectorized. Small images only travel this path (feature-extract
    stages), so the loop is not a hot-path concern."""
    import struct
    import zlib

    if len(blob) < 8 or blob[:8] != PNG_SIG:
        return None
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    try:
        while pos + 8 <= len(blob):
            (length,) = struct.unpack_from(">I", blob, pos)
            tag = blob[pos + 4 : pos + 8]
            data = blob[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
            if zlib.crc32(tag + data) != crc:
                return None
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif tag == b"PLTE":
                palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None:
            return None
        w, h, depth, ctype, comp, filt, interlace = ihdr
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
        if nch is None or (ctype == 3 and palette is None):
            return None
        raw = zlib.decompress(bytes(idat))
    except Exception:
        return None
    stride = w * nch
    if len(raw) != h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        )
        if ft == 0:
            cur = line.copy()
        elif ft == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256, per spec
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = np.empty(stride, dtype=np.uint8)
            li = line.tolist()
            pv = prev.tolist()
            cu = [0] * stride
            for i in range(stride):
                a = cu[i - nch] if i >= nch else 0
                if ft == 1:
                    v = li[i] + a
                elif ft == 3:
                    v = li[i] + ((a + pv[i]) >> 1)
                else:
                    b = pv[i]
                    c = pv[i - nch] if i >= nch else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (
                        b if pb <= pc else c
                    )
                    v = li[i] + pred
                cu[i] = v & 0xFF
            cur[:] = cu
        else:
            return None
        out[r] = cur
        prev = out[r]
    px = out.reshape(h, w, nch)
    if ctype == 3:
        px = palette[px[:, :, 0]]
        nch = 3
    return int(w), int(h), int(nch), px


def decode_bmp(blob: bytes):
    """REAL pure-stdlib BMP decode -> (width, height, 3, uint8[h, w, 3])
    or None. Uncompressed 24-bit BI_RGB, BITMAPINFOHEADER (>= 40 bytes),
    bottom-up or top-down rows, 4-byte row padding, BGR -> RGB."""
    import struct

    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    try:
        (data_off,) = struct.unpack_from("<I", blob, 10)
        (hdr_size,) = struct.unpack_from("<I", blob, 14)
        if hdr_size < 40:
            return None
        w, h = struct.unpack_from("<ii", blob, 18)
        (bpp,) = struct.unpack_from("<H", blob, 28)
        (compression,) = struct.unpack_from("<I", blob, 30)
    except struct.error:
        return None
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    if data_off + stride * h > len(blob):
        return None
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return int(w), int(h), 3, rows[:, :, ::-1]  # BGR -> RGB


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

    def _decode_stdlib(self, blob: bytes):
        """REAL path without external libs: PNG (zlib/struct) and 24-bit
        BMP payloads decode to pixels here; feature = per-channel means
        (the same semantics as the PIL branch)."""
        dec = None
        if blob[:8] == PNG_SIG:
            dec = decode_png(blob)
        elif blob[:2] == b"BM":
            dec = decode_bmp(blob)
        if dec is None:
            return None
        w, h, nch, px = dec
        feat = px.astype(np.float32).mean(axis=(0, 1)).ravel()[
            : self.FEATURE_DIM
        ]
        return w, h, np.pad(feat, (0, self.FEATURE_DIM - len(feat)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs: List[bytes] = [
            bytes(b or b"") for b in batch.column(self.payload_col).to_pylist()
        ]
        widths: List[int] = []
        heights: List[int] = []
        feats: List[np.ndarray] = []
        decoded: List[bool] = []
        for blob in blobs:
            real = (
                self._decode_real(blob)
                if self.have_codec
                else self._decode_stdlib(blob)
            )
            if real is not None:
                w, h, f = real
                decoded.append(True)
            elif self.fake:
                w, h, f = self._decode_fake(blob)
                decoded.append(False)
            else:
                raise NotImplementedError(
                    "payload is not a decodable PNG/BMP and fake_features "
                    "is off (no general image codec in this environment)"
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
        out_cols["decoded"] = pa.array(decoded, pa.bool_())
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


def encode_avi(frames: List[np.ndarray], fps: int = 25) -> bytes:
    """Minimal uncompressed AVI writer (pure stdlib struct): RIFF 'AVI '
    with one 'vids'/'DIB ' stream of 24-bit BI_RGB frames ('00db' chunks,
    bottom-up BGR rows, 4-byte-padded stride — the standard DIB layout)
    plus an idx1 index. Synthesizes real video payloads for tests and
    benchmarks; no media libraries exist in this environment."""
    import struct

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    size_image = stride * h

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    frame_blobs = []
    for fr in frames:
        arr = np.ascontiguousarray(fr, dtype=np.uint8)
        if arr.ndim != 3 or arr.shape != (h, w, 3):
            raise ValueError("all frames must share one HxWx3 shape")
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        frame_blobs.append(padded.tobytes())

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, size_image * fps, 0, 0x10,  # usec/frame, rate, pad, HASINDEX
        len(frames), 0, 1, size_image, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        size_image, -1, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", fb) for fb in frame_blobs)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx_entries, off = [], 4
    for fb in frame_blobs:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(fb)))
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"AVI "


def demux_avi(blob: bytes):
    """REAL pure-stdlib AVI demux -> (width, height, [(data_off, size)])
    for each video frame chunk ('##db'/'##dc' of stream 0 inside the
    'movi' list), or None when the payload is not parseable AVI. Only
    the RIFF walk happens here — frames decode lazily per sampled index
    (decode_avi_frame), so a demux touches header bytes, never the whole
    payload."""
    import struct

    if not is_avi(blob):
        return None
    w = h = None
    frames: List[tuple] = []

    def walk(lo: int, hi: int, in_movi: bool) -> bool:
        nonlocal w, h
        pos = lo
        while pos + 8 <= hi:
            tag = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            data_off = pos + 8
            if data_off + size > hi:
                return False
            if tag == b"LIST" and size >= 4:
                kind = blob[data_off : data_off + 4]
                if not walk(data_off + 4, data_off + size,
                            in_movi or kind == b"movi"):
                    return False
            elif tag == b"avih" and size >= 40:
                vals = struct.unpack_from("<10I", blob, data_off)
                w, h = int(vals[8]), int(vals[9])
            elif in_movi and tag[:2] == b"00" and tag[2:4] in (b"db", b"dc"):
                frames.append((data_off, int(size)))
            pos = data_off + size + (size % 2)
        return True

    try:
        # clamp to the ACTUAL buffer: a truncated payload must not yield
        # chunk extents past the end just because the declared RIFF size
        # still covers them (decode would read short data silently)
        declared_end = 8 + struct.unpack_from("<I", blob, 4)[0]
        if not walk(12, min(declared_end, len(blob)), False):
            return None
    except struct.error:
        return None
    if w is None or h is None or w <= 0 or h <= 0:
        return None
    return w, h, frames


def decode_avi_frame(blob: bytes, data_off: int, size: int, w: int, h: int):
    """Decode one demuxed '00db' DIB frame -> uint8[h, w, 3] RGB, or None
    when the chunk size does not match the 24-bit padded-stride layout."""
    stride = ((w * 3 + 3) // 4) * 4
    if size != stride * h or data_off + size > len(blob):
        return None
    rows = np.frombuffer(blob, dtype=np.uint8, count=size, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB


class FrameSampleStage:
    """Row-expanding stage: one binary "video" payload -> ``n_frames``
    evenly-spaced frame rows (doc_id, frame_idx, frame_off, frame_bytes,
    digest, decoded). AVI payloads take the REAL path: the pure-stdlib
    RIFF demuxer (demux_avi) locates the actual '00db' frame chunks and
    the sampled rows carry the true chunk offsets/sizes/digests
    (decoded=True); other payloads fall back to deterministic even byte
    slices (decoded=False) — same schema, same row expansion, same
    memory profile (output rows carry a SLICE reference, never the whole
    payload), so downstream embed/filter stages are end-to-end testable
    either way. This is the canonical frame-sampling shape for a 100 TB
    video corpus: small ``batch_size`` (payloads dominate block memory),
    payload dropped after slicing."""

    def __init__(self, payload_col: str = "payload", n_frames: int = 4):
        self.payload_col = payload_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": [], "frame_idx": [], "frame_off": [],
            "frame_bytes": [], "digest": [], "decoded": [],
        }
        ids = batch.column("doc_id").to_pylist()
        for did, blob in zip(ids, batch.column(self.payload_col).to_pylist()):
            b = bytes(blob or b"")
            demux = demux_avi(b)
            if demux is not None and demux[2]:
                _, _, chunks = demux
                nf = len(chunks)
                for i in range(self.n_frames):
                    off, size = chunks[i * nf // self.n_frames]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_bytes"].append(size)
                    out["digest"].append(
                        hashlib.md5(b[off : off + size]).hexdigest()
                    )
                    out["decoded"].append(True)
                continue
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
                out["decoded"].append(False)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame_off": pa.array(out["frame_off"], pa.int64()),
                "frame_bytes": pa.array(out["frame_bytes"], pa.int64()),
                "digest": pa.array(out["digest"], pa.string()),
                "decoded": pa.array(out["decoded"], pa.bool_()),
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
