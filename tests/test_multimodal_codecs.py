"""Pure-stdlib image codecs (pipelines/multimodal.py): PNG encode/decode
roundtrip across color types and all five scanline filters, 24-bit BMP,
and the ImageDecodeStage real path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.pipelines.multimodal import (
    PNG_SIG,
    decode_bmp,
    decode_png,
    encode_png,
)


def _rng_img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape", [(5, 7), (5, 7, 3), (5, 7, 4), (1, 1, 3), (16, 3)]
)
def test_png_roundtrip(shape):
    img = _rng_img(shape, sum(shape))
    w, h, nch, px = decode_png(encode_png(img))
    assert (w, h) == (shape[1], shape[0])
    want = img if img.ndim == 3 else img[:, :, None]
    assert nch == want.shape[2]
    assert np.array_equal(px, want)


def _png_with_filters(img: np.ndarray, filters) -> bytes:
    """Hand-encode RGB rows with the GIVEN per-row filter types."""
    h, w, nch = img.shape
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int64)
    for r, ft in zip(range(h), filters):
        line = img[r].ravel().astype(np.int64)
        out = np.empty(w * nch, dtype=np.int64)
        for i in range(w * nch):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            out[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_all_filters_decode():
    img = _rng_img((5, 6, 3), 99)
    blob = _png_with_filters(img, [0, 1, 2, 3, 4])
    w, h, nch, px = decode_png(blob)
    assert (w, h, nch) == (6, 5, 3)
    assert np.array_equal(px, img)


def test_png_palette():
    pal = _rng_img((4, 3), 5)
    idx = np.array([[0, 1], [2, 3], [3, 0]], dtype=np.uint8)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(3))
    blob = (
        PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    w, h, nch, px = decode_png(blob)
    assert (w, h, nch) == (2, 3, 3)
    assert np.array_equal(px, pal[idx])


def test_png_rejects_unsupported():
    img = _rng_img((3, 3, 3), 1)
    blob = bytearray(encode_png(img))
    assert decode_png(b"\x89PNG-fake-bytes") is None   # bad signature
    assert decode_png(bytes(blob[:-1])) is None         # truncated
    corrupt = bytearray(blob)
    corrupt[20] ^= 0xFF                                 # IHDR CRC mismatch
    assert decode_png(bytes(corrupt)) is None


def _bmp_bytes(img: np.ndarray, top_down=False) -> bytes:
    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = img if top_down else img[::-1]
    body = bytearray()
    for r in range(h):
        line = rows[r][:, ::-1].tobytes()  # RGB -> BGR
        body.extend(line + b"\x00" * (stride - len(line)))
    hdr_h = -h if top_down else h
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return header + bytes(body)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(top_down):
    img = _rng_img((5, 3, 3), 21)
    w, h, nch, px = decode_bmp(_bmp_bytes(img, top_down))
    assert (w, h, nch) == (3, 5, 3)
    assert np.array_equal(px, img)


def test_image_stage_real_path(ray_session):
    import ray.data

    from lucene_ray.pipelines.multimodal import decode_images

    imgs = [_rng_img((4, 5, 3), s) for s in (1, 2)]
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array(
            [encode_png(imgs[0]), _bmp_bytes(imgs[1]), b"not-an-image"],
            pa.binary(),
        ),
    })
    out = sorted(
        decode_images(ray.data.from_arrow(tbl), payload_col="payload")
        .take_all(),
        key=lambda r: r["media_id"],
    )
    assert [r["decoded"] for r in out] == [True, True, False]
    assert (out[0]["width"], out[0]["height"]) == (5, 4)
    assert (out[1]["width"], out[1]["height"]) == (5, 4)
    for r, img in zip(out[:2], imgs):
        want = img.astype(np.float32).mean(axis=(0, 1))
        got = np.asarray(r["features"][:3])
        assert np.allclose(got, want)
        assert all(v == 0.0 for v in r["features"][3:])


def _rng_frames(n, h, w, seed):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_avi_roundtrip():
    from lucene_ray.pipelines.multimodal import (
        decode_avi_frame,
        demux_avi,
        encode_avi,
        is_avi,
    )

    frames = _rng_frames(5, 4, 7, 3)  # w*3=21 -> stride padding exercised
    blob = encode_avi(frames)
    assert is_avi(blob)
    w, h, chunks = demux_avi(blob)
    assert (w, h, len(chunks)) == (7, 4, 5)
    for (off, size), fr in zip(chunks, frames):
        assert np.array_equal(decode_avi_frame(blob, off, size, w, h), fr)


def test_avi_rejects_garbage():
    from lucene_ray.pipelines.multimodal import (
        decode_avi_frame,
        demux_avi,
        encode_avi,
        is_avi,
    )

    assert demux_avi(b"") is None
    assert demux_avi(b"RIFF\x04\x00\x00\x00WAVE") is None  # not AVI
    assert not is_avi(b"nope")
    blob = bytearray(encode_avi(_rng_frames(2, 3, 3, 7)))
    # truncate mid-movi: chunk size overruns -> demux refuses
    assert demux_avi(bytes(blob[:60])) is None
    w, h, chunks = demux_avi(bytes(blob))
    off, size = chunks[0]
    # wrong expected dims -> chunk-size mismatch -> None
    assert decode_avi_frame(bytes(blob), off, size, w, h + 1) is None


def test_frame_stage_real_and_fallback(ray_session):
    import hashlib

    import ray.data

    from lucene_ray.pipelines.multimodal import (
        FrameSampleStage,
        demux_avi,
        encode_avi,
    )

    frames = _rng_frames(6, 3, 4, 11)
    avi = encode_avi(frames)
    raw = b"just-raw-bytes-" * 10
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([avi, raw], pa.binary()),
    })
    out = sorted(
        ray.data.from_arrow(tbl)
        .map_batches(FrameSampleStage(n_frames=4), batch_format="pyarrow")
        .take_all(),
        key=lambda r: (r["doc_id"], r["frame_idx"]),
    )
    assert len(out) == 8
    real, fake = out[:4], out[4:]
    assert all(r["decoded"] for r in real)
    assert not any(r["decoded"] for r in fake)
    # real rows point at the actual demuxed chunk bytes
    _, _, chunks = demux_avi(avi)
    for i, r in enumerate(real):
        off, size = chunks[i * 6 // 4]
        assert (r["frame_off"], r["frame_bytes"]) == (off, size)
        assert r["digest"] == hashlib.md5(avi[off : off + size]).hexdigest()
    # fallback rows are even byte slices of the payload
    n = len(raw)
    for i, r in enumerate(fake):
        lo, hi = i * n // 4, (i + 1) * n // 4
        assert (r["frame_off"], r["frame_bytes"]) == (lo, hi - lo)
        assert r["digest"] == hashlib.md5(raw[lo:hi]).hexdigest()


def test_avi_truncated_demux_refuses():
    """A truncated payload whose declared RIFF size still covers the lost
    bytes must NOT yield chunk extents past the buffer end."""
    from lucene_ray.pipelines.multimodal import demux_avi, encode_avi

    blob = encode_avi(_rng_frames(2, 3, 3, 5))
    w, h, chunks = demux_avi(blob)
    movi_end = chunks[-1][0] + chunks[-1][1]
    # cut inside the LAST frame chunk (idx1 and 10 frame bytes gone)
    cut = blob[: movi_end - 10]
    got = demux_avi(cut)
    if got is not None:
        _w, _h, cks = got
        assert all(off + size <= len(cut) for off, size in cks)
    # encode rejects non-HxWx3 frames with ValueError, not IndexError
    with pytest.raises(ValueError):
        encode_avi([np.zeros((4, 4), np.uint8)])
