"""Packed-format frontends: round trips and cross-checks vs layout spec."""
import numpy as np
import pytest

from schroedinger_tpu import frontends as ff

W, H = 96, 16


def _planes422(bits=8, seed=0):
    rng = np.random.default_rng(seed)
    hi = (1 << bits) - 1
    dt = np.uint8 if bits == 8 else np.uint16
    return (rng.integers(0, hi + 1, (H, W)).astype(dt),
            rng.integers(0, hi + 1, (H, W // 2)).astype(dt),
            rng.integers(0, hi + 1, (H, W // 2)).astype(dt))


def _planes444(bits=8, seed=1):
    rng = np.random.default_rng(seed)
    hi = (1 << bits) - 1
    dt = np.uint8 if bits == 8 else np.uint16
    return tuple(rng.integers(0, hi + 1, (H, W)).astype(dt)
                 for _ in range(3))


@pytest.mark.parametrize("fourcc,mk", [
    ("YUY2", _planes422), ("UYVY", _planes422),
    ("AYUV", _planes444),
    ("v216", lambda: _planes422(16)), ("v210", lambda: _planes422(10)),
    ("AY64", lambda: _planes444(16)),
])
def test_pack_unpack_roundtrip(fourcc, mk):
    planes = mk()
    buf = ff.pack_frame(planes, fourcc)
    out = ff.unpack_frame(buf, fourcc, W, H)
    for a, b, name in zip(planes, out, "yuv"):
        np.testing.assert_array_equal(a, b, err_msg=f"{fourcc} {name}")


def test_yuy2_layout_is_yuyv():
    y = np.array([[10, 20]], np.uint8)
    u = np.array([[30]], np.uint8)
    v = np.array([[40]], np.uint8)
    assert ff.pack_yuy2(y, u, v) == bytes([10, 30, 20, 40])
    assert ff.pack_uyvy(y, u, v) == bytes([30, 10, 40, 20])


def test_v210_matches_reference_word_layout():
    """First 6 pixels: word0 = Cr0<<20|Y0<<10|Cb0 etc
    (schrovirtframe.c:765-867)."""
    y = np.arange(1, 49, dtype=np.uint16).reshape(1, 48)
    u = np.arange(101, 125, dtype=np.uint16).reshape(1, 24)
    v = np.arange(201, 225, dtype=np.uint16).reshape(1, 24)
    buf = ff.pack_v210(y, u, v)
    assert len(buf) == ff.v210_row_bytes(48)
    w0, w1, w2, w3 = np.frombuffer(buf[:16], "<u4")
    assert w0 == (201 << 20) | (1 << 10) | 101
    assert w1 == (3 << 20) | (102 << 10) | 2
    assert w2 == (103 << 20) | (4 << 10) | 202
    assert w3 == (6 << 20) | (203 << 10) | 5


def test_v210_row_padding():
    """Width not a multiple of 48 still rounds rows to 128 bytes."""
    w = 60
    y = np.zeros((2, w), np.uint16)
    u = np.zeros((2, w // 2), np.uint16)
    v = np.zeros((2, w // 2), np.uint16)
    buf = ff.pack_v210(y, u, v)
    assert len(buf) == 2 * ff.v210_row_bytes(w) == 2 * 256
    yy, uu, vv = ff.unpack_v210(buf, w, 2)
    assert yy.shape == (2, w) and uu.shape == (2, w // 2)


def test_chroma_vertical_resample():
    u = np.array([[0, 10], [2, 20], [100, 4], [102, 8]], np.uint8)
    d = ff.chroma_422_to_420(u)
    np.testing.assert_array_equal(d, [[1, 15], [101, 6]])
    up = ff.chroma_420_to_422(d)
    assert up.shape == (4, 2)


def test_deep_u8_roundtrip():
    p = np.arange(256, dtype=np.uint8).reshape(16, 16)
    deep = ff.u8_to_deep(p, bits=10)
    assert deep.max() == 1023
    back = ff.deep_to_u8(deep, bits=10)
    np.testing.assert_array_equal(back, p)


def test_encode_from_yuy2_frontend():
    """End-to-end: packed YUY2 capture -> planar 4:2:0 -> intra encode."""
    from schroedinger_tpu.api import Encoder, Decoder
    from schroedinger_tpu.config import EncoderConfig
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    rng = np.random.default_rng(3)
    w, h = 64, 48
    raw = rng.integers(0, 255, (h, w * 2)).astype(np.uint8).tobytes()
    y, u, v = ff.unpack_frame(raw, "YUY2", w, h)
    planes = (y, ff.chroma_422_to_420(u), ff.chroma_422_to_420(v))
    vf = VideoFormat(width=w, height=h, clean_width=w, clean_height=h,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    cfg = EncoderConfig()
    cfg.set("gop_structure", "intra_only")
    cfg.set("rate_control", "constant_quality")
    stream = Encoder(vf, cfg).encode_stream([planes])
    out = Decoder().decode_stream(stream)
    assert len(out) == 1 and out[0][0].shape == (h, w)
