"""RGB frontends: ARGB pack/unpack (reference-exact integer YCoCg),
colour-matrix conversion (BT.601/709 floor(x+0.5) semantics), crop and
point subsampling — schrovirtframe.c:693, 1265-1297, 1375-1432,
1437-1476, 1854-1880."""
import numpy as np

from schroedinger_tpu import frontends as ff


def _unpack_argb_scalar(data, w, h):
    """Direct transcription of the reference's unpack_argb loops."""
    a = np.frombuffer(data, np.uint8).reshape(h, w, 4)
    Y = np.zeros((h, w), np.int16)
    Co = np.zeros((h, w), np.int16)
    Cg = np.zeros((h, w), np.int16)
    for j in range(h):
        for i in range(w):
            r, g, b = int(a[j, i, 1]), int(a[j, i, 2]), int(a[j, i, 3])
            t = b - ((r - b) >> 1)
            Y[j, i] = t + (g >> 1)
            Co[j, i] = r - b
            Cg[j, i] = g - t
    return Y, Co, Cg


def _pack_argb_scalar(y, co, cg):
    h, w = y.shape
    out = np.zeros((h, w, 4), np.uint8)
    for j in range(h):
        for i in range(w):
            t = int(y[j, i]) + (int(cg[j, i]) >> 1)
            b = t - (int(co[j, i]) >> 1)
            out[j, i, 0] = 0xFF
            out[j, i, 1] = (b + int(co[j, i])) & 0xFF
            out[j, i, 2] = (t + int(cg[j, i])) & 0xFF
            out[j, i, 3] = b & 0xFF
    return out.tobytes()


def test_argb_unpack_matches_reference_scalar():
    rng = np.random.default_rng(7)
    w, h = 17, 9
    data = rng.integers(0, 256, (h, w, 4), dtype=np.uint8).tobytes()
    y, co, cg = ff.unpack_argb(data, w, h)
    ys, cos_, cgs = _unpack_argb_scalar(data, w, h)
    np.testing.assert_array_equal(y, ys)
    np.testing.assert_array_equal(co, cos_)
    np.testing.assert_array_equal(cg, cgs)


def test_argb_pack_matches_reference_scalar():
    rng = np.random.default_rng(8)
    w, h = 13, 7
    y = rng.integers(-200, 500, (h, w)).astype(np.int16)
    co = rng.integers(-256, 256, (h, w)).astype(np.int16)
    cg = rng.integers(-256, 256, (h, w)).astype(np.int16)
    assert ff.pack_argb(y, co, cg) == _pack_argb_scalar(y, co, cg)


def test_color_matrix_known_points():
    one = np.full((2, 2), 255, np.uint8)
    zero = np.zeros((2, 2), np.uint8)
    for m in ("bt601", "bt709"):
        y, u, v = ff.rgb_to_yuv(one, one, one, m)       # white
        assert y[0, 0] == 235 and u[0, 0] == 128 and v[0, 0] == 128, m
        y, u, v = ff.rgb_to_yuv(zero, zero, zero, m)    # black
        assert y[0, 0] == 16 and u[0, 0] == 128 and v[0, 0] == 128, m
    # BT.601 pure red: Y = 0.25679*255 + 16 = 81, Cr = 0.43922*255+128=240
    y, u, v = ff.rgb_to_yuv(one, zero, zero, "bt601")
    assert y[0, 0] == 81 and v[0, 0] == 240 and u[0, 0] == 90


def test_rgb_yuv_roundtrip_smooth():
    yy, xx = np.mgrid[0:32, 0:48]
    rgb = np.stack([(40 + 3 * xx).clip(0, 255),
                    (60 + 2 * yy).clip(0, 255),
                    (80 + xx + yy).clip(0, 255)], axis=-1).astype(np.uint8)
    for m in ("bt601", "bt709"):
        y, u, v = ff.rgb_to_yuv(rgb[..., 0], rgb[..., 1], rgb[..., 2], m)
        back = np.stack(ff.yuv_to_rgb(y, u, v, m), axis=-1)
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert err.max() <= 3, (m, err.max())


def test_subsample_point_semantics_and_crop():
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    u = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    v = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    _, u4, _ = ff.subsample_444((y, u, v), "420")
    np.testing.assert_array_equal(u4, u[::2, ::2])      # point, no filter
    _, u2, _ = ff.subsample_444((y, u, v), "422")
    np.testing.assert_array_equal(u2, u[:, ::2])
    cy, cu, cv = ff.crop((y, u4, u4), 16, 8)
    assert cy.shape == (8, 16) and cu.shape == (4, 8)
    np.testing.assert_array_equal(cy, y[:8, :16])


def test_rgb_through_full_codec():
    """An RGB frame encodes and decodes back through the whole codec."""
    from schroedinger_tpu.api import Decoder, Encoder
    from schroedinger_tpu.config import EncoderConfig
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    w, h = 96, 80
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(128 + 90 * np.sin(xx / 9.0)).clip(0, 255),
                    (128 + 90 * np.cos(yy / 7.0)).clip(0, 255),
                    (128 + 60 * np.sin((xx + yy) / 11.0)).clip(0, 255)],
                   axis=-1).astype(np.uint8)
    frames = [ff.rgb_to_420(rgb) for _ in range(2)]
    vf = VideoFormat(width=w, height=h, clean_width=w, clean_height=h,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    cfg = EncoderConfig(rate_control="constant_quality", quality=7.0,
                        gop_structure="intra_only")
    stream = Encoder(vf, cfg).encode_stream(frames)
    out = Decoder().decode_stream(stream)
    back = ff.yuv420_to_rgb(out[0])
    mse = np.mean((back.astype(np.float64) - rgb.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 28, psnr
