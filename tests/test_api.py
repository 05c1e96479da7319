"""Unified Encoder facade: every profile produces streams the reference
decoder agrees with."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.api import Decoder, Encoder
from schroedinger_tpu.config import EncoderConfig
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80


def make_frames(n=3, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        y = (128 + 50 * np.sin((xx + 3 * i) / 8.0) + rng.normal(0, 5, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 20 * np.cos(yy[::2, ::2] / 6.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 20 * np.sin(xx[::2, ::2] / 7.0)).clip(0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("cfg,expected_profile", [
    (EncoderConfig(rate_control="low_delay", bitrate=20_000_000,
                   transform_depth=3, intra_wavelet=1), "vc2_low_delay"),
    (EncoderConfig(rate_control="constant_quality", enable_noarith=True,
                   transform_depth=3, intra_wavelet=1), "vc2_simple"),
    (EncoderConfig(rate_control="constant_quality",
                   gop_structure="intra_only", transform_depth=3),
     "vc2_main"),
    (EncoderConfig(rate_control="constant_bitrate", bitrate=2_000_000,
                   au_distance=8), "main"),
])
def test_profiles_roundtrip(cfg, expected_profile):
    frames = make_frames()
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = Encoder(vf, cfg)
    assert enc.profile == expected_profile
    stream = enc.encode_stream(frames)

    mine = Decoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == len(frames)
    assert len(ref) >= len(frames) - 1
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)


def test_lossless_longgop_exact():
    """rate_control=lossless long-GOP: decoded output equals the input."""
    frames = make_frames(4)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = Encoder(vf, EncoderConfig(rate_control="lossless", au_distance=4))
    stream = enc.encode_stream(frames)
    out = Decoder().decode_stream(stream)
    assert len(out) == len(frames)
    for g3, o3 in zip(out, frames):
        for g, o in zip(g3, o3):
            np.testing.assert_array_equal(g, o)
    # and the reference decoder agrees
    ref = so.decode(stream, W, H)
    for g3, r3 in zip(out, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)
