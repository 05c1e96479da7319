"""Interlaced (field) coding: split/weave round trip and full-stream field
coding cross-checked against the reference decoder."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu import frontends as ff
from schroedinger_tpu.api import Decoder, Encoder
from schroedinger_tpu.config import EncoderConfig
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80


def _frames(n=3, seed=4):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 55 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
            + rng.normal(0, 4, (H, W))).clip(0, 255).astype(np.uint8)
    return [(np.roll(base, (2 * i, 3 * i), (0, 1)),
             np.full((H // 2, W // 2), 100, np.uint8),
             np.full((H // 2, W // 2), 150, np.uint8)) for i in range(n)]


@pytest.mark.parametrize("tff", [True, False])
def test_split_weave_roundtrip(tff):
    fr = _frames(1)[0]
    f1, f2 = ff.split_fields(fr, tff=tff)
    assert f1[0].shape == (H // 2, W)
    back = ff.weave_fields(f1, f2, tff=tff)
    for a, b in zip(fr, back):
        np.testing.assert_array_equal(a, b)


def test_interlaced_stream_decodes_and_weaves():
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1,
                     interlaced=True, top_field_first=True,
                     interlaced_coding=True)
    frames = _frames(3)
    cfg = EncoderConfig()
    cfg.set("rate_control", "constant_quality")
    cfg.set("quality", 7.0)   # default 5.0 legitimately sits near 27 dB
    stream = Encoder(vf, cfg).encode_stream(frames)

    mine = Decoder().decode_stream(stream)
    assert len(mine) == 3
    assert mine[0][0].shape == (H, W)

    # the reference decoder sees 6 half-height field pictures
    ref_fields = so.decode(stream, W, H // 2)
    assert len(ref_fields) == 6
    ref_frames = [ff.weave_fields(ref_fields[2 * i], ref_fields[2 * i + 1])
                  for i in range(3)]
    for n, (g3, r3) in enumerate(zip(mine, ref_frames)):
        for g, r, name in zip(g3, r3, "yuv"):
            np.testing.assert_array_equal(g, r,
                                          err_msg=f"frame {n} plane {name}")

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    for g3, orig in zip(mine, frames):
        assert psnr(g3[0], orig[0]) > 28


def test_interlaced_push_pull_matches_stream():
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1,
                     interlaced=True, top_field_first=True,
                     interlaced_coding=True)
    frames = _frames(3)
    cfg = EncoderConfig()
    cfg.set("rate_control", "constant_quality")
    e1 = Encoder(vf, cfg)
    st1 = e1.encode_stream(frames)
    cfg2 = EncoderConfig()
    cfg2.set("rate_control", "constant_quality")
    e2 = Encoder(vf, cfg2)
    out = bytearray()
    for f in frames:
        e2.push_frame(f)
        out += e2.pull()
    out += e2.end_of_stream()
    assert st1 == bytes(out)
