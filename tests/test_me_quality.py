"""ME quality: deep pyramid reach on fast pans, candidate competition
(zero/median/injected), and the DC-ratio intra bailout."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 192, 160


def pan_frames(n=4, vx=44, seed=2):
    """Textured clip panning `vx` pels/frame — beyond a 3-level pyramid's
    reach (~+-38 pel) but within a 5-level one's."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 50 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
            + 30 * np.sin((xx + 2 * yy) / 23.0))
    out = []
    for i in range(n):
        y = np.roll(base, i * vx, axis=1) + rng.normal(0, 2, (H, W))
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        out.append((y.clip(0, 255).astype(np.uint8), u, v))
    return out


def vfmt():
    return VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                       chroma_format=ChromaFormat.C420,
                       frame_rate_numerator=25, frame_rate_denominator=1)


def mc_ratio(enc):
    """Fraction of non-DC blocks over the recorded inter frames."""
    rs = [r for r in enc.stats.frames if "dc_ratio" in r]
    assert rs, "no inter frames recorded"
    return 1.0 - float(np.mean([r["dc_ratio"] for r in rs]))


def test_fast_pan_without_phasecorr():
    frames = pan_frames(4, vx=44)
    enc = GopEncoder(vfmt(), base_qi_intra=12, base_qi_inter=16,
                     gop_length=16, enable_scene_change=False,
                     downsample_levels=5)
    stream = enc.encode_stream(frames)
    # 44 pel/frame pan: the deep pyramid must keep MC engaged
    assert mc_ratio(enc) > 0.8, enc.stats.frames
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)


def test_downsample_levels_wired_and_deep_beats_shallow():
    """Contrast: 3 levels cannot reach 44 pel/frame hierarchically (the
    median/zero candidate competition partially rescues blocks, but
    prediction is worse), so the deep pyramid must code the pan both
    with more MC blocks and in fewer bits."""
    frames = pan_frames(4, vx=44)

    def run(levels):
        enc = GopEncoder(vfmt(), base_qi_intra=12, base_qi_inter=16,
                         gop_length=16, enable_scene_change=False,
                         downsample_levels=levels)
        stream = enc.encode_stream(frames)
        return mc_ratio(enc), len(stream)

    mc3, bytes3 = run(3)
    mc5, bytes5 = run(5)
    assert mc5 > mc3
    assert bytes5 < bytes3


def test_intra_bailout_on_scene_change():
    """Serial push path: a total content change with scene detection OFF
    must still bail the P picture out to intra via the DC-ratio limit."""
    rng = np.random.default_rng(0)
    f0 = (rng.integers(0, 255, (H, W)).astype(np.uint8),
          np.full((H // 2, W // 2), 128, np.uint8),
          np.full((H // 2, W // 2), 128, np.uint8))
    f1 = ((128 + 60 * np.sin(np.mgrid[0:H, 0:W][1] / 5.0))
          .clip(0, 255).astype(np.uint8),
          np.full((H // 2, W // 2), 200, np.uint8),
          np.full((H // 2, W // 2), 60, np.uint8))
    enc = GopEncoder(vfmt(), base_qi_intra=12, base_qi_inter=16,
                     gop_length=16, enable_scene_change=False)
    out = bytearray()
    out += enc.encode_frame(f0)
    out += enc.encode_frame(f1)
    out += enc._chain.add([], final_eos=False) if False else b""
    from schroedinger_tpu import bitstream as bs
    kinds = [(bs.num_refs(c), bs.is_reference(c))
             for c, _ in bs.split_units(bytes(out)) if bs.is_picture(c)]
    # both pictures coded intra: the second bailed out
    assert kinds == [(0, True), (0, True)], kinds
