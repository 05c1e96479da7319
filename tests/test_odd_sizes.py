"""Odd-size boundary sweep (the reference's encode.c pattern: every frame
size 64x64..79x79, /root/reference/testsuite/encode.c:20-70): long-GOP
encode at every width/height remainder mod 16, decoded bit-exactly by both
our decoder and the reference decoder."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat


def frames_for(W, H, n=3, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 55 * np.sin(xx / 6.0) * np.cos(yy / 5.0)
    cw, ch = (W + 1) // 2, (H + 1) // 2
    out = []
    for i in range(n):
        y = (np.roll(base, 2 * i, axis=1)
             + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.uint8)
        u = np.full((ch, cw), 100, np.uint8)
        v = np.full((ch, cw), 160, np.uint8)
        out.append((y, u, v))
    return out


# all (w mod 16, h mod 16) residue pairs across 64..79, paired diagonally
# plus the transposed diagonal — every odd dimension appears at least once
SIZES = [(64 + i, 64 + (79 - 64 - i)) for i in range(0, 16, 3)] + \
        [(79, 64), (71, 77)]


@pytest.mark.parametrize("W,H", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_longgop_odd_size(W, H):
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=14, base_qi_inter=18, gop_length=8,
                     enable_scene_change=False)
    stream = enc.encode_stream(frames_for(W, H))
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == len(ref) == 3
    for n, (g3, r3) in enumerate(zip(mine, ref)):
        for g, r, name in zip(g3, r3, "yuv"):
            np.testing.assert_array_equal(g, r,
                                          err_msg=f"{W}x{H} frame {n} {name}")
