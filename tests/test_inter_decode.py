"""Long-GOP (inter) decoding differential tests vs the oracle decoder."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder

W, H = 96, 80


def make_frames(n=6, seed=11):
    """Moving pattern so motion estimation produces nonzero vectors."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(np.float64)
    noise = rng.normal(0, 5, (H, W))
    frames = []
    for i in range(n):
        y = np.roll(base, (i * 2, i * 3), axis=(0, 1)) + noise
        u = (128 + 25 * np.cos((xx[::2, ::2] + 4 * i) / 9.0))
        v = (128 + 25 * np.sin((yy[::2, ::2] + 3 * i) / 11.0))
        frames.append((y.clip(0, 255).astype(np.uint8),
                       u.clip(0, 255).astype(np.uint8),
                       v.clip(0, 255).astype(np.uint8)))
    return frames


@pytest.mark.parametrize("settings", [
    {"gop_structure": 2},                       # backref (P pictures)
    {},                                         # default adaptive (B frames)
    {"gop_structure": 2, "mv_precision": 0},    # integer-pel
    {"gop_structure": 2, "enable_noarith": 1},  # VLC-coded MVs + residual
])
def test_longgop_decode_matches_oracle(settings):
    frames = make_frames()
    stream = so.encode(frames, W, H, settings=dict(settings))
    ref = so.decode(stream, W, H)
    got = StreamDecoder().decode_stream(stream)
    # the oracle ctypes wrapper can drop the last frame at EOS; compare the
    # common prefix (presentation order)
    assert len(got) == len(frames)
    assert len(ref) >= len(frames) - 1
    for n, (g3, r3) in enumerate(zip(got, ref)):
        for g, r, name in zip(g3, r3, "yuv"):
            np.testing.assert_array_equal(g, r, err_msg=f"frame {n} plane {name}")
