"""Phase-correlation ME: peak extraction finds known global shifts, the
candidate-augmented matcher recovers motions beyond the pyramid's reach,
and the full encode path stays reference-decodable."""
import numpy as np
import pytest

import jax.numpy as jnp

from schroedinger_tpu.encoder import me as me_mod
from schroedinger_tpu.encoder import phasecorr as pcm


def _texture(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (128 + 50 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
           + 20 * np.sin((xx + 2 * yy) / 5.0) + rng.normal(0, 3, (h, w)))
    return img.clip(0, 255).astype(np.uint8)


def test_phasecorr_finds_global_shift():
    h, w = 256, 320
    ref = _texture(h, w)
    # content moves by s = (+16, -24): the correct Dirac MV is -s
    s = (16, -24)
    cur = np.roll(ref, s, axis=(0, 1))
    fn = pcm.make_phasecorr_fn(h, w)
    vecs = np.asarray(fn(jnp.asarray(cur), jnp.asarray(ref)))
    cands = pcm.pick_candidates(vecs, n=8)
    want = np.array([-s[0], -s[1]])
    d = np.abs(cands - want).sum(axis=1)
    assert d.min() <= 4, (cands, want)


def test_me_with_candidates_recovers_large_motion():
    h, w = 256, 256
    bs = 8
    nby, nbx = h // bs, w // bs
    ref = _texture(h, w, seed=3)
    s = (-60, 52)  # far beyond the 3-level pyramid's +-32 reach
    cur = np.roll(ref, s, axis=(0, 1))
    want = np.array([-s[0], -s[1]])

    fn = me_mod.make_me_fn(h, w, bs, bs, nbx, nby, n_extra=4)
    extra = jnp.asarray(np.array(
        [[0, 0], [want[0], want[1]], [5, -5], [0, 7]], np.int32))
    dy, dx, _ = fn(jnp.asarray(cur), jnp.asarray(ref), extra)
    dy, dx = np.asarray(dy), np.asarray(dx)
    # interior blocks (away from the roll wrap seam) must lock onto the shift
    inner_y = slice(9, nby - 9)
    inner_x = slice(8, nbx - 8)
    assert np.median(dy[inner_y, inner_x]) == want[0]
    assert np.median(dx[inner_y, inner_x]) == want[1]

    # without candidates the same motion is unreachable
    fn0 = me_mod.make_me_fn(h, w, bs, bs, nbx, nby)
    dy0, dx0, _ = fn0(jnp.asarray(cur), jnp.asarray(ref))
    assert abs(np.median(np.asarray(dy0)[inner_y, inner_x]) - want[0]) > 8


def test_gop_with_phasecorr_decodes_in_reference_decoder():
    from oracle import schro_oracle as so
    from schroedinger_tpu.decoder.core import StreamDecoder
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    W, H = 96, 80
    ref = _texture(H, W, seed=11)
    frames = []
    for i in range(3):
        y = np.roll(ref, (0, 10 * i), axis=(0, 1))
        u = np.full((H // 2, W // 2), 100, np.uint8)
        v = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append((y, u, v))
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16,
                     enable_phasecorr=True)
    stream = enc.encode_stream(frames)
    mine = StreamDecoder().decode_stream(stream)
    refdec = so.decode(stream, W, H)
    assert len(refdec) >= len(frames) - 1
    for n, (g3, r3) in enumerate(zip(mine, refdec)):
        for g, r, name in zip(g3, r3, "yuv"):
            np.testing.assert_array_equal(g, r,
                                          err_msg=f"frame {n} plane {name}")
