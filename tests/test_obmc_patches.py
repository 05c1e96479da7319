"""Patch-based OBMC render must be bit-identical to the per-pixel render.

The per-pixel path (render_component) is itself verified against the
reference decoder by the inter/GOP round-trip tests, so equality here
carries bit-exactness over to the fast path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from schroedinger_tpu.ops import obmc
from schroedinger_tpu.params import Params
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat


def _params(w, h, blocks, prec, num_refs, chroma=ChromaFormat.C420):
    vf = VideoFormat(width=w, height=h, clean_width=w, clean_height=h,
                     chroma_format=chroma,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    p = Params(video_format=vf, num_refs=num_refs, transform_depth=3,
               wavelet_filter_index=1)
    p.set_default_codeblocks()
    p.set_default_quant_matrix()
    p.xblen_luma, p.yblen_luma, p.xbsep_luma, p.ybsep_luma = blocks
    p.mv_precision = prec
    return p


def _random_fields(rng, p, num_refs, mv_mag):
    yb, xb = p.y_num_blocks, p.x_num_blocks
    prec = p.mv_precision
    bound = min(mv_mag << prec, obmc.MV_BOUND_PEL << prec)
    mode_hi = 4 if num_refs == 2 else 2
    fields = {
        "split": np.full((yb, xb), 2, np.int32),
        "pred_mode": rng.integers(0, mode_hi, (yb, xb)).astype(np.int32),
        "using_global": np.zeros((yb, xb), np.int32),
        "dx1": rng.integers(-bound, bound + 1, (yb, xb)).astype(np.int32),
        "dy1": rng.integers(-bound, bound + 1, (yb, xb)).astype(np.int32),
        "dx2": rng.integers(-bound, bound + 1, (yb, xb)).astype(np.int32),
        "dy2": rng.integers(-bound, bound + 1, (yb, xb)).astype(np.int32),
        "dc0": rng.integers(-128, 128, (yb, xb)).astype(np.int32),
        "dc1": rng.integers(-128, 128, (yb, xb)).astype(np.int32),
        "dc2": rng.integers(-128, 128, (yb, xb)).astype(np.int32),
    }
    return {k: jnp.asarray(v) for k, v in fields.items()}


def _ups(rng, p):
    vf = p.video_format
    w, h = vf.picture_luma_size()
    cw, ch = vf.picture_chroma_size()
    planes = [rng.integers(0, 256, (h, w), dtype=np.uint8),
              rng.integers(0, 256, (ch, cw), dtype=np.uint8),
              rng.integers(0, 256, (ch, cw), dtype=np.uint8)]
    return tuple(obmc.make_halfpel(obmc.upsample_plane(jnp.asarray(pl)))
                 for pl in planes)


@pytest.mark.parametrize("prec", [0, 1, 2, 3])
@pytest.mark.parametrize("size,blocks", [
    ((96, 80), (12, 12, 8, 8)),
    ((71, 67), (12, 12, 8, 8)),       # odd size
    ((128, 96), (16, 16, 12, 12)),
])
def test_patch_render_matches_perpixel_1ref(prec, size, blocks):
    rng = np.random.default_rng(prec * 100 + size[0])
    p = _params(size[0], size[1], blocks, prec, 1)
    mv = _random_fields(rng, p, 1, mv_mag=20)
    ups = _ups(rng, p)
    slow = obmc.make_render_body(p, 1, use_patches=False)(mv, ups, None)
    fast = obmc.make_render_body(p, 1, use_patches=True)(mv, ups, None)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(slow[k]),
                                      np.asarray(fast[k]),
                                      err_msg=f"plane {k} prec {prec}")


@pytest.mark.parametrize("prec", [0, 2])
@pytest.mark.parametrize("weights", [(1, 1, 1), (2, 3, 1)])
def test_patch_render_matches_perpixel_2ref(prec, weights):
    rng = np.random.default_rng(7 + prec)
    p = _params(96, 80, (12, 12, 8, 8), prec, 2)
    p.picture_weight_bits, p.picture_weight_1, p.picture_weight_2 = weights
    mv = _random_fields(rng, p, 2, mv_mag=15)
    ups1 = _ups(rng, p)
    ups2 = _ups(rng, p)
    slow = obmc.make_render_body(p, 2, use_patches=False)(mv, ups1, ups2)
    fast = obmc.make_render_body(p, 2, use_patches=True)(mv, ups1, ups2)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(slow[k]),
                                      np.asarray(fast[k]))


def test_patch_render_max_bound_mvs():
    """MVs exactly at MV_BOUND_PEL must still be exact."""
    rng = np.random.default_rng(3)
    p = _params(96, 80, (12, 12, 8, 8), 2, 1)
    mv = _random_fields(rng, p, 1, mv_mag=obmc.MV_BOUND_PEL)
    b = obmc.MV_BOUND_PEL << 2
    mv["dx1"] = jnp.where(jnp.arange(p.x_num_blocks)[None, :] % 2 == 0,
                          b, -b) + 0 * mv["dx1"]
    mv["dy1"] = jnp.full_like(mv["dy1"], -b)
    ups = _ups(rng, p)
    slow = obmc.make_render_body(p, 1, use_patches=False)(mv, ups, None)
    fast = obmc.make_render_body(p, 1, use_patches=True)(mv, ups, None)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(slow[k]),
                                      np.asarray(fast[k]))


def test_422_chroma():
    rng = np.random.default_rng(5)
    p = _params(96, 80, (12, 12, 8, 8), 2, 1, chroma=ChromaFormat.C422)
    mv = _random_fields(rng, p, 1, mv_mag=20)
    ups = _ups(rng, p)
    slow = obmc.make_render_body(p, 1, use_patches=False)(mv, ups, None)
    fast = obmc.make_render_body(p, 1, use_patches=True)(mv, ups, None)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(slow[k]),
                                      np.asarray(fast[k]))
