"""Pallas patch-refine kernel vs the jnp reference (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schroedinger_tpu.encoder import me as me_mod
from schroedinger_tpu.ops import pallas_me


@pytest.mark.parametrize("rad,bs", [(2, 16), (1, 8)])
def test_patch_refine_matches_jnp(rad, bs):
    nby, nbx = 6, 9
    bound = 24
    margin = bound + 2 * rad + 16
    pad_h, pad_w = nby * bs, nbx * bs
    rng = np.random.default_rng(0)
    cur = rng.integers(0, 255, (pad_h, pad_w)).astype(np.uint8)
    ref = rng.integers(0, 255, (pad_h, pad_w)).astype(np.uint8)
    mv_y = rng.integers(-bound + rad, bound - rad, (nby, nbx)).astype(np.int32)
    mv_x = rng.integers(-bound + rad, bound - rad, (nby, nbx)).astype(np.int32)

    cb = me_mod._to_blocks(jnp.asarray(cur, jnp.int32), nby, bs, nbx, bs)
    P = me_mod._pad_ref(jnp.asarray(ref), margin)

    ey, ex, es = me_mod._patch_refine(cb, P, jnp.asarray(mv_y),
                                      jnp.asarray(mv_x), nby, nbx, bs, bs,
                                      rad, margin)

    fn = pallas_me.make_patch_refine(nby, nbx, bs, bs, rad, bound, margin,
                                     P.shape[0], P.shape[1], interpret=True)
    gy, gx, gs = fn(cb, P, jnp.asarray(mv_y), jnp.asarray(mv_x))

    np.testing.assert_array_equal(np.asarray(gs), np.asarray(es))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ey))
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(ex))


def test_dense_scan_matches_patch_refine():
    """Coarse-level dense shifted-SAD scan == patch refine around zero."""
    nby, nbx, bs, rad = 7, 11, 4, 8
    rng = np.random.default_rng(3)
    c = rng.integers(0, 255, (nby * bs, nbx * bs)).astype(np.uint8)
    r = rng.integers(0, 255, (nby * bs, nbx * bs)).astype(np.uint8)
    margin = rad + 16
    cb = me_mod._to_blocks(jnp.asarray(c, jnp.int32), nby, bs, nbx, bs)
    P = me_mod._pad_ref(jnp.asarray(r), margin)
    zero = jnp.zeros((nby, nbx), jnp.int32)
    ey, ex, es = me_mod._patch_refine(cb, P, zero, zero, nby, nbx, bs, bs,
                                      rad, margin)
    gy, gx, gs = me_mod._dense_scan(jnp.asarray(c), jnp.asarray(r),
                                    nby, nbx, bs, bs, rad)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(es))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ey))
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(ex))
