"""Pallas TPU kernel for the hot ME primitive: per-block patch SAD refine.

The jnp formulation (me._patch_refine) extracts one (bs+2r)^2 patch per
block with a vmapped dynamic_slice — XLA lowers that to a generic HBM
gather, which dominates the whole motion search at 1080p (~100x off the
roofline: the actual SAD math is ~50M int ops, <1 ms of VPU work).

This kernel removes the HBM gather (cf. schrometric.c:32-116, the
reference's SAD scan, and SURVEY §2.3.2's SIMD mapping):

  grid = (nby,)  — one program per block row
  1. the padded-reference band covering every reachable patch of this
     block row (MVs are clamped by the caller) is DMA'd HBM->VMEM once;
  2. each block's (bs+2r, PW) window is copied from the band at its MV
     offset into a patch strip laid out (ph, nbx, PW) — one dynamic
     2-D VMEM read + one sublane-dynamic store per block;
  3. the (2r+1)^2 candidate SADs are STATIC slices of the strip,
     evaluated for all nbx blocks at once — pure dense VPU work.

Bit-exact vs me._patch_refine (tests/test_pallas_me.py runs both the
interpreter on CPU and, in the TPU bench path, the compiled kernel).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_patch_refine(nby, nbx, bs_y, bs_x, rad, bound, margin, Hp, Wp,
                      interpret=False):
    """Build fn(cur_blocks (nby*nbx, bs_y, bs_x) int, P (Hp, Wp) int,
    mv_y (nby, nbx) i32, mv_x (nby, nbx) i32) -> (dy, dx, sad), the exact
    semantics of me._patch_refine(cur_blocks, P, mv_y, mv_x, ..., rad,
    margin) for |mv| <= bound <= margin - rad.

    P: the margin-padded reference, Hp = nby*bs_y + 2*margin,
    Wp = nbx*bs_x + 2*margin.
    """
    K = 2 * rad + 1
    ph = bs_y + 2 * rad                     # patch rows
    PW = _round_up(bs_x + 2 * rad, 8)       # patch cols (minor dim)
    band_h = bs_y + 2 * (bound + rad)
    assert margin >= bound + rad, (margin, bound, rad)
    Wp_pad = _round_up(Wp + 128, 128)       # right slack so 128-lane
                                            # window reads never clip

    def kernel(mvy_ref, mvx_ref, mvy_v, mvx_v, cur_ref, p_hbm,
               dy_ref, dx_ref, sad_ref,
               band, strip, sem):
        i = pl.program_id(0)
        row0 = i * bs_y + margin - (bound + rad)   # never clips (margin)
        cp = pltpu.make_async_copy(
            p_hbm.at[pl.ds(row0, band_h), :], band, sem)
        cp.start()
        cp.wait()

        def extract(bx, _):
            mvy = mvy_ref[0, bx]
            mvx = mvx_ref[0, bx]
            wy = mvy + bound                       # in [0, 2*bound]
            wx = bx * bs_x + mvx - rad + margin    # >= 0, +PW <= Wp_pad
            strip[:, bx, :] = band[pl.ds(wy, ph), pl.ds(wx, PW)]
            return _

        jax.lax.fori_loop(0, nbx, extract, 0)

        cur_t = cur_ref[0]                         # (bs_y, nbx, bs_x)
        best_sad = jnp.full((nbx,), 2 ** 30, jnp.int32)
        best_a = jnp.zeros((nbx,), jnp.int32)
        best_b = jnp.zeros((nbx,), jnp.int32)
        for a in range(K):
            for b in range(K):
                v = strip[a:a + bs_y, :, b:b + bs_x]
                s = jnp.sum(jnp.abs(cur_t - v), axis=(0, 2),
                            dtype=jnp.int32)       # (nbx,)
                take = s < best_sad
                best_sad = jnp.where(take, s, best_sad)
                best_a = jnp.where(take, a, best_a)
                best_b = jnp.where(take, b, best_b)
        dy_ref[0, :] = mvy_v[0, :] + best_a - rad
        dx_ref[0, :] = mvx_v[0, :] + best_b - rad
        sad_ref[0, :] = best_sad

    in_specs = [
            pl.BlockSpec((1, nbx), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),    # mv_y row
            pl.BlockSpec((1, nbx), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),    # mv_x row
            pl.BlockSpec((1, nbx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),    # mv_y (vector view)
            pl.BlockSpec((1, nbx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),    # mv_x (vector view)
            pl.BlockSpec((1, bs_y, nbx, bs_x), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),    # cur (row-major
                                                      # within block row)
            pl.BlockSpec(memory_space=pl.ANY),        # padded ref (HBM)
    ]
    out_specs = [
        pl.BlockSpec((1, nbx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nbx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nbx), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]

    out_shape = [jax.ShapeDtypeStruct((nby, nbx), jnp.int32)] * 3

    call = pl.pallas_call(
        kernel,
        grid=(nby,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((band_h, Wp_pad), jnp.int32),
            pltpu.VMEM((ph, nbx, PW), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    def fn(cur_blocks, P, mv_y, mv_x):
        cur4 = (cur_blocks.reshape(nby, nbx, bs_y, bs_x)
                .transpose(0, 2, 1, 3).astype(jnp.int32))
        P32 = jnp.pad(P.astype(jnp.int32), ((0, 0), (0, Wp_pad - Wp)))
        mvy = mv_y.astype(jnp.int32)
        mvx = mv_x.astype(jnp.int32)
        dy, dx, sad = call(mvy, mvx, mvy, mvx, cur4, P32)
        return dy, dx, sad

    return fn
