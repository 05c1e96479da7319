"""Pallas TPU kernel for the hot ME primitive: per-block patch SAD refine.

The jnp formulation (me._patch_refine) extracts one (bs+2r)^2 patch per
block with a vmapped dynamic_slice — XLA lowers that to a generic HBM
gather, which dominates the whole motion search at 1080p (~100x off the
roofline: the actual SAD math is ~50M int ops, <1 ms of VPU work).

This kernel removes the gather (cf. schrometric.c:32-116, the reference's
SAD scan, and SURVEY §2.3.2's SIMD mapping).  Mosaic's memory rules shape
the design: DMA slice offsets must be *provably* tile-aligned (8 on the
sublane dim, 128 on the lane dim), and vector loads cannot use dynamic
sublane offsets at all.  So per block:

  1. one HBM->VMEM DMA fetches a (PH, WW) window whose sublane offset is
     the block's MV row floored to a multiple of 8 (`pl.multiple_of`)
     and whose lane offset is STATIC (a 128-floored per-block column
     covering every reachable horizontal MV);
  2. the horizontal MV offset is resolved with `pltpu.roll` (dynamic
     lane rotate, the one data-dependent lane operation Mosaic has) and
     the first 128 lanes are stored to a compact strip;
  3. the 0..7 vertical remainder is folded into the candidate row index:
     candidate rows r = rem + a are enumerated statically over
     [0, K+7), masked per block by a_eff = r - rem in [0, K);
  4. candidate SADs are then STATIC slices of the strip, evaluated for a
     whole chunk of blocks at once — dense VPU work.  Every vector is
     kept rank-2 with shape (CHUNK, 1): Mosaic's layout inference on
     this toolchain aborts on 1-D formulations.

Block rows are processed one grid step each, in chunks of <=64 blocks so
VMEM stays bounded at 4K widths.  All chunk DMAs are started before any
is awaited so they overlap on the DMA engine.

Bit-exact vs me._patch_refine: candidates are visited in the same
(dy, dx) lexicographic order with a strictly-smaller take, so ties
resolve identically.  tests/test_pallas_me.py runs the interpreter on
CPU; tools/check_pallas_tpu.py runs the compiled kernel on hardware at
1080p geometry.
"""
from __future__ import annotations

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
    ph = bs_y + 2 * rad                     # patch rows actually used
    pw = bs_x + 2 * rad                     # patch cols actually used
    assert pw + K <= 128, (bs_x, rad)
    assert margin >= bound + rad, (margin, bound, rad)
    PH = _round_up(ph + 7, 8)               # + vertical remainder slack
    WW = _round_up(2 * bound + pw + 127, 128)   # static lane window
    CHUNK = min(nbx, 64)
    nchunks = -(-nbx // CHUNK)
    nbx_pad = nchunks * CHUNK

    # pad P so the worst-case window never clips (exact static bounds)
    max_wy = (nby - 1) * bs_y + margin - rad + bound
    max_sal = ((nbx_pad - 1) * bs_x + margin - rad - bound) // 128 * 128
    Hp_pad = _round_up(max(Hp, max_wy + PH), 8)
    Wp_pad = _round_up(max(Wp, max_sal + WW), 128)

    row_base = margin - rad                 # wy = i*bs_y + row_base + mvy

    def kernel(mvy_ref, mvx_ref, mvy_v, mvx_v, cur_ref, p_hbm,
               dy_ref, dx_ref, sad_ref,
               strip1, strip2, psem):
        g = pl.program_id(0)
        i = g // nchunks
        c = g % nchunks

        def window(k):
            bx = c * CHUNK + k
            mvy = mvy_ref[i, bx]
            wy = i * bs_y + row_base + mvy         # >= 0 (margin)
            wy_al = pl.multiple_of((wy // 8) * 8, 8)
            s0 = bx * bs_x + (margin - rad - bound)
            sal = pl.multiple_of((s0 // 128) * 128, 128)
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(wy_al, PH), pl.ds(sal, WW)],
                strip1.at[k], psem)

        def start(k, _):
            window(k).start()
            return _

        jax.lax.fori_loop(0, CHUNK, start, 0)

        def finish(k, _):
            window(k).wait()
            bx = c * CHUNK + k
            mvx = mvx_ref[i, bx]
            s0 = bx * bs_x + (margin - rad - bound)
            s_off = s0 - (s0 // 128) * 128 + mvx + bound   # in [0, WW-pw)
            v = strip1[k]                          # (PH, WW)
            rolled = pltpu.roll(v, (WW - s_off) % WW, axis=1)
            strip2[k] = rolled[:, :128]
            return _

        jax.lax.fori_loop(0, CHUNK, finish, 0)

        cur_t = cur_ref[0, 0]                      # (CHUNK, bs_y, bs_x)
        mvy_col = mvy_v[0, 0]                      # (CHUNK, 1)
        mvx_col = mvx_v[0, 0]
        rem = (i * bs_y + row_base + mvy_col) % 8  # vertical remainder
        big = jnp.int32(2 ** 30)
        best_sad = jnp.full((CHUNK, 1), big, jnp.int32)
        best_a = jnp.zeros((CHUNK, 1), jnp.int32)
        best_b = jnp.zeros((CHUNK, 1), jnp.int32)
        for r in range(K + 7):                     # r = rem + a
            a_eff = r - rem                        # (CHUNK, 1)
            valid = jnp.logical_and(a_eff >= 0, a_eff < K)
            for b in range(K):
                v = strip2[:, r:r + bs_y, b:b + bs_x]
                t = jnp.sum(jnp.abs(cur_t - v), axis=2,
                            dtype=jnp.int32)       # (CHUNK, bs_y)
                s = jnp.sum(t, axis=1, keepdims=True)   # (CHUNK, 1)
                take = jnp.logical_and(valid, s < best_sad)
                best_sad = jnp.where(take, s, best_sad)
                best_a = jnp.where(take, a_eff, best_a)
                best_b = jnp.where(take, b, best_b)
        dy_ref[0, 0] = mvy_col + best_a - rad
        dx_ref[0, 0] = mvx_col + best_b - rad
        sad_ref[0, 0] = best_sad

    imap3 = lambda g: (g // nchunks, g % nchunks, 0, 0)       # noqa: E731
    imap4 = lambda g: (g // nchunks, g % nchunks, 0, 0, 0)    # noqa: E731
    colspec = pl.BlockSpec((1, 1, CHUNK, 1), imap3,
                           memory_space=pltpu.VMEM)
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),    # mv_y (whole, scalar)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # mv_x (whole, scalar)
            colspec,                                  # mv_y (column view)
            colspec,                                  # mv_x (column view)
            pl.BlockSpec((1, 1, CHUNK, bs_y, bs_x), imap4,
                         memory_space=pltpu.VMEM),    # cur blocks
            pl.BlockSpec(memory_space=pl.ANY),        # padded ref (HBM)
    ]
    out_specs = [colspec, colspec, colspec]
    out_shape = [jax.ShapeDtypeStruct((nby, nchunks, CHUNK, 1),
                                      jnp.int32)] * 3

    call = pl.pallas_call(
        kernel,
        grid=(nby * nchunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((CHUNK, PH, WW), jnp.int32),
            pltpu.VMEM((CHUNK, PH, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    def fn(cur_blocks, P, mv_y, mv_x):
        cur4 = cur_blocks.reshape(nby, nbx, bs_y, bs_x).astype(jnp.int32)
        xtra = nbx_pad - nbx
        if xtra:
            cur4 = jnp.pad(cur4, ((0, 0), (0, xtra), (0, 0), (0, 0)))
        cur5 = cur4.reshape(nby, nchunks, CHUNK, bs_y, bs_x)
        P32 = jnp.pad(P.astype(jnp.int32),
                      ((0, Hp_pad - Hp), (0, Wp_pad - Wp)))
        mvy = mv_y.astype(jnp.int32)
        mvx = mv_x.astype(jnp.int32)
        if xtra:
            mvy = jnp.pad(mvy, ((0, 0), (0, xtra)))
            mvx = jnp.pad(mvx, ((0, 0), (0, xtra)))
        mvy4 = mvy.reshape(nby, nchunks, CHUNK, 1)
        mvx4 = mvx.reshape(nby, nchunks, CHUNK, 1)
        dy, dx, sad = call(mvy, mvx, mvy4, mvx4, cur5, P32)
        dy = dy.reshape(nby, nbx_pad)[:, :nbx]
        dx = dx.reshape(nby, nbx_pad)[:, :nbx]
        sad = sad.reshape(nby, nbx_pad)[:, :nbx]
        return dy, dx, sad

    return fn
