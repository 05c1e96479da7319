"""EXPERIMENTAL Pallas kernel for the ME patch SAD refine — opt-in only.

Status (round 3, measured on v5e with varied inputs, tools/profile_refine.py):
the jnp gather formulation (me._patch_refine, a vmapped dynamic_slice that
XLA lowers to dynamic-slice fusions) runs the fine 1080p refine level in
~36 ms/call end-to-end; every per-block-DMA Pallas design tried is 45-150x
SLOWER (1.7-5.7 s/call) — thousands of small (32x128) HBM->VMEM copies
serialize far below DMA-engine throughput on this toolchain, and per-block
`pltpu.roll` (dynamic lane rotate) is another ~170x cliff.  The production
ME therefore uses the jnp gather for hint refines plus the dense
shifted-SAD scan (me._dense_scan, gather-free) for the exhaustive coarse
level; this kernel is kept as a bit-exact compiled-verified reference
design, enabled only by SCHRO_TPU_PALLAS_ME=1.  It is THE single
retained Pallas experiment artifact (round-3's separate
tools/check_pallas_tpu.py harness is folded into this header): to
re-validate on hardware, set SCHRO_TPU_PALLAS_ME=1 and run the full
hierarchical ME at 1080p geometry against the jnp path —
tests/test_pallas_me.py does exactly that in interpret mode, and the
same comparison runs compiled on a real chip by calling
me.make_me_fn(1080, 1920, 16, 16, 120, 68, levels=5) under both values
of the env var (bit-exact, measured 45-150x slower; PROFILE.md §2).

Design notes (cf. schrometric.c:32-116, the reference's SAD scan, and
SURVEY §2.3.2's SIMD mapping).  Mosaic's memory rules shape the design: DMA slice offsets must be *provably* tile-aligned (8 on the
sublane dim, 128 on the lane dim), vector loads cannot use dynamic
sublane offsets at all, and per-block `pltpu.roll` (dynamic lane rotate)
measured ~170x slower than the surrounding work — so the kernel uses
neither.  Instead, BOTH axes use the floor-and-fold trick:

  *  the caller materializes 16 horizontally pre-shifted copies of the
     padded reference (shifts 8j, one fused XLA slice/pad, ~0.3 ms of
     pure HBM bandwidth at 1080p);
  *  per block, one HBM->VMEM DMA fetches a (PH, 128) window from copy
     j = (wx//8) % 16 at lane offset (wx//128)*128 and sublane offset
     (wy//8)*8 — all offsets provably aligned via `pl.multiple_of`,
     the copy index is a free leading DMA index;
  *  the 0..7 row and column remainders fold into the candidate
     enumeration: rows r = rem_y + a and cols b = rem_x + b' are
     enumerated statically over [0, K+7) x [0, K+7) and masked per
     block by a_eff/b_eff in [0, K);
  *  candidate SADs are then STATIC slices of the strip, evaluated for
     a whole chunk of blocks at once — dense VPU work.  Every vector is
     kept rank-2 with shape (CHUNK, 1): Mosaic's layout inference on
     this toolchain aborts on 1-D formulations.

Block rows are processed one grid step each, in chunks of <=64 blocks so
VMEM stays bounded at 4K widths.  All chunk DMAs are started before any
is awaited so they overlap on the DMA engine.

Bit-exact vs me._patch_refine: candidates are visited in the same
(dy, dx) lexicographic order with a strictly-smaller take, so ties
resolve identically.  tests/test_pallas_me.py runs the interpreter on
CPU; the compiled-on-hardware check is described at the top of this
docstring.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


N_SHIFT = 16                                 # horizontal pre-shifts of 8


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
    assert pw + 14 <= 128, (bs_x, rad)      # rem_x + b' + bs_x fits
    assert margin >= bound + rad, (margin, bound, rad)
    PH = _round_up(ph + 7, 8)               # + row remainder slack
    WW = 128                                # one lane tile per window
    CHUNK = min(nbx, 32)
    nchunks = -(-nbx // CHUNK)
    nbx_pad = nchunks * CHUNK

    # pad P so the worst-case window never clips (exact static bounds)
    max_wy = (nby - 1) * bs_y + margin - rad + bound
    max_wx = (nbx_pad - 1) * bs_x + margin - rad + bound
    Hp_pad = _round_up(max(Hp, max_wy + PH), 8)
    # copy j is read at lane base (wx//128)*128 for cols 128q..128q+127,
    # holding P cols shifted left by 8j; P itself must cover
    # max col + 8*(N_SHIFT-1) + WW
    Wp_pad = _round_up(max(Wp, (max_wx // 128) * 128 + WW
                           + 8 * (N_SHIFT - 1)), 128)

    row_base = margin - rad                 # wy = i*bs_y + row_base + mvy

    def kernel(mvy_ref, mvx_ref, mvy_v, mvx_v, cur_ref, p_hbm,
               dy_ref, dx_ref, sad_ref,
               strip, psem):
        g = pl.program_id(0)
        i = g // nchunks
        c = g % nchunks

        def window(k):
            bx = c * CHUNK + k
            mvy = mvy_ref[i, bx]
            mvx = mvx_ref[i, bx]
            wy = i * bs_y + row_base + mvy         # >= 0 (margin)
            wx = bx * bs_x + row_base + mvx        # >= 0 (margin)
            wy_al = pl.multiple_of((wy // 8) * 8, 8)
            wx_al = pl.multiple_of((wx // 128) * 128, 128)
            j = (wx // 8) % N_SHIFT
            return pltpu.make_async_copy(
                p_hbm.at[j, pl.ds(wy_al, PH), pl.ds(wx_al, WW)],
                strip.at[k], psem)

        def start(k, _):
            window(k).start()
            return _

        def wait(k, _):
            window(k).wait()
            return _

        jax.lax.fori_loop(0, CHUNK, start, 0)
        jax.lax.fori_loop(0, CHUNK, wait, 0)

        cur_t = cur_ref[0, 0]                      # (CHUNK, bs_y, bs_x)
        mvy_col = mvy_v[0, 0]                      # (CHUNK, 1)
        mvx_col = mvx_v[0, 0]
        rem_y = (i * bs_y + row_base + mvy_col) % 8
        # column remainder: everything below the 8-granular pre-shift
        col0 = jnp.arange(CHUNK, dtype=jnp.int32)[:, None] * bs_x
        rem_x = (c * CHUNK * bs_x + col0 + row_base + mvx_col) % 8
        big = jnp.int32(2 ** 30)
        best_sad = jnp.full((CHUNK, 1), big, jnp.int32)
        best_a = jnp.zeros((CHUNK, 1), jnp.int32)
        best_b = jnp.zeros((CHUNK, 1), jnp.int32)
        for r in range(K + 7):                     # r = rem_y + a
            a_eff = r - rem_y                      # (CHUNK, 1)
            valid_a = jnp.logical_and(a_eff >= 0, a_eff < K)
            for b in range(K + 7):                 # b = rem_x + b'
                b_eff = b - rem_x
                valid = jnp.logical_and(
                    valid_a, jnp.logical_and(b_eff >= 0, b_eff < K))
                v = strip[:, r:r + bs_y, b:b + bs_x]
                t = jnp.sum(jnp.abs(cur_t - v), axis=2,
                            dtype=jnp.int32)       # (CHUNK, bs_y)
                s = jnp.sum(t, axis=1, keepdims=True)   # (CHUNK, 1)
                take = jnp.logical_and(valid, s < best_sad)
                best_sad = jnp.where(take, s, best_sad)
                best_a = jnp.where(take, a_eff, best_a)
                best_b = jnp.where(take, b_eff, best_b)
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
            pl.BlockSpec(memory_space=pl.ANY),        # pre-shifted refs
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
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
        # 16 horizontally pre-shifted copies: P16[j, :, c] = P32[:, c+8j]
        P16 = jnp.stack([
            (P32 if j == 0 else
             jnp.pad(P32[:, 8 * j:], ((0, 0), (0, 8 * j))))
            for j in range(N_SHIFT)])
        mvy = mv_y.astype(jnp.int32)
        mvx = mv_x.astype(jnp.int32)
        if xtra:
            mvy = jnp.pad(mvy, ((0, 0), (0, xtra)))
            mvx = jnp.pad(mvx, ((0, 0), (0, xtra)))
        mvy4 = mvy.reshape(nby, nchunks, CHUNK, 1)
        mvx4 = mvx.reshape(nby, nchunks, CHUNK, 1)
        dy, dx, sad = call(mvy, mvx, mvy4, mvx4, cur5, P16)
        dy = dy.reshape(nby, nbx_pad)[:, :nbx]
        dx = dx.reshape(nby, nbx_pad)[:, :nbx]
        sad = sad.reshape(nby, nbx_pad)[:, :nbx]
        return dy, dx, sad

    return fn
