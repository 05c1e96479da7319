"""Hierarchical block-matching motion estimation on TPU.

TPU-first design (not a translation of schromotionest.c): every level
evaluates all candidate displacements for all blocks at once — the SAD of a
shifted reference against the current frame reduces blockwise via reshape,
so the work is pure dense elementwise + reductions (VPU-friendly), with the
candidate axis vmapped. Coarse levels scan exhaustively; finer levels refine
around the upsampled parent vectors (hint propagation, like
schroroughmotion.c but data-parallel).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def downsample2(x):
    """2x box downsample (encoder-side pyramid; decision-only)."""
    h, w = x.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    x = x[:h2, :w2].astype(jnp.int32)
    return ((x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]
             + 2) >> 2).astype(jnp.uint8)


def _block_sads(cur, ref, bs_y, bs_x, cands):
    """SAD per block per candidate displacement.

    cur, ref: (H, W) u8 (H, W multiples of bs). cands: (K, 2) int32 (dy, dx).
    Returns (K, H//bs_y, W//bs_x) int32.
    """
    H, W = cur.shape
    c = cur.astype(jnp.int32)
    r = ref.astype(jnp.int32)

    def one(_, d):
        dy, dx = d[0], d[1]
        shifted = jnp.roll(r, (-dy, -dx), axis=(0, 1))
        # rolled wrap-around is fine for decision purposes; penalize borders
        diff = jnp.abs(c - shifted)
        blocks = diff.reshape(H // bs_y, bs_y, W // bs_x, bs_x)
        return None, blocks.sum(axis=(1, 3))

    # scan keeps the compiled graph small (one roll, K iterations)
    _, sads = jax.lax.scan(one, None, cands)
    return sads


def _grid_cands(radius, step=1):
    r = np.arange(-radius, radius + 1, step)
    dy, dx = np.meshgrid(r, r, indexing="ij")
    return np.stack([dy.ravel(), dx.ravel()], axis=1).astype(np.int32)


def make_me_fn(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
               levels=3, coarse_radius=8, refine_radius=2, n_extra=0):
    """Jitted wrapper of make_me_body (see there)."""
    import jax as _jax
    return _jax.jit(make_me_body(H, W, xbsep, ybsep, x_num_blocks,
                                 y_num_blocks, levels, coarse_radius,
                                 refine_radius, n_extra))


def make_me_body(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
                 levels=3, coarse_radius=8, refine_radius=2, n_extra=0):
    """Build the raw (traceable) ME: (cur_y u8, ref_y u8) -> (dy, dx)
    per block (pel); compose inside larger jitted programs.

    With n_extra > 0 the function takes a third argument, an (n_extra, 2)
    int32 array of (dy, dx) full-pel candidates (e.g. phase-correlation
    vectors, schro_motionest_superblock_phasecorr1 analog): each block takes
    whichever of {hierarchy result, candidates} has the lowest SAD, then a
    local rescan recovers per-block detail around the winner — so large
    global/secondary motions beyond the pyramid's reach are still found.
    """
    pad_h = ybsep * y_num_blocks
    pad_w = xbsep * x_num_blocks

    cands_coarse = jnp.asarray(_grid_cands(coarse_radius))
    cands_refine = jnp.asarray(_grid_cands(refine_radius))

    def me(cur, ref, extra=None):
        cur = jnp.pad(cur, ((0, pad_h - H), (0, pad_w - W)), mode="edge")
        ref = jnp.pad(ref, ((0, pad_h - H), (0, pad_w - W)), mode="edge")

        pyr_c = [cur]
        pyr_r = [ref]
        for _ in range(levels - 1):
            pyr_c.append(downsample2(pyr_c[-1]))
            pyr_r.append(downsample2(pyr_r[-1]))

        # coarsest: exhaustive scan with per-level block size ~ bsep
        mv = None
        for lev in range(levels - 1, -1, -1):
            c, r = pyr_c[lev], pyr_r[lev]
            bs_y = max(4, ybsep >> lev) if lev else ybsep
            bs_x = max(4, xbsep >> lev) if lev else xbsep
            h, w = c.shape
            h = h // bs_y * bs_y
            w = w // bs_x * bs_x
            c = c[:h, :w]
            r = r[:h, :w]
            nby, nbx = h // bs_y, w // bs_x
            if mv is None:
                sads = _block_sads(c, r, bs_y, bs_x, cands_coarse)
                best = jnp.argmin(sads, axis=0)
                mv = cands_coarse[best]            # (nby, nbx, 2)
            else:
                # upsample hints to this level's grid, scale x2
                hint = mv * 2
                hy, hx = hint.shape[0], hint.shape[1]
                ys = jnp.clip((jnp.arange(nby) * hy) // nby, 0, hy - 1)
                xs = jnp.clip((jnp.arange(nbx) * hx) // nbx, 0, hx - 1)
                hint = hint[ys[:, None], xs[None, :]]  # (nby, nbx, 2)

                # align the reference to the hint field once (one gather),
                # then the small refine becomes cheap rolls of the aligned
                # reference (roll crossing a block boundary only perturbs
                # the SAD of edge pixels — decision noise, not correctness)
                yy = jnp.arange(h)
                xx = jnp.arange(w)
                dy_pix = jnp.repeat(jnp.repeat(hint[..., 0], bs_y, 0), bs_x, 1)
                dx_pix = jnp.repeat(jnp.repeat(hint[..., 1], bs_y, 0), bs_x, 1)
                src_y = jnp.clip(yy[:, None] + dy_pix, 0, h - 1)
                src_x = jnp.clip(xx[None, :] + dx_pix, 0, w - 1)
                aligned = r[src_y, src_x].astype(jnp.int32)
                ci = c.astype(jnp.int32)

                def sad_at(_, d):
                    shifted = jnp.roll(aligned, (-d[0], -d[1]), axis=(0, 1))
                    diff = jnp.abs(ci - shifted)
                    return None, diff.reshape(nby, bs_y, nbx, bs_x).sum((1, 3))

                _, sads = jax.lax.scan(sad_at, None, cands_refine)
                best = jnp.argmin(sads, axis=0)
                mv = hint + cands_refine[best]

        if n_extra:
            # compare the hierarchy result against the uniform candidates
            h, w = pyr_c[0].shape
            h = h // ybsep * ybsep
            w = w // xbsep * xbsep
            c0 = pyr_c[0][:h, :w]
            r0 = pyr_r[0][:h, :w]
            nby, nbx = h // ybsep, w // xbsep
            own_sad = _sad_displaced(c0, r0, ybsep, xbsep, mv)
            ext_sads = _block_sads(c0, r0, ybsep, xbsep, extra)
            all_sads = jnp.concatenate([own_sad[None], ext_sads], axis=0)
            all_mvs = jnp.concatenate(
                [mv[None],
                 jnp.broadcast_to(extra[:, None, None, :],
                                  (n_extra, nby, nbx, 2))], axis=0)
            best = jnp.argmin(all_sads, axis=0)          # (nby, nbx)
            mv = jnp.take_along_axis(
                all_mvs, best[None, ..., None], axis=0)[0]
            # local rescan around the winner (aligned gather + rolls)
            yy = jnp.arange(h)
            xx = jnp.arange(w)
            dy_pix = jnp.repeat(jnp.repeat(mv[..., 0], ybsep, 0), xbsep, 1)
            dx_pix = jnp.repeat(jnp.repeat(mv[..., 1], ybsep, 0), xbsep, 1)
            src_y = jnp.clip(yy[:, None] + dy_pix, 0, h - 1)
            src_x = jnp.clip(xx[None, :] + dx_pix, 0, w - 1)
            aligned = r0[src_y, src_x].astype(jnp.int32)
            ci = c0.astype(jnp.int32)

            def sad_at2(_, d):
                shifted = jnp.roll(aligned, (-d[0], -d[1]), axis=(0, 1))
                diff = jnp.abs(ci - shifted)
                return None, diff.reshape(nby, ybsep, nbx, xbsep).sum((1, 3))

            _, sads = jax.lax.scan(sad_at2, None, cands_refine)
            best = jnp.argmin(sads, axis=0)
            mv = mv + cands_refine[best]
        return mv[..., 0], mv[..., 1]

    def _sad_displaced(c, r, bs_y, bs_x, disp):
        """SAD per block with a per-block displacement field disp (nby,nbx,2)."""
        h, w = c.shape
        nby, nbx = h // bs_y, w // bs_x
        yy = jnp.arange(h)
        xx = jnp.arange(w)
        # expand the per-block displacement field to per-pixel
        dy_pix = jnp.repeat(jnp.repeat(disp[..., 0], bs_y, axis=0), bs_x, axis=1)
        dx_pix = jnp.repeat(jnp.repeat(disp[..., 1], bs_y, axis=0), bs_x, axis=1)
        src_y = jnp.clip(yy[:, None] + dy_pix, 0, h - 1)
        src_x = jnp.clip(xx[None, :] + dx_pix, 0, w - 1)
        sampled = r[src_y, src_x]
        diff = jnp.abs(c.astype(jnp.int32) - sampled.astype(jnp.int32))
        return diff.reshape(nby, bs_y, nbx, bs_x).sum(axis=(1, 3))

    return me


def make_subpel_refine(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
                       mv_precision):
    import jax as _jax
    return _jax.jit(make_subpel_body(H, W, xbsep, ybsep, x_num_blocks,
                                     y_num_blocks, mv_precision))


def make_subpel_body(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
                     mv_precision):
    """Raw sub-pel refinement body: full-pel MVs -> 1/2^prec-pel MVs.

    Successively scales to each precision level and scans the 3x3 sub-pel
    neighborhood, sampling the interleaved half-pel reference with the same
    fetch the OBMC renderer uses (schromotionest.c:133-246 analog)."""
    from schroedinger_tpu.ops.obmc import _fetch_pixels

    pad_h = ybsep * y_num_blocks
    pad_w = xbsep * x_num_blocks
    cands = jnp.asarray(_grid_cands(1))  # 9 offsets

    def refine(cur, up, dy_full, dx_full):
        c = jnp.pad(cur, ((0, pad_h - H), (0, pad_w - W)),
                    mode="edge").astype(jnp.int32)
        ys = jnp.arange(pad_h)
        xs = jnp.arange(pad_w)
        mv_y = dy_full
        mv_x = dx_full
        for level in range(1, mv_precision + 1):
            mv_y = mv_y * 2
            mv_x = mv_x * 2
            scale_rem = mv_precision - level  # remaining shift to full prec
            dy_pix = jnp.repeat(jnp.repeat(mv_y, ybsep, 0), xbsep, 1)
            dx_pix = jnp.repeat(jnp.repeat(mv_x, ybsep, 0), xbsep, 1)

            def sad_at(_, d):
                py = ((ys[:, None] << level) + dy_pix + d[0]) << scale_rem
                px = ((xs[None, :] << level) + dx_pix + d[1]) << scale_rem
                # scale positions to the renderer's precision units
                samp = _fetch_pixels(up, mv_precision,
                                     px, py)
                diff = jnp.abs(c - samp)
                return None, diff.reshape(y_num_blocks, ybsep,
                                          x_num_blocks, xbsep).sum((1, 3))

            _, sads = jax.lax.scan(sad_at, None, cands)
            best = jnp.argmin(sads, axis=0)
            mv_y = mv_y + cands[best][..., 0]
            mv_x = mv_x + cands[best][..., 1]
        return mv_y, mv_x

    return refine
