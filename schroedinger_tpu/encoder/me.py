"""Hierarchical block-matching motion estimation on TPU.

TPU-first design (not a translation of schromotionest.c): every level
evaluates all candidate displacements for all blocks at once.  Per-pixel
gathers are avoided everywhere (XLA lowers them to ~10 ns/element scalar
code on TPU): candidate evaluation works on per-block *patches* pulled
from an edge-clamp-padded reference with one batched dynamic-slice, after
which every candidate is a static strided view of the patch — pure dense
VPU work.  Coarse levels scan exhaustively with rolls (tiny images);
finer levels refine around upsampled parent vectors (hint propagation,
like schroroughmotion.c but data-parallel).

MVs are clamped to +-ME_BOUND_PEL so the patch margins (and the OBMC
patch renderer's MV_BOUND_PEL) are always respected.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu.ops.obmc import pad_halfpel, _round8

ME_BOUND_PEL = 124


def _pallas_me_enabled() -> bool:
    """Use the experimental Pallas patch-refine kernel (ops/pallas_me.py)
    for the ME hint-refine scans.  Default OFF everywhere: on v5e the
    per-block-DMA kernel measured 45x slower than the XLA dynamic-slice
    gather it replaces (see ops/pallas_me.py header for the numbers), so
    the production path is the jnp gather + the dense coarse scan.
    Opt in with SCHRO_TPU_PALLAS_ME=1 (bit-exact either way)."""
    import os
    return os.environ.get("SCHRO_TPU_PALLAS_ME", "0") not in ("", "0",
                                                              "off", "auto")


def downsample2(x):
    """2x box downsample (encoder-side pyramid; decision-only)."""
    h, w = x.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    x = x[:h2, :w2].astype(jnp.int32)
    return ((x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]
             + 2) >> 2).astype(jnp.uint8)


def _block_sads(cur, ref, bs_y, bs_x, cands):
    """SAD per block per candidate displacement (roll formulation; used on
    the small coarse level and for uniform extra candidates only).

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


def _pad_ref(ref, margin):
    """Edge-clamp padded pel-grid reference: out[m+k, m+l] = ref[clip k,l]."""
    return jnp.pad(ref, ((margin, margin), (margin, margin)), mode="edge")


def _to_blocks(c, nby, bs_y, nbx, bs_x):
    """(nby*bs_y, nbx*bs_x) -> (nb, bs_y, bs_x)."""
    return (c.reshape(nby, bs_y, nbx, bs_x).transpose(0, 2, 1, 3)
            .reshape(nby * nbx, bs_y, bs_x))


def _extract_ref_patches(P, mv_y, mv_x, nby, nbx, bs_y, bs_x, rad, margin):
    """Per-block (bs+2rad) patches of the padded ref at the block origin
    displaced by its MV.  Returns (nb, ph, pw) int32."""
    ph = _round8(bs_y + 2 * rad)
    pw = _round8(bs_x + 2 * rad)
    oy = ((jnp.arange(nby) * bs_y)[:, None] + mv_y - rad + margin).ravel()
    ox = ((jnp.arange(nbx) * bs_x)[None, :] + mv_x - rad + margin).ravel()
    Ph, Pw = P.shape
    oy = jnp.clip(oy, 0, Ph - ph)
    ox = jnp.clip(ox, 0, Pw - pw)

    def slc(a, b):
        return jax.lax.dynamic_slice(P, (a, b), (ph, pw))

    return jax.vmap(slc)(oy, ox).astype(jnp.int32)


def _dense_scan(c, r, nby, nbx, bs_y, bs_x, rad):
    """Exhaustive (2rad+1)^2 scan around zero displacement as dense
    shifted SADs — no gather at all: every candidate is a static slice of
    the edge-padded reference, box-summed per block.  Bit-identical to
    _patch_refine(cb, P, 0, 0, ..., rad, margin) (same edge clamp, same
    (dy, dx) lexicographic tie order) but maps to pure VPU work, which is
    how the coarse pyramid level should run on TPU (the reference's
    hint-free coarsest scan, schroroughmotion.c:65-141).

    c, r: (nby*bs_y, nbx*bs_x) images.  Returns (dy, dx, sad)."""
    K = 2 * rad + 1
    H, W = c.shape
    ci = c.astype(jnp.int32)
    Ppad = jnp.pad(r.astype(jnp.int32), rad, mode="edge")
    sads = []
    for a in range(K):
        for b in range(K):
            d = jnp.abs(ci - Ppad[a:a + H, b:b + W])
            sads.append(d.reshape(nby, bs_y, nbx, bs_x).sum((1, 3)))
    s = jnp.stack(sads)                       # (K*K, nby, nbx)
    best = jnp.argmin(s, axis=0)
    dy = best // K - rad
    dx = best % K - rad
    sad = jnp.take_along_axis(s, best[None], axis=0)[0]
    return dy.astype(jnp.int32), dx.astype(jnp.int32), sad


def _patch_refine(c_blocks, P, mv_y, mv_x, nby, nbx, bs_y, bs_x, rad,
                  margin):
    """(2rad+1)^2 full-pel refine around (mv_y, mv_x) via patches.

    c_blocks: (nb, bs_y, bs_x) int32 current blocks.
    Returns (mv_y, mv_x, best_sad) each (nby, nbx)."""
    pat = _extract_ref_patches(P, mv_y, mv_x, nby, nbx, bs_y, bs_x, rad,
                               margin)
    sads = []
    offs = []
    for a in range(2 * rad + 1):
        for b in range(2 * rad + 1):
            v = pat[:, a:a + bs_y, b:b + bs_x]
            sads.append(jnp.abs(c_blocks - v).sum((1, 2)))
            offs.append((a - rad, b - rad))
    s = jnp.stack(sads)                       # (K, nb)
    best = jnp.argmin(s, axis=0)
    doy = jnp.asarray([o[0] for o in offs], jnp.int32)[best]
    dox = jnp.asarray([o[1] for o in offs], jnp.int32)[best]
    best_sad = jnp.min(s, axis=0)
    return (mv_y + doy.reshape(nby, nbx), mv_x + dox.reshape(nby, nbx),
            best_sad.reshape(nby, nbx))


def make_me_fn(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
               levels=3, coarse_radius=8, refine_radius=2, n_extra=0):
    """Jitted wrapper of make_me_body (see there)."""
    import jax as _jax
    return _jax.jit(make_me_body(H, W, xbsep, ybsep, x_num_blocks,
                                 y_num_blocks, levels, coarse_radius,
                                 refine_radius, n_extra))


def _median3x3_field(f):
    """Per-block 3x3 median of an MV component field (edge-clamped):
    a data-parallel stand-in for the reference's spatially-predicted
    candidate (schromotionest.c:520-695 'predicted' entry) — outlier
    blocks inherit their neighborhood's consensus vector."""
    h, w = f.shape
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
            xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
            taps.append(f[ys[:, None], xs[None, :]])
    return jnp.sort(jnp.stack(taps), axis=0)[4]


def make_me_body(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
                 levels=3, coarse_radius=8, refine_radius=2, n_extra=0,
                 max_levels_cap=True, candidates=True, zero_cand=True,
                 chroma=None):
    """Build the raw (traceable) ME: (cur_y u8, ref_y u8) -> (dy, dx, sad)
    per block (pel); compose inside larger jitted programs.

    Candidate set per block at the final level mirrors the reference's
    list {scan/hierarchy, predicted, zero, global/phasecorr}
    (schroencoder.h:421-440): the hierarchy result competes against the
    ZERO vector (with the reference's zero bias, gated by
    enable_zero/bigblock_estimation via zero_cand) and the 3x3-median
    'predicted' field; n_extra adds injected candidates (phase
    correlation / global motion).  The winner gets a local rescan.

    levels=1 disables the pyramid (enable_hierarchical_estimation off:
    only the full-resolution exhaustive scan runs, like the reference's
    non-hierarchical superblock scan path, schromotionest.c:1181).

    chroma: None, or (cbs_y, cbs_x, ch, cw) — the chroma block geometry.
    When set (enable_chroma_me, schrohierbm.c:37: use_chroma), the final
    candidate competition adds each candidate's chroma SAD (sampled at
    mv >> chroma shift) to its luma SAD, so color-dominant motion is
    scored on all three components (schrometric.c:73-115's chroma
    metric).  The me fn then takes four extra plane args
    (cur_u, cur_v, ref_u, ref_v).

    With n_extra > 0 the function takes an (n_extra, 2) int32 array of
    (dy, dx) full-pel candidates after (cur, ref).
    """
    pad_h = ybsep * y_num_blocks
    pad_w = xbsep * x_num_blocks

    # cap pyramid depth so the coarsest level still holds >= 2x2 blocks
    # of >= 4 px (downsample_levels setting, schromotionest.h:20)
    if max_levels_cap:
        while levels > 1 and (min(pad_h, pad_w) >> (levels - 1)) < 16:
            levels -= 1

    margin = ME_BOUND_PEL + 2 * max(coarse_radius, refine_radius) + 16
    use_pallas = _pallas_me_enabled()

    def refine_dispatch(cb, P, mvy, mvx, nby, nbx, bs_y, bs_x, rad, bound):
        """Patch refine via the Pallas kernel (TPU) or the jnp gather
        formulation (CPU/tests); bit-exact either way."""
        if use_pallas:
            from schroedinger_tpu.ops import pallas_me
            fn = pallas_me.make_patch_refine(
                nby, nbx, bs_y, bs_x, rad, bound, margin,
                nby * bs_y + 2 * margin, nbx * bs_x + 2 * margin)
            return fn(cb, P, mvy, mvx)
        return _patch_refine(cb, P, mvy, mvx, nby, nbx, bs_y, bs_x, rad,
                             margin)

    def me(cur, ref, extra=None, chroma_planes=None):
        cur = jnp.pad(cur, ((0, pad_h - H), (0, pad_w - W)), mode="edge")
        ref = jnp.pad(ref, ((0, pad_h - H), (0, pad_w - W)), mode="edge")

        pyr_c = [cur]
        pyr_r = [ref]
        for _ in range(levels - 1):
            pyr_c.append(downsample2(pyr_c[-1]))
            pyr_r.append(downsample2(pyr_r[-1]))

        mv = None
        sad = None
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
            cb = _to_blocks(c.astype(jnp.int32), nby, bs_y, nbx, bs_x)
            P = _pad_ref(r, margin)
            if mv is None:
                # coarsest level: exhaustive (2*coarse_radius+1)^2 scan
                # as dense shifted SADs (no gather, no Pallas needed)
                my, mx, sad = _dense_scan(c, r, nby, nbx, bs_y, bs_x,
                                          coarse_radius)
                mv = jnp.stack([my, mx], axis=-1)
            else:
                # upsample hints to this level's grid, scale x2
                hint = mv * 2
                hy, hx = hint.shape[0], hint.shape[1]
                ys = jnp.clip((jnp.arange(nby) * hy) // nby, 0, hy - 1)
                xs = jnp.clip((jnp.arange(nbx) * hx) // nbx, 0, hx - 1)
                hint = hint[ys[:, None], xs[None, :]]  # (nby, nbx, 2)
                hint = jnp.clip(hint, -ME_BOUND_PEL, ME_BOUND_PEL)

                my, mx, sad = refine_dispatch(cb, P, hint[..., 0],
                                              hint[..., 1], nby, nbx,
                                              bs_y, bs_x, refine_radius,
                                              bound=ME_BOUND_PEL)
                mv = jnp.stack([my, mx], axis=-1)

        mv = jnp.clip(mv, -ME_BOUND_PEL, ME_BOUND_PEL)
        if not candidates and not n_extra:
            return mv[..., 0], mv[..., 1], sad

        # final-level candidate competition: hierarchy vs zero vs the
        # median-'predicted' field (+ injected candidates), then a local
        # rescan around the winner (schromotionest.c:520-695 analog)
        h, w = pyr_c[0].shape
        h = h // ybsep * ybsep
        w = w // xbsep * xbsep
        c0 = pyr_c[0][:h, :w]
        r0 = pyr_r[0][:h, :w]
        nby, nbx = h // ybsep, w // xbsep
        cb = _to_blocks(c0.astype(jnp.int32), nby, ybsep, nbx, xbsep)
        P = _pad_ref(r0, margin)

        med = jnp.stack([_median3x3_field(mv[..., 0]),
                         _median3x3_field(mv[..., 1])], axis=-1)

        def sad_at(field):
            pat = _extract_ref_patches(P, field[..., 0], field[..., 1],
                                       nby, nbx, ybsep, xbsep, 0, margin)
            v = pat[:, :ybsep, :xbsep]
            return jnp.abs(cb - v).sum((1, 2)).reshape(nby, nbx)

        # zero-displacement SAD needs no patch gather: it is the aligned
        # dense diff (cost matters: each extra patch extraction at 1080p
        # is ~6 ms; this candidate set adds only one, for `med`)
        zdiff = jnp.abs(c0.astype(jnp.int32) - r0.astype(jnp.int32))
        sad_zero = zdiff.reshape(nby, ybsep, nbx, xbsep).sum((1, 3))
        zero = jnp.zeros_like(mv)

        cand_mvs = [mv, med, zero]
        # the reference biases toward zero/predicted ("gravity",
        # schrometric.c:122): a small per-pel bias keeps the smooth/zero
        # candidate when SADs are close, which costs fewer MV bits
        bias = ybsep * xbsep // 16
        cand_sads = [sad, sad_at(med), sad_zero]
        cand_bias = [0, bias, bias]
        if not zero_cand:
            cand_mvs = cand_mvs[:2]
            cand_sads = cand_sads[:2]
            cand_bias = cand_bias[:2]
        if chroma is not None:
            cbs_y, cbs_x, ch, cw = chroma
            cu, cv, ru, rv = chroma_planes
            cph = cbs_y * nby
            cpw = cbs_x * nbx
            vsh = (ybsep // cbs_y).bit_length() - 1
            hsh = (xbsep // cbs_x).bit_length() - 1
            cmargin = (margin >> min(vsh, hsh)) + 2

            def cprep(pl_):
                return jnp.pad(pl_, ((0, cph - ch), (0, cpw - cw)),
                               mode="edge").astype(jnp.int32)

            cub = _to_blocks(cprep(cu), nby, cbs_y, nbx, cbs_x)
            cvb = _to_blocks(cprep(cv), nby, cbs_y, nbx, cbs_x)
            Pu = _pad_ref(cprep(ru), cmargin)
            Pv = _pad_ref(cprep(rv), cmargin)

            def chroma_sad(field):
                """Per-block chroma SAD of a candidate MV field (u + v),
                sampled at the chroma-shifted vector."""
                my = field[..., 0] >> vsh
                mx = field[..., 1] >> hsh
                tot = 0
                for cb_, P_ in ((cub, Pu), (cvb, Pv)):
                    pat = _extract_ref_patches(P_, my, mx, nby, nbx,
                                               cbs_y, cbs_x, 0, cmargin)
                    v_ = pat[:, :cbs_y, :cbs_x]
                    tot = tot + jnp.abs(cb_ - v_).sum((1, 2)).reshape(
                        nby, nbx)
                return tot

        else:
            chroma_sad = None
        if n_extra:
            ext = jnp.clip(extra, -ME_BOUND_PEL, ME_BOUND_PEL)
            ext_sads = _block_sads(c0, r0, ybsep, xbsep, ext)
            for k in range(n_extra):
                cand_mvs.append(jnp.broadcast_to(ext[k][None, None, :],
                                                 (nby, nbx, 2)))
                cand_sads.append(ext_sads[k])
                cand_bias.append(0)
        # chroma joins the SELECTION metric only; the returned SAD stays
        # luma (downstream mode decision compares it against luma-only
        # DC SADs)
        cand_sel = (cand_sads if chroma_sad is None else
                    [s + chroma_sad(f)
                     for s, f in zip(cand_sads, cand_mvs)])
        all_sads = jnp.stack(cand_sads)
        all_mvs = jnp.stack(cand_mvs)
        biased = (jnp.stack(cand_sel)
                  - jnp.asarray(cand_bias, jnp.int32)[:, None, None])
        best = jnp.argmin(biased, axis=0)                # (nby, nbx)
        mv = jnp.take_along_axis(all_mvs, best[None, ..., None], axis=0)[0]
        sad = jnp.take_along_axis(all_sads, best[None], axis=0)[0]
        if n_extra:
            # injected candidates are uniform vectors: a local rescan
            # recovers per-block detail around the winner (the hierarchy
            # and median candidates are already locally refined)
            my, mx, sad = refine_dispatch(cb, P, mv[..., 0], mv[..., 1],
                                          nby, nbx, ybsep, xbsep, 1,
                                          bound=ME_BOUND_PEL)
            mv = jnp.stack([my, mx], axis=-1)
        return mv[..., 0], mv[..., 1], sad

    return me


def make_subpel_refine(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
                       mv_precision):
    import jax as _jax
    return _jax.jit(make_subpel_body(H, W, xbsep, ybsep, x_num_blocks,
                                     y_num_blocks, mv_precision))


# per-level static candidate tables for the patch formulation.
# At level l the incoming mv has been scaled x2 (so it is even); the
# candidate offset d maps to a patch offset delta (relative to the base
# half-pel origin (mv << (3-l) >> 2) - 1) and a bilinear fraction r.
# Level 3 needs two variants switched on (mv & 3) == 2 (mv quarter parity).
#   entries: d -> (delta, frac)           [levels 1, 2]
#   entries: d -> ((delta0, frac0), (delta2, frac2))   [level 3]
_SUBPEL_LVL = {
    1: {-1: (0, 0), 0: (1, 0), 1: (2, 0)},
    2: {-1: (0, 2), 0: (1, 0), 1: (1, 2)},
    3: {-1: ((0, 3), (1, 1)), 0: ((1, 0), (1, 2)), 1: ((1, 1), (1, 3))},
}


def make_subpel_body(H, W, xbsep, ybsep, x_num_blocks, y_num_blocks,
                     mv_precision):
    """Raw sub-pel refinement body: full-pel MVs -> 1/2^prec-pel MVs.

    (cur u8, up (2h,2w) u8, dy, dx) -> (mv_y, mv_x, best_sad).

    Successively scales to each precision level and scans the 3x3 sub-pel
    neighborhood with the renderer's exact fetch semantics
    (schromotionest.c:133-246 analog), formulated on per-block patches of
    the padded half-pel plane — all candidates are static strided views,
    no per-pixel gathers."""
    pad_h = ybsep * y_num_blocks
    pad_w = xbsep * x_num_blocks
    nby, nbx = y_num_blocks, x_num_blocks
    ph = _round8(2 * ybsep + 4)
    pw = _round8(2 * xbsep + 4)
    margin = 2 * ME_BOUND_PEL + max(ph, pw) + 16

    def bilerp(pat, dy_off, dx_off, ry, rx, bs_y, bs_x):
        """Sample block grid from patches at static half-pel offset
        (dy_off, dx_off) and static fraction (ry, rx)."""
        p00 = pat[:, dy_off:dy_off + 2 * bs_y:2, dx_off:dx_off + 2 * bs_x:2]
        if ry == 0 and rx == 0:
            return p00
        p01 = pat[:, dy_off:dy_off + 2 * bs_y:2,
                  dx_off + 1:dx_off + 1 + 2 * bs_x:2]
        p10 = pat[:, dy_off + 1:dy_off + 1 + 2 * bs_y:2,
                  dx_off:dx_off + 2 * bs_x:2]
        p11 = pat[:, dy_off + 1:dy_off + 1 + 2 * bs_y:2,
                  dx_off + 1:dx_off + 1 + 2 * bs_x:2]
        v = ((4 - ry) * (4 - rx) * p00 + (4 - ry) * rx * p01
             + ry * (4 - rx) * p10 + ry * rx * p11)
        return (v + 8) >> 4

    def refine(cur, up, dy_full, dx_full):
        c = jnp.pad(cur, ((0, pad_h - H), (0, pad_w - W)),
                    mode="edge").astype(jnp.int32)
        cb = _to_blocks(c, nby, ybsep, nbx, xbsep)
        P = pad_halfpel(up, margin, margin)
        Ph, Pw = P.shape
        mv_y = jnp.clip(dy_full, -ME_BOUND_PEL, ME_BOUND_PEL)
        mv_x = jnp.clip(dx_full, -ME_BOUND_PEL, ME_BOUND_PEL)
        best_sad = None
        for level in range(1, mv_precision + 1):
            mv_y = mv_y * 2
            mv_x = mv_x * 2
            sh = 3 - level
            # base half-pel origin per block (mv even -> exact)
            oy0 = ((mv_y << sh) >> 2) - 1
            ox0 = ((mv_x << sh) >> 2) - 1
            by = (2 * (jnp.arange(nby) * ybsep)[:, None] + oy0 + margin)
            bx = (2 * (jnp.arange(nbx) * xbsep)[None, :] + ox0 + margin)
            oy = jnp.clip(jnp.broadcast_to(by, (nby, nbx)).ravel(),
                          0, Ph - ph)
            ox = jnp.clip(jnp.broadcast_to(bx, (nby, nbx)).ravel(),
                          0, Pw - pw)

            def slc(a, b):
                return jax.lax.dynamic_slice(P, (a, b), (ph, pw))

            pat = jax.vmap(slc)(oy, ox).astype(jnp.int32)

            if level < 3:
                tab = _SUBPEL_LVL[level]

                def sample(dy_c, dx_c):
                    ofy, ry = tab[dy_c]
                    ofx, rx = tab[dx_c]
                    return bilerp(pat, ofy, ofx, ry, rx, ybsep, xbsep)
            else:
                tab = _SUBPEL_LVL[3]
                py2 = ((mv_y & 3) == 2).ravel()[:, None, None]
                px2 = ((mv_x & 3) == 2).ravel()[:, None, None]

                def sample(dy_c, dx_c):
                    (oy0a, ry0), (oy2a, ry2) = tab[dy_c]
                    (ox0a, rx0), (ox2a, rx2) = tab[dx_c]
                    v00 = bilerp(pat, oy0a, ox0a, ry0, rx0, ybsep, xbsep)
                    v02 = bilerp(pat, oy0a, ox2a, ry0, rx2, ybsep, xbsep)
                    v20 = bilerp(pat, oy2a, ox0a, ry2, rx0, ybsep, xbsep)
                    v22 = bilerp(pat, oy2a, ox2a, ry2, rx2, ybsep, xbsep)
                    v0 = jnp.where(px2, v02, v00)
                    v2 = jnp.where(px2, v22, v20)
                    return jnp.where(py2, v2, v0)

            sads = []
            offs = []
            for dy_c in (-1, 0, 1):
                for dx_c in (-1, 0, 1):
                    v = sample(dy_c, dx_c)
                    sads.append(jnp.abs(cb - v).sum((1, 2)))
                    offs.append((dy_c, dx_c))
            s = jnp.stack(sads)
            best = jnp.argmin(s, axis=0)
            doy = jnp.asarray([o[0] for o in offs], jnp.int32)[best]
            dox = jnp.asarray([o[1] for o in offs], jnp.int32)[best]
            mv_y = mv_y + doy.reshape(nby, nbx)
            mv_x = mv_x + dox.reshape(nby, nbx)
            best_sad = jnp.min(s, axis=0).reshape(nby, nbx)
        return mv_y, mv_x, best_sad

    return refine
