"""Dirac inter (long-GOP) picture encoder — TPU-first own design.

Produces standard Dirac streams (decodable by the reference decoder); unlike
the byte-exact intra/low-delay paths, the encoder-side decisions (ME, mode,
split) are our own TPU-native algorithms. The render/reconstruction path
reuses the decoder's bit-exact OBMC + wavelet kernels, so encoder and
decoder reconstructions agree exactly.

Per-picture flow:
  TPU: hierarchical ME -> mode decision stats -> OBMC prediction ->
       residual -> forward IWT
  C++: MV entropy coding, subband quantise + arith coding
  TPU: dequant path reconstruction (IIWT + pred + clamp) for reference frames
"""
from __future__ import annotations

import sys
import time
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu.bitstream import (BitWriter, parse_code_picture,
                                        write_parse_info, write_picture_header)
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding import subband as sb
from schroedinger_tpu.decoder.core import RefFrame, _combine
from schroedinger_tpu.decoder.lowdelay import _inverse_jit
from schroedinger_tpu.encoder import me as me_mod
from schroedinger_tpu.encoder.lowdelay import _forward_jit
from schroedinger_tpu import tables
from schroedinger_tpu.ops import obmc
from schroedinger_tpu.utils import toggles as _toggles
from schroedinger_tpu.params import Params, subband_count, subband_position

try:
    from schroedinger_tpu.coding import native as _native
except Exception:  # pragma: no cover
    _native = None

_ME_CACHE = {}


def _get_me(p: Params, n_extra: int = 0):
    pw, ph = p.video_format.picture_luma_size()
    key = (pw, ph, p.xbsep_luma, p.ybsep_luma,
           p.x_num_blocks, p.y_num_blocks, n_extra)
    fn = _ME_CACHE.get(key)
    if fn is None:
        fn = me_mod.make_me_fn(ph, pw, p.xbsep_luma,
                               p.ybsep_luma, p.x_num_blocks, p.y_num_blocks,
                               n_extra=n_extra)
        _ME_CACHE[key] = fn
    return fn


N_PHASECORR_CANDS = 8


def _phasecorr_candidates(p: Params, cur_y, ref_y):
    """Phase-correlation candidate vectors for this frame pair (device)."""
    from schroedinger_tpu.encoder import phasecorr as pcm
    pw, ph = p.video_format.picture_luma_size()
    key = ("pc", pw, ph)
    fn = _ME_CACHE.get(key)
    if fn is None:
        fn = pcm.make_phasecorr_fn(ph, pw)
        _ME_CACHE[key] = fn
    vecs = fn(cur_y, ref_y)
    return jnp.asarray(
        pcm.pick_candidates(np.asarray(vecs), n=N_PHASECORR_CANDS))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _dc_stats(cur_y, ybsep, xbsep, ynb, xnb):
    """Per-block SAD of the DC (mean) prediction + block means.

    (The MC SAD now comes straight from the patch-based ME/subpel refine,
    so no reference sampling happens here.)"""
    H = ybsep * ynb
    W = xbsep * xnb
    h, w = cur_y.shape
    c = jnp.pad(cur_y, ((0, H - h), (0, W - w)), mode="edge").astype(jnp.int32)
    bmean = c.reshape(ynb, ybsep, xnb, xbsep).mean(axis=(1, 3))
    bmean_i = jnp.round(bmean).astype(jnp.int32)
    sad_dc = jnp.abs(c - jnp.repeat(jnp.repeat(bmean_i, ybsep, 0), xbsep, 1)
                     ).reshape(ynb, ybsep, xnb, xbsep).sum((1, 3))
    return sad_dc, bmean_i


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _block_means(plane, dummy, bsep_y, bsep_x, ynb, xnb):
    H, W = bsep_y * ynb, bsep_x * xnb
    h, w = plane.shape
    c = jnp.pad(plane, ((0, H - h), (0, W - w)), mode="edge").astype(jnp.int32)
    m = c.reshape(ynb, bsep_y, xnb, bsep_x).mean(axis=(1, 3))
    return jnp.round(m).astype(jnp.int32)


def _band_shapes(oh: int, ow: int, depth: int):
    """Static (h, w) of each Mallat subband in Dirac index order."""
    from schroedinger_tpu.params import subband_info
    shapes = [(oh >> depth, ow >> depth)]
    for i in range(1, subband_count(depth)):
        level, _ = subband_info(i, depth)
        shapes.append((oh >> (level + 1), ow >> (level + 1)))
    return shapes


def _get_p_pipeline(p: Params, want_recon: bool):
    """Fused device pipeline for inter residual coding. Three jitted fns:

      transform(y, u, v, pred_y, pred_u, pred_v) -> 3 flat int16 band arrays
      rc_bits(f_y, f_u, f_v) -> (61,) coded-bit estimate per base index
      quant_recon(f_y, f_u, f_v, preds..., qi_bands) ->
          3 flat int16 quantised arrays [+ 3 u8 recon planes if want_recon]

    The flats and reconstruction never leave the device except for the one
    batched quantised-data fetch the host entropy coder needs; qi_bands is a
    traced (nb,) vector so rate-control choices don't recompile.  Replaces
    the reference's per-subband host quantise/IIWT round trips
    (schroencoder.c:3798-4072) with whole-frame TPU programs.
    """
    vf = p.video_format
    depth = p.transform_depth
    wavelet = p.wavelet_filter_index
    key = ("pq",) + vf.picture_luma_size() + (depth, int(wavelet),
           vf.chroma_format, want_recon)
    hit = _ME_CACHE.get(key)
    if hit is not None:
        return hit

    from schroedinger_tpu import tables
    from schroedinger_tpu.ops import quant as q
    from schroedinger_tpu.ops import wavelet as wv

    nb = subband_count(depth)
    qm = np.asarray(p.quant_matrix[:nb], np.int32)
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]
    pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                 vf.picture_chroma_size()]
    shapes3 = [_band_shapes(oh, ow, depth) for (oh, ow) in iwt_dims]
    sizes3 = [np.asarray([h * w for (h, w) in shapes], np.int64)
              for shapes in shapes3]
    QF = jnp.asarray(tables.QUANT_FACTOR, jnp.int32)
    QO = jnp.asarray(tables.QUANT_OFFSET_3_8, jnp.int32)

    def transform(y, u, v, py, pu, pv):
        flats = []
        for plane, pred, (oh, ow) in zip((y, u, v), (py, pu, pv), iwt_dims):
            h, w = plane.shape
            res = plane.astype(jnp.int16) - 128 - pred.astype(jnp.int16)
            res = jnp.pad(res, ((0, oh - h), (0, ow - w)))
            pyr = wv.forward(res, depth, wavelet)
            flat, _ = sl.flatten_pyramid(pyr, depth)
            flats.append(flat)
        return tuple(flats)

    def rc_bits(fy, fu, fv):
        from schroedinger_tpu.encoder.ratecontrol import _sint_bits
        flat = jnp.concatenate([fy, fu, fv]).astype(jnp.int32)
        # per-coefficient quant-matrix offsets as a precomputed numpy
        # constant: jnp.repeat with array repeats lowers to a full-length
        # cumsum whose log-step reduce-windows cost minutes of XLA
        # constant folding at HD shapes
        qmo = jnp.asarray(np.concatenate(
            [np.repeat(qm, sizes) for sizes in sizes3]))

        def one(base):
            qi = jnp.clip(base - qmo, 0, 60)
            qq = q.quantise(flat, QF[qi], QO[qi])
            return _sint_bits(qq).astype(jnp.float32).sum().astype(jnp.int32)

        return jax.lax.map(one, jnp.arange(61, dtype=jnp.int32))

    # per-coefficient band ids (numpy constants; see rc_bits note)
    band_id3 = [np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
                for sizes in sizes3]

    def quant_recon(fy, fu, fv, py, pu, pv, qi_bands):
        outq = []
        outr = []
        for f, pred, shapes, sizes, band_id, (wpic, hpic) in zip(
                (fy, fu, fv), (py, pu, pv), shapes3, sizes3, band_id3,
                pic_sizes):
            qf = QF[qi_bands][band_id]
            qo = QO[qi_bands][band_id]
            qq = q.quantise(f, qf, qo)
            outq.append(qq.astype(jnp.int16))
            if want_recon:
                dq = q.dequantise(qq, qf, qo).astype(jnp.int16)
                bands = []
                pos = 0
                for (h, w) in shapes:
                    bands.append(dq[pos:pos + h * w].reshape(h, w))
                    pos += h * w
                rpyr = sl.arrays_to_pyramid(bands, depth)
                rres = wv.inverse(rpyr, wavelet)
                rec = (rres[:hpic, :wpic].astype(jnp.int32)
                       + pred.astype(jnp.int32) + 128)
                outr.append(jnp.clip(rec, 0, 255).astype(jnp.uint8))
        return tuple(outq) + tuple(outr)

    fns = (jax.jit(transform), jax.jit(rc_bits), jax.jit(quant_recon),
           shapes3)
    _ME_CACHE[key] = fns
    return fns


def _derive_splits_dev(keys, ynb, xnb):
    """Device analog of _derive_splits: keys (ynb, xnb, K) int32 ->
    (ynb, xnb) split field (0/1/2 by intra-superblock equality)."""
    Y, X = ynb // 4, xnb // 4
    b = keys.reshape(Y, 4, X, 4, keys.shape[-1]).transpose(0, 2, 1, 3, 4)
    eq0 = (b == b[:, :, :1, :1, :]).all(axis=(-3, -2, -1))
    q = b.reshape(Y, X, 2, 2, 2, 2, keys.shape[-1])  # (qy, iy, qx, ix, K)
    eq1 = (q == q[:, :, :, :1, :, :1, :]).all(axis=(3, 5, 6)).all(axis=(2, 3))
    split = jnp.where(eq0, 0, jnp.where(eq1, 1, 2)).astype(jnp.int32)
    return jnp.repeat(jnp.repeat(split, 4, axis=0), 4, axis=1)


def make_rd_split_body(p: Params, granularities: bool = True):
    """Per-superblock RD split + mode search — TPU-native replacement for
    the reference's schro_mode_decision (schromotionest.c:520-695 and the
    split-level cost search, entropy estimators schromotionest.h:98-106).

    Evaluates DC-vs-MC prediction cost at three granularities — per block
    (split 2), per 2x2 quad (split 1), per superblock (split 0) — and picks,
    for each superblock, the granularity minimising
        sum(distortion) + lambda * estimated_bits.
    Aggregate-MV distortion is measured at full pel on the pel reference
    (a pure decision heuristic; the coded unit MV keeps subpel precision).
    MV bits are charged against the superblock-mean vector as a stand-in
    for the median predictor.  All candidate evaluation is dense patch
    work (one batched dynamic-slice per granularity) — no per-pixel
    gathers, per the TPU playbook.

    Returned traceable body:
        body(c, ref_y, dy, dx, sad_mc, sad_dc, mean_y, mean_u, mean_v, lam)
          -> full MV-field dict (split/pred_mode/dx1/dy1/dc0..2/...)
    where c is the edge-padded int32 luma on the block grid and
    dy/dx are per-block MVs in 1/2^prec-pel units.
    """
    ynb, xnb = p.y_num_blocks, p.x_num_blocks
    ybsep, xbsep = p.ybsep_luma, p.xbsep_luma
    prec = p.mv_precision
    pad_h, pad_w = ybsep * ynb, xbsep * xnb
    margin = me_mod.ME_BOUND_PEL + 16
    B = me_mod.ME_BOUND_PEL

    def pool2(a):  # 2x2 sum
        return a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2).sum((1, 3))

    def iavg(a, n):  # rounded integer mean of an n-sum
        return jnp.round(a.astype(jnp.float32) / n).astype(jnp.int32)

    def sbits(v):  # exp-Golomb sint size (matches ratecontrol._sint_bits)
        m = jnp.abs(v.astype(jnp.int32))
        n = 32 - jax.lax.clz(m + 1)
        return (2 * n - 1 + (m != 0)).astype(jnp.float32)

    def e2(a):
        return jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)

    def e4(a):
        return jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)

    def body(c, ref_y, dy, dx, sad_mc, sad_dc, mean_y, mean_u, mean_v, lam):
        f32 = jnp.float32
        if not granularities:
            # enable_bigblock_estimation off: per-block modes only, no
            # quad/superblock RD split (split stays 2 everywhere)
            mc = (sad_mc * 10 < sad_dc * 11).astype(jnp.int32)
            zero = jnp.zeros_like(mc)
            return {
                "split": jnp.full_like(mc, 2),
                "pred_mode": mc,
                "using_global": zero,
                "dx1": dx * mc, "dy1": dy * mc,
                "dx2": zero, "dy2": zero,
                "dc0": jnp.clip(mean_y - 128, -128, 127) * (1 - mc),
                "dc1": jnp.clip(mean_u - 128, -128, 127) * (1 - mc),
                "dc2": jnp.clip(mean_v - 128, -128, 127) * (1 - mc),
            }
        # aggregate MVs per quad / superblock (subpel units)
        qdy, qdx = iavg(pool2(dy), 4), iavg(pool2(dx), 4)
        sdy, sdx = iavg(pool2(pool2(dy)), 16), iavg(pool2(pool2(dx)), 16)

        def to_fullpel(v):
            if prec == 0:
                return v
            return jnp.round(v.astype(f32) / (1 << prec)).astype(jnp.int32)

        h, w = ref_y.shape
        rp = jnp.pad(ref_y, ((0, pad_h - h), (0, pad_w - w)), mode="edge")
        P = jnp.pad(rp, ((margin, margin), (margin, margin)), mode="edge")

        # MC SAD of the aggregate vectors, evaluated at unit granularity.
        # The clips below are load-bearing for the gather margin only:
        # block MVs are bounded to +-ME_BOUND_PEL by the ME, so their
        # means never exceed B and the measured vector always equals the
        # coded (unclipped subpel) aggregate — if ME bounds ever grow past
        # `margin`, widen margin rather than relying on the clip.
        cbq = me_mod._to_blocks(c, ynb // 2, 2 * ybsep, xnb // 2, 2 * xbsep)
        _, _, sad_q = me_mod._patch_refine(
            cbq, P, jnp.clip(to_fullpel(qdy), -B, B),
            jnp.clip(to_fullpel(qdx), -B, B),
            ynb // 2, xnb // 2, 2 * ybsep, 2 * xbsep, 0, margin)
        cbs = me_mod._to_blocks(c, ynb // 4, 4 * ybsep, xnb // 4, 4 * xbsep)
        _, _, sad_s = me_mod._patch_refine(
            cbs, P, jnp.clip(to_fullpel(sdy), -B, B),
            jnp.clip(to_fullpel(sdx), -B, B),
            ynb // 4, xnb // 4, 4 * ybsep, 4 * xbsep, 0, margin)

        # DC SAD at quad / superblock granularity (vs the unit mean)
        cq = c.reshape(ynb // 2, 2 * ybsep, xnb // 2, 2 * xbsep)
        mq = jnp.round(cq.mean((1, 3))).astype(jnp.int32)
        sad_dc_q = jnp.abs(cq - mq[:, None, :, None]).sum((1, 3))
        cs = c.reshape(ynb // 4, 4 * ybsep, xnb // 4, 4 * xbsep)
        ms = jnp.round(cs.mean((1, 3))).astype(jnp.int32)
        sad_dc_s = jnp.abs(cs - ms[:, None, :, None]).sum((1, 3))

        # unit DC values (chroma units = mean of block means)
        def dcs(my, mu, mv_):
            return (jnp.clip(my - 128, -128, 127),
                    jnp.clip(mu - 128, -128, 127),
                    jnp.clip(mv_ - 128, -128, 127))

        d0, d1, d2 = dcs(mean_y, mean_u, mean_v)
        d0q, d1q, d2q = dcs(mq, iavg(pool2(mean_u), 4), iavg(pool2(mean_v), 4))
        d0s, d1s, d2s = dcs(ms, iavg(pool2(pool2(mean_u)), 16),
                            iavg(pool2(pool2(mean_v)), 16))

        # per-granularity mode: MC wins unless DC is >=10% better (the
        # 1.1 factor is the DC-distortion penalty, mirroring the
        # reference's magic_dc_metric_offset bias toward MC; integer form
        # of sad_mc < sad_dc * 1.1)
        mc2 = (sad_mc * 10 < sad_dc * 11).astype(jnp.int32)
        mcq = (sad_q * 10 < sad_dc_q * 11).astype(jnp.int32)
        mcs = (sad_s * 10 < sad_dc_s * 11).astype(jnp.int32)

        sdy_b, sdx_b = e4(sdy), e4(sdx)
        bits2 = 1 + jnp.where(mc2 == 1,
                              sbits(dy - sdy_b) + sbits(dx - sdx_b),
                              sbits(d0) + sbits(d1) + sbits(d2))
        sdy_q, sdx_q = e2(sdy), e2(sdx)  # super grid -> quad grid
        bits1 = 1 + jnp.where(mcq == 1,
                              sbits(qdy - sdy_q) + sbits(qdx - sdx_q),
                              sbits(d0q) + sbits(d1q) + sbits(d2q))
        bits0 = 1 + jnp.where(mcs == 1, sbits(sdy) + sbits(sdx),
                              sbits(d0s) + sbits(d1s) + sbits(d2s))

        dist2 = jnp.where(mc2 == 1, sad_mc.astype(f32),
                          sad_dc.astype(f32) * 1.1)
        dist1 = jnp.where(mcq == 1, sad_q.astype(f32),
                          sad_dc_q.astype(f32) * 1.1)
        dist0 = jnp.where(mcs == 1, sad_s.astype(f32),
                          sad_dc_s.astype(f32) * 1.1)

        cost2 = pool2(pool2(dist2 + lam * bits2))
        cost1 = pool2(dist1 + lam * bits1)
        cost0 = dist0 + lam * bits0
        split_sb = jnp.argmin(jnp.stack([cost0, cost1, cost2]),
                              axis=0).astype(jnp.int32)

        sb = e4(split_sb)

        def sel(blk, quad, sup):
            return jnp.where(sb == 2, blk,
                             jnp.where(sb == 1, e2(quad), e4(sup)))

        mc = sel(mc2, mcq, mcs)
        zero = jnp.zeros((ynb, xnb), jnp.int32)
        return {
            "split": sb,
            "pred_mode": mc,
            "using_global": zero,
            "dx1": sel(dx, qdx, sdx) * mc,
            "dy1": sel(dy, qdy, sdy) * mc,
            "dx2": zero,
            "dy2": zero,
            "dc0": sel(d0, d0q, d0s) * (1 - mc),
            "dc1": sel(d1, d1q, d1s) * (1 - mc),
            "dc2": sel(d2, d2q, d2s) * (1 - mc),
        }

    return body


def make_rd_split_body2(p: Params, granularities: bool = True):
    """Two-reference RD split + mode search (the tworef-engine analog of
    make_rd_split_body; candidate modes DC/ref1/ref2/biref as the
    reference's schro_mode_decision over SchroMotionField per mode,
    schromotionest.c:520-695).

    body(c, P1, P2, dy1, dx1, sad1, dy2, dx2, sad2, sad_dc,
         mean_y, mean_u, mean_v, lam) -> MV-field dict
    where c is the edge-padded int32 luma on the block grid, P1/P2 are the
    margin-padded pel references, dyN/dxN per-block MVs in subpel units
    with per-ref SADs from the subpel refine.  Mode selection happens at
    all three granularities; distortion for aggregate vectors and for the
    biref average is measured at full pel (decision heuristic; coded MVs
    keep subpel precision)."""
    ynb, xnb = p.y_num_blocks, p.x_num_blocks
    ybsep, xbsep = p.ybsep_luma, p.xbsep_luma
    prec = p.mv_precision
    margin = me_mod.ME_BOUND_PEL + 16
    B = me_mod.ME_BOUND_PEL

    def pool2(a):
        return a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2).sum((1, 3))

    def iavg(a, n):
        return jnp.round(a.astype(jnp.float32) / n).astype(jnp.int32)

    def sbits(v):
        m = jnp.abs(v.astype(jnp.int32))
        n = 32 - jax.lax.clz(m + 1)
        return (2 * n - 1 + (m != 0)).astype(jnp.float32)

    def e2(a):
        return jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)

    def e4(a):
        return jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)

    def to_fullpel(v):
        if prec == 0:
            return v
        return jnp.round(v.astype(jnp.float32) / (1 << prec)).astype(jnp.int32)

    def body(c, P1, P2, dy1, dx1, sad1, dy2, dx2, sad2, sad_dc,
             mean_y, mean_u, mean_v, lam):
        f32 = jnp.float32

        def clipf(v):
            return jnp.clip(to_fullpel(v), -B, B)

        if not granularities:
            # per-block 4-way mode pick only (no quad/superblock split)
            cb2_ = me_mod._to_blocks(c, ynb, ybsep, xnb, xbsep)
            p1 = me_mod._extract_ref_patches(P1, clipf(dy1), clipf(dx1),
                                             ynb, xnb, ybsep, xbsep, 0,
                                             margin)
            p2 = me_mod._extract_ref_patches(P2, clipf(dy2), clipf(dx2),
                                             ynb, xnb, ybsep, xbsep, 0,
                                             margin)
            avg = (p1[:, :ybsep, :xbsep] + p2[:, :ybsep, :xbsep] + 1) >> 1
            sad_bi_ = jnp.abs(cb2_ - avg).sum((1, 2)).reshape(ynb, xnb)
            costs = jnp.stack([sad_dc.astype(f32) * 1.1, sad1.astype(f32),
                               sad2.astype(f32),
                               sad_bi_.astype(f32) * 0.95])
            mode = jnp.argmin(costs, axis=0).astype(jnp.int32)
            use1 = ((mode & 1) != 0).astype(jnp.int32)
            use2 = ((mode & 2) != 0).astype(jnp.int32)
            is_dc = (mode == 0).astype(jnp.int32)
            zero = jnp.zeros((ynb, xnb), jnp.int32)
            return {
                "split": jnp.full((ynb, xnb), 2, jnp.int32),
                "pred_mode": mode,
                "using_global": zero,
                "dx1": dx1 * use1, "dy1": dy1 * use1,
                "dx2": dx2 * use2, "dy2": dy2 * use2,
                "dc0": jnp.clip(mean_y - 128, -128, 127) * is_dc,
                "dc1": jnp.clip(mean_u - 128, -128, 127) * is_dc,
                "dc2": jnp.clip(mean_v - 128, -128, 127) * is_dc,
            }

        # current blocks at the three granularities
        cb2 = me_mod._to_blocks(c, ynb, ybsep, xnb, xbsep)
        cb1 = me_mod._to_blocks(c, ynb // 2, 2 * ybsep, xnb // 2, 2 * xbsep)
        cb0 = me_mod._to_blocks(c, ynb // 4, 4 * ybsep, xnb // 4, 4 * xbsep)

        def gran_sads(dy, dx, P):
            """(quad, super) MC SADs of aggregated vectors vs ref P."""
            qdy, qdx = iavg(pool2(dy), 4), iavg(pool2(dx), 4)
            sdy, sdx = iavg(pool2(pool2(dy)), 16), iavg(pool2(pool2(dx)), 16)
            _, _, sq = me_mod._patch_refine(
                cb1, P, clipf(qdy), clipf(qdx), ynb // 2, xnb // 2,
                2 * ybsep, 2 * xbsep, 0, margin)
            _, _, ss = me_mod._patch_refine(
                cb0, P, clipf(sdy), clipf(sdx), ynb // 4, xnb // 4,
                4 * ybsep, 4 * xbsep, 0, margin)
            return (qdy, qdx, sq), (sdy, sdx, ss)

        (q1y, q1x, sad1_q), (s1y, s1x, sad1_s) = gran_sads(dy1, dx1, P1)
        (q2y, q2x, sad2_q), (s2y, s2x, sad2_s) = gran_sads(dy2, dx2, P2)

        def bi_sad(cb, m1y, m1x, m2y, m2x, nby, nbx, bs_y, bs_x):
            p1 = me_mod._extract_ref_patches(P1, clipf(m1y), clipf(m1x),
                                             nby, nbx, bs_y, bs_x, 0, margin)
            p2 = me_mod._extract_ref_patches(P2, clipf(m2y), clipf(m2x),
                                             nby, nbx, bs_y, bs_x, 0, margin)
            avg = (p1[:, :bs_y, :bs_x] + p2[:, :bs_y, :bs_x] + 1) >> 1
            return jnp.abs(cb - avg).sum((1, 2)).reshape(nby, nbx)

        sad_bi = bi_sad(cb2, dy1, dx1, dy2, dx2, ynb, xnb, ybsep, xbsep)
        sad_bi_q = bi_sad(cb1, q1y, q1x, q2y, q2x, ynb // 2, xnb // 2,
                          2 * ybsep, 2 * xbsep)
        sad_bi_s = bi_sad(cb0, s1y, s1x, s2y, s2x, ynb // 4, xnb // 4,
                          4 * ybsep, 4 * xbsep)

        # DC SADs at quad / superblock granularity
        cq = c.reshape(ynb // 2, 2 * ybsep, xnb // 2, 2 * xbsep)
        mq = jnp.round(cq.mean((1, 3))).astype(jnp.int32)
        sad_dc_q = jnp.abs(cq - mq[:, None, :, None]).sum((1, 3))
        cs = c.reshape(ynb // 4, 4 * ybsep, xnb // 4, 4 * xbsep)
        ms = jnp.round(cs.mean((1, 3))).astype(jnp.int32)
        sad_dc_s = jnp.abs(cs - ms[:, None, :, None]).sum((1, 3))

        def dcs(my, mu, mv_):
            return (jnp.clip(my - 128, -128, 127),
                    jnp.clip(mu - 128, -128, 127),
                    jnp.clip(mv_ - 128, -128, 127))

        d = dcs(mean_y, mean_u, mean_v)
        dq = dcs(mq, iavg(pool2(mean_u), 4), iavg(pool2(mean_v), 4))
        ds = dcs(ms, iavg(pool2(pool2(mean_u)), 16),
                 iavg(pool2(pool2(mean_v)), 16))

        # predicted-vector stand-in: superblock mean per ref
        s1y_b, s1x_b = e4(s1y), e4(s1x)
        s2y_b, s2x_b = e4(s2y), e4(s2x)

        def mode_cost(sdc, sr1, sr2, sbi, bits_dc, bits_r1, bits_r2, lam_):
            """4-way mode pick; returns (mode, dist, bits)."""
            c_dc = sdc.astype(f32) * 1.1 + lam_ * bits_dc
            c_r1 = sr1.astype(f32) + lam_ * bits_r1
            c_r2 = sr2.astype(f32) + lam_ * bits_r2
            c_bi = sbi.astype(f32) * 0.95 + lam_ * (bits_r1 + bits_r2)
            costs = jnp.stack([c_dc, c_r1, c_r2, c_bi])
            mode = jnp.argmin(costs, axis=0).astype(jnp.int32)
            return mode, jnp.min(costs, axis=0)

        bits_dc2 = 2 + sbits(d[0]) + sbits(d[1]) + sbits(d[2])
        bits_r1_2 = 2 + sbits(dy1 - s1y_b) + sbits(dx1 - s1x_b)
        bits_r2_2 = 2 + sbits(dy2 - s2y_b) + sbits(dx2 - s2x_b)
        mode2, cost2 = mode_cost(sad_dc, sad1, sad2, sad_bi,
                                 bits_dc2, bits_r1_2, bits_r2_2, lam)

        bits_dc1 = 2 + sbits(dq[0]) + sbits(dq[1]) + sbits(dq[2])
        bits_r1_1 = 2 + sbits(q1y - e2(s1y)) + sbits(q1x - e2(s1x))
        bits_r2_1 = 2 + sbits(q2y - e2(s2y)) + sbits(q2x - e2(s2x))
        mode1, cost1 = mode_cost(sad_dc_q, sad1_q, sad2_q, sad_bi_q,
                                 bits_dc1, bits_r1_1, bits_r2_1, lam)

        bits_dc0 = 2 + sbits(ds[0]) + sbits(ds[1]) + sbits(ds[2])
        bits_r1_0 = 2 + sbits(s1y) + sbits(s1x)
        bits_r2_0 = 2 + sbits(s2y) + sbits(s2x)
        mode0, cost0 = mode_cost(sad_dc_s, sad1_s, sad2_s, sad_bi_s,
                                 bits_dc0, bits_r1_0, bits_r2_0, lam)

        split_sb = jnp.argmin(jnp.stack([cost0, pool2(cost1),
                                         pool2(pool2(cost2))]),
                              axis=0).astype(jnp.int32)
        sb = e4(split_sb)

        def sel(blk, quad, sup):
            return jnp.where(sb == 2, blk,
                             jnp.where(sb == 1, e2(quad), e4(sup)))

        mode = sel(mode2, mode1, mode0)
        use1 = ((mode & 1) != 0).astype(jnp.int32)
        use2 = ((mode & 2) != 0).astype(jnp.int32)
        is_dc = (mode == 0).astype(jnp.int32)
        zero = jnp.zeros((ynb, xnb), jnp.int32)
        return {
            "split": sb,
            "pred_mode": mode,
            "using_global": zero,
            "dx1": sel(dx1, q1x, s1x) * use1,
            "dy1": sel(dy1, q1y, s1y) * use1,
            "dx2": sel(dx2, q2x, s2x) * use2,
            "dy2": sel(dy2, q2y, s2y) * use2,
            "dc0": sel(d[0], dq[0], ds[0]) * is_dc,
            "dc1": sel(d[1], dq[1], ds[1]) * is_dc,
            "dc2": sel(d[2], dq[2], ds[2]) * is_dc,
        }

    return body


_P_FIELD_ORDER = ("split", "pred_mode", "using_global", "dx1", "dy1",
                  "dx2", "dy2", "dc0", "dc1", "dc2")

# Tunnel failure wordings observed to be retryable (a dropped response to
# a compile RPC, not a dead worker).  "TPU worker process crashed" is
# deliberately NOT here: a crashed worker needs backend re-creation, a
# retry of the same dispatch can't succeed.
_TRANSIENT_TUNNEL_SUBSTRINGS = ("remote_compile", "DEADLINE_EXCEEDED",
                                "Deadline Exceeded", "Connection reset",
                                "Socket closed")

import os as _os
_STATS_DEBUG = bool(_os.environ.get("SCHRO_TPU_STATS_DEBUG"))
_SYNC_DEBUG = bool(_os.environ.get("SCHRO_TPU_SYNC_DEBUG"))
_DUMP_STAGE = (_os.environ["SCHRO_TPU_DUMP_STAGE"].split(":", 1)
               if _os.environ.get("SCHRO_TPU_DUMP_STAGE") else None)


def _is_transient_tunnel_error(e: Exception) -> bool:
    msg = str(e)
    return any(s in msg for s in _TRANSIENT_TUNNEL_SUBSTRINGS)


def _real_sync(xs, max_bytes: int = 4 << 20) -> None:
    """Wait for device work to ACTUALLY complete.

    jax.block_until_ready does not round-trip the axon tunnel (measured:
    it returns in ~10ms for a 1080p program whose execution later turns
    out to fault), so quiescing the device before a remote compile needs
    a real device_get.  One fetched output leaf implies its whole
    program completed; leaves larger than max_bytes are skipped (their
    producers are either host uploads or programs whose other leaves get
    fetched)."""
    leaves = [x for x in jax.tree_util.tree_leaves(xs)
              if hasattr(x, "addressable_shards") or hasattr(x, "dtype")]
    small = [x for x in leaves
             if getattr(x, "size", 0) * np.dtype(
                 getattr(x, "dtype", np.uint8)).itemsize <= max_bytes]
    if not small and leaves:
        small = [min(leaves, key=lambda x: getattr(x, "size", 0))]
    for x in small:
        try:
            jax.device_get(x)
        except AttributeError:
            pass


def _log_stage_retry(tag: str, attempt: int, e: Exception) -> None:
    """Surface what was caught so non-matching transient failures are
    visible and the substring filter can be tuned (advisor r4)."""
    print(f"schroedinger_tpu: retrying stage {tag!r} "
          f"(attempt {attempt + 1}) after transient tunnel error: "
          f"{str(e).splitlines()[0][:200]}", file=sys.stderr, flush=True)


def _p_step_key(p, n_extra, want_stats, want_recon, rdo_pick, me_levels,
                block_search_threshold, scan_distance, estimation,
                error_power):
    vf = p.video_format
    return ("pstep",) + vf.picture_luma_size() + (p.transform_depth,
            int(p.wavelet_filter_index), vf.chroma_format, p.mv_precision,
            p.xbsep_luma, p.ybsep_luma, p.xblen_luma, p.yblen_luma, n_extra,
            want_stats, p.num_refs, want_recon, rdo_pick, me_levels,
            round(block_search_threshold * 16), round(scan_distance * 4),
            tuple(sorted(estimation)), tuple(p.horiz_codeblocks),
            tuple(p.vert_codeblocks), p.codeblock_mode_index,
            round(error_power * 16))


def p_step_is_cached(p: Params, n_extra: int = 0, want_stats: bool = False,
                     want_recon: bool = True, rdo_pick: bool = False,
                     me_levels: int = 5,
                     block_search_threshold: float = 15.0,
                     scan_distance: float = 4.0, estimation: tuple = (),
                     error_power: float = 4.0) -> bool:
    """True when this picture-variant's fused step is already built.

    First use of a variant triggers XLA compiles; on the axon tunnel a
    remote compile issued while other executions are in flight can crash
    the TPU worker, so pipelined drivers drain their pending pictures
    before dispatching a to-be-compiled variant (gop.py does exactly
    this)."""
    return _p_step_key(p, n_extra, want_stats, want_recon, rdo_pick,
                       me_levels, block_search_threshold, scan_distance,
                       tuple(estimation), error_power) in _ME_CACHE


def _get_p_step(p: Params, n_extra: int = 0, want_stats: bool = False,
                want_recon: bool = True, rdo_pick: bool = False,
                me_levels: int = 5, block_search_threshold: float = 15.0,
                scan_distance: float = 4.0, estimation: tuple = (),
                error_power: float = 4.0):
    """One fused jitted program for a whole inter picture (TPU-first analog
    of the reference's per-stage encoder lifecycle, schroencoder.c:2500-2700):

      1 ref: step(packed, ref_y, up_y, up_u, up_v, qi_bands[, extra])
      2 ref: step(packed, ref1_y, up1_y, up1_u, up1_v,
                  ref2_y, up2_y, up2_u, up2_v, qi_bands[, extra])
      -> (wire, qflat_y, qflat_u, qflat_v[, recon_y, recon_u, recon_v])

    ME (per ref), sub-pel refine, 4-way mode decision + RD split, OBMC
    render, residual IWT, quantisation, and (for reference pictures) the
    reconstruction all trace into a single XLA executable — one dispatch +
    one batched host fetch per frame, which matters when device round trips
    are ~100 ms.  want_recon=False (non-ref B pictures) skips the
    dequantise/IIWT/combine tail entirely.  The wire carries the (61, nb)
    stat tables used by CBR/quantiser engines with pipeline-lag feedback.
    """
    vf = p.video_format
    num_refs = p.num_refs
    key = _p_step_key(p, n_extra, want_stats, want_recon, rdo_pick,
                      me_levels, block_search_threshold, scan_distance,
                      estimation, error_power)
    hit = _ME_CACHE.get(key)
    if hit is not None:
        return hit

    from schroedinger_tpu import tables
    from schroedinger_tpu.ops import quant as q
    from schroedinger_tpu.ops import wavelet as wv

    depth = p.transform_depth
    wavelet = p.wavelet_filter_index
    nb = subband_count(depth)
    qm = np.asarray(p.quant_matrix[:nb], np.int32)
    xnb, ynb = p.x_num_blocks, p.y_num_blocks
    h_shift = vf.chroma_format.h_shift
    v_shift = vf.chroma_format.v_shift
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]
    pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                 vf.picture_chroma_size()]
    shapes3 = [_band_shapes(oh, ow, depth) for (oh, ow) in iwt_dims]
    sizes3 = [np.asarray([h * w for (h, w) in shapes], np.int64)
              for shapes in shapes3]
    # per-coefficient band ids as numpy constants (jnp.repeat with array
    # repeats lowers to a full-length cumsum — minutes of XLA constant
    # folding at HD shapes; a constant-index gather folds instantly)
    band_id3 = [np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
                for sizes in sizes3]
    QF = jnp.asarray(tables.QUANT_FACTOR, jnp.int32)
    QO = jnp.asarray(tables.QUANT_OFFSET_3_8, jnp.int32)

    pw0, ph0 = vf.picture_luma_size()
    # estimation-stage switches (schroencoder.c:638-648 resolves the
    # enable_*_estimation combinations; our single fused pipeline maps
    # them to: hierarchical -> the pyramid, deep -> subpel refine +
    # candidate competition, bigblock -> multi-granularity RD split,
    # zero -> the zero candidate, chroma_me -> chroma SAD in the
    # candidate selection, fullscan -> single-level wide dense scan)
    est = set(estimation)
    hierarchical = "no_hierarchical" not in est
    deep = "no_deep" not in est
    bigblock = "no_bigblock" not in est
    zero_cand = "no_zero" not in est
    chroma_me = "chroma_me" in est
    fullscan = "fullscan" in est
    coarse_radius = max(1, round(2 * scan_distance))
    if fullscan:
        # exhaustive wide scan at full resolution (a bounded analog of
        # schro_encoder_fullscan_estimation; debug-grade, default off)
        me_levels = 1
        coarse_radius = max(coarse_radius, 32)
        hierarchical = False
    if not hierarchical:
        me_levels = 1
    chroma_geom = None
    if chroma_me:
        h_sh = vf.chroma_format.h_shift
        v_sh = vf.chroma_format.v_shift
        wc0, hc0 = vf.picture_chroma_size()
        chroma_geom = (p.ybsep_luma >> v_sh, p.xbsep_luma >> h_sh,
                       hc0, wc0)
    # magic_scan_distance drives the exhaustive coarse-scan radius (the
    # reference's me->scan_distance, schromotionest.c:47); default 4 ->
    # radius 8, matching the prior fixed radius
    me_body = me_mod.make_me_body(ph0, pw0, p.xbsep_luma,
                                  p.ybsep_luma, xnb, ynb,
                                  levels=me_levels, n_extra=n_extra,
                                  coarse_radius=coarse_radius,
                                  candidates=deep, zero_cand=zero_cand,
                                  chroma=chroma_geom)
    subpel_body = (me_mod.make_subpel_body(
        ph0, pw0, p.xbsep_luma, p.ybsep_luma, xnb, ynb,
        p.mv_precision) if p.mv_precision > 0 and deep else None)
    rd_split_body = (make_rd_split_body(p, granularities=bigblock)
                     if num_refs == 1
                     else make_rd_split_body2(p, granularities=bigblock))
    render_body = obmc.make_render_body(p, num_refs)

    # single-RPC wire format: the axon tunnel charges high per-transfer
    # latency, so every host<->device exchange is one packed u8 array.
    sizes_lo = [int(s.sum()) for s in sizes3]
    sizes_hi = [int(s[:min(4, len(s))].sum()) for s in sizes3]
    n_fields = len(_P_FIELD_ORDER)

    # real multiquant (enable_multiquant, schroencoder.c:3866-3906 +
    # schro_encoder_frame_set_quant_index per codeblock): with the
    # per-codeblock quant-delta syntax on and an RD lambda available, the
    # step refines each multi-codeblock band's quant index PER CODEBLOCK
    # against per-codeblock exact (bits, err) sums — the reference's
    # machinery supports this but its stock engines only ever set uniform
    # indices; ours actually exploits the syntax.
    MQ_DELTAS = (-2, -1, 0, 1, 2)
    mq_bands = []                 # (ci, bi, vcb, hcb, off, bh, bw, maps)
    if p.codeblock_mode_index == 1 and rdo_pick:
        for ci in range(3):
            off = 0
            for bi, (bh, bw) in enumerate(shapes3[ci]):
                hcb, vcb = _codeblock_counts(p, bi)
                if vcb * hcb > 1:
                    ys = np.asarray([bh * yy // vcb
                                     for yy in range(vcb + 1)])
                    xs = np.asarray([bw * xx // hcb
                                     for xx in range(hcb + 1)])
                    rmap = np.repeat(np.arange(vcb), np.diff(ys))
                    cmap = np.repeat(np.arange(hcb), np.diff(xs))
                    mq_bands.append((ci, bi, vcb, hcb, off, bh, bw,
                                     (ys, xs, rmap, cmap)))
                off += bh * bw

    def _cb_sums(a2d, ys, xs):
        """Per-codeblock sums of a (bh, bw) array at the static Dirac
        codeblock boundaries (fd.height*y/vcb), via one integral image —
        no scatters."""
        cs = jnp.pad(jnp.cumsum(jnp.cumsum(a2d, 0), 1), ((1, 0), (1, 0)))
        return (cs[ys[1:, None], xs[None, 1:]]
                - cs[ys[:-1, None], xs[None, 1:]]
                - cs[ys[1:, None], xs[None, :-1]]
                + cs[ys[:-1, None], xs[None, :-1]])

    rd_margin = me_mod.ME_BOUND_PEL + 16
    pad_h, pad_w = p.ybsep_luma * ynb, p.xbsep_luma * xnb

    n_qsel = 4 if rdo_pick else 1

    def front(packed, *args):
        # ME + RD split/mode + OBMC render + forward IWT: the first of
        # TWO separately-jitted programs per picture.  The monolithic
        # 2-ref program's XLA compile exceeded the axon tunnel's remote
        # compile deadline at 1080p (ABORTED mid-compile); splitting at
        # the residual-transform boundary keeps each program's compile
        # well under it, with the handoff staying on device.
        #
        # With rdo_pick the quant-selection input is (lam_bands, me_lam,
        # target_bits, corr_bands); the per-band RD argmin runs in
        # `back` against THIS frame's exact stat tables (the reference's
        # current-frame estimate tables + choose_quantisers_rdo_cbr,
        # schroquantiser.c:772-780 — only the TM5 lambda is serialized
        # across pictures).
        if num_refs == 1:
            ref_y, up_y, up_u, up_v = args[:4]
            qsel = args[4:4 + n_qsel]
            extra = args[4 + n_qsel] if n_extra else None
            ups2 = None
        else:
            (ref_y, up_y, up_u, up_v,
             ref2_y, up2_y, up2_u, up2_v) = args[:8]
            qsel = args[8:8 + n_qsel]
            extra = args[8 + n_qsel] if n_extra else None
            ups2 = (up2_y, up2_u, up2_v)
        if rdo_pick:
            lam_bands, me_lam, target_bits, corr_bands = qsel
            qi_bands = None
        else:
            qi_bands = qsel[0]
        (wy_pic, hy_pic) = pic_sizes[0]
        (wc_pic, hc_pic) = pic_sizes[1]
        ny = hy_pic * wy_pic
        nc = hc_pic * wc_pic
        y = packed[:ny].reshape(hy_pic, wy_pic)
        u = packed[ny:ny + nc].reshape(hc_pic, wc_pic)
        v = packed[ny + nc:ny + 2 * nc].reshape(hc_pic, wc_pic)
        cpl1 = ((u, v, up_u[::2, ::2], up_v[::2, ::2])
                if chroma_geom is not None else None)
        trunc = int(_os.environ.get("SCHRO_TPU_FRONT_TRUNC", "0"))
        dy, dx, sad_mc = me_body(y, ref_y, extra, cpl1)
        if trunc == 1:      # debug bisection: ME only
            return (dy.sum(), dx.sum(), sad_mc.sum())
        sad_dc, mean_y = _dc_stats(y, p.ybsep_luma, p.xbsep_luma, ynb, xnb)
        mean_u = _block_means(u, None, p.ybsep_luma >> v_shift,
                              p.xbsep_luma >> h_shift, ynb, xnb)
        mean_v = _block_means(v, None, p.ybsep_luma >> v_shift,
                              p.xbsep_luma >> h_shift, ynb, xnb)
        if subpel_body is not None:
            dy, dx, sad_mc = subpel_body(y, up_y, dy, dx)
        elif p.mv_precision > 0:
            dy = dy << p.mv_precision      # deep refine off: scale only
            dx = dx << p.mv_precision
        if trunc == 2:      # debug bisection: + subpel + dc stats
            return (dy.sum(), dx.sum(), sad_mc.sum(), sad_dc.sum(),
                    mean_y.sum(), mean_u.sum(), mean_v.sum())
        mvclamp = int(_os.environ.get("SCHRO_TPU_MV_CLAMP", "0"))
        if mvclamp:         # debug bisection: cap |mv| (pel) pre-RD
            b = mvclamp << p.mv_precision
            dy = jnp.clip(dy, -b, b)
            dx = jnp.clip(dx, -b, b)
        # RD split + mode search (schro_mode_decision analog): lambda
        # scales with the quant step (QF/4), ~step/2 SAD per bit; with
        # rdo_pick the caller supplies it (frame_me_lambda analog)
        lam = (me_lam.astype(jnp.float32) if rdo_pick
               else QF[jnp.max(qi_bands[:nb])].astype(jnp.float32) / 8.0)
        cpad = jnp.pad(y, ((0, pad_h - y.shape[0]),
                           (0, pad_w - y.shape[1])),
                       mode="edge").astype(jnp.int32)
        if num_refs == 1:
            fields = rd_split_body(cpad, ref_y, dy, dx, sad_mc, sad_dc,
                                   mean_y, mean_u, mean_v, lam)
        else:
            cpl2 = ((u, v, up2_u[::2, ::2], up2_v[::2, ::2])
                    if chroma_geom is not None else None)
            dy2, dx2, sad2 = me_body(y, ref2_y, extra, cpl2)
            if subpel_body is not None:
                dy2, dx2, sad2 = subpel_body(y, up2_y, dy2, dx2)
            elif p.mv_precision > 0:
                dy2 = dy2 << p.mv_precision
                dx2 = dx2 << p.mv_precision

            def padref(r):
                h, w = r.shape
                rp = jnp.pad(r, ((0, pad_h - h), (0, pad_w - w)),
                             mode="edge")
                return jnp.pad(rp, ((rd_margin, rd_margin),
                                    (rd_margin, rd_margin)), mode="edge")

            fields = rd_split_body(cpad, padref(ref_y), padref(ref2_y),
                                   dy, dx, sad_mc, dy2, dx2, sad2,
                                   sad_dc, mean_y, mean_u, mean_v, lam)

        # badblock ratio (schromotionest.c:114-126 via
        # magic_block_search_threshold): fraction of blocks whose best
        # available prediction SAD exceeds threshold x block area —
        # feeds the allocation engine's picture weight and frame stats
        bb_thr = jnp.int32(int(block_search_threshold
                               * p.xbsep_luma * p.ybsep_luma))
        best_pred = jnp.minimum(sad_mc, sad_dc)
        if num_refs == 2:
            best_pred = jnp.minimum(best_pred, sad2)
        badblock = jnp.mean((best_pred > bb_thr).astype(jnp.float32))
        if trunc == 3:      # debug bisection: + RD split/mode
            return tuple(fields[k] for k in _P_FIELD_ORDER)

        preds = render_body(fields, (up_y, up_u, up_v), ups2)
        if not _toggles.disabled("render_barrier"):
            # fusion fence: letting XLA fuse the three OBMC patch-gather
            # renders into their downstream reductions (residual IWT /
            # sums) produces a program that kernel-faults the axon TPU
            # worker for certain frame data (r5 bisection: any TWO such
            # fused pipelines are green, THREE fault; with the preds
            # materialized as plane outputs the same math is green).
            # The barrier forces the three pred planes to materialize
            # before the residual transform — the green structure.
            preds = jax.lax.optimization_barrier(tuple(preds))
        if trunc == 4:      # debug bisection: + OBMC render
            return tuple(pr.sum() for pr in preds)

        rc_flat = []
        for plane, pred, (oh, ow) in zip((y, u, v), preds, iwt_dims):
            h, w = plane.shape
            res = plane.astype(jnp.int16) - 128 - pred.astype(jnp.int16)
            res = jnp.pad(res, ((0, oh - h), (0, ow - w)))
            pyr = wv.forward(res, depth, wavelet)
            flat, _ = sl.flatten_pyramid(pyr, depth)
            rc_flat.append(flat)

        f16 = jnp.stack([fields[k].astype(jnp.int16)
                         for k in _P_FIELD_ORDER])
        return tuple(rc_flat) + tuple(preds) + (f16, badblock)

    def back(fy, fu, fv, py, pu, pv, f16, badblock, *qsel):
        # stats + RD pick + quantise + reconstruction + wire packing
        # (second jitted program; consumes front's device-resident
        # outputs)
        if rdo_pick:
            lam_bands, me_lam, target_bits, corr_bands = qsel
            qi_bands = None
        else:
            qi_bands = qsel[0]
        rc_flat = [fy, fu, fv]
        preds = (py, pu, pv)

        if want_stats or rdo_pick:
            # 61-way per-(component, subband) (bits, sq-error) estimates,
            # indexed by the ACTUAL quant index (row q = stats of coding
            # that band at qi=q), for the quantiser engines, CBR, and the
            # on-device RD pick (exact-stat analog of schroquantiser.c's
            # estimate tables, :419-520 — which are also per component,
            # frame->est_entropy[component][band]).  Per-band sums use
            # STATIC slicing, not segment_sum — scatter ops serialise
            # terribly on TPU.  Table columns are component-major:
            # column ci*nb + bi.
            #
            # The bit model is arith-aware (the analog of the reference's
            # histogram arith-entropy estimate, schrohistogram.c:267-345):
            # nonzero coefficients cost their sint length minus the
            # leading flag bit; the zero/nonzero flags of the whole band
            # cost their first-order binary entropy, which is what the
            # adaptive coder's zero contexts + zero-codeblock flags
            # actually achieve.  A raw sint-length sum (1 bit per zero)
            # overstates sparse bands ~5x, making the arith-correction
            # ratios operating-point-dependent and the CBR spend
            # unstable.
            allflat = jnp.concatenate(rc_flat).astype(jnp.int32)
            bounds = []
            boff = 0
            for ci, sizes in enumerate(sizes3):
                for bi, bn in enumerate(sizes):
                    bounds.append((ci * nb + bi, boff, boff + int(bn)))
                    boff += int(bn)

            def one(base):
                from schroedinger_tpu.encoder.ratecontrol import _sint_bits
                qqq = q.quantise(allflat, QF[base], QO[base])
                dqq = q.dequantise(qqq, QF[base], QO[base])
                nzm = (qqq != 0).astype(jnp.float32)
                if _toggles.disabled("flag_entropy"):
                    b = _sint_bits(qqq).astype(jnp.float32)
                else:
                    b = (_sint_bits(qqq).astype(jnp.float32) - 1.0) * nzm
                # reference error metric: |orig - dequant|^magic_error_power
                # (error_pow, schroquantiser.c:477-507; default power 4) —
                # the lambda calibration (qf mapping, P/B scales, subband0
                # scale) is tuned against THESE units
                ad = jnp.abs((allflat - dqq).astype(jnp.float32))
                if _toggles.disabled("error_power"):
                    e = jnp.square(ad)
                else:
                    from schroedinger_tpu.encoder.ratecontrol import \
                        error_metric
                    e = error_metric(ad, error_power)
                bsum = [jnp.float32(0)] * (3 * nb)
                esum = [jnp.float32(0)] * (3 * nb)
                zsum = [jnp.float32(0)] * (3 * nb)
                for bi, blo, bhi in bounds:
                    bsum[bi] = bsum[bi] + b[blo:bhi].sum()
                    esum[bi] = esum[bi] + e[blo:bhi].sum()
                    zsum[bi] = zsum[bi] + nzm[blo:bhi].sum()
                return jnp.stack(bsum), jnp.stack(esum), jnp.stack(zsum)

            rc_mag, rc_err, rc_nz = jax.lax.map(
                one, jnp.arange(61, dtype=jnp.int32))
            if _toggles.disabled("flag_entropy"):
                rc_bits = rc_mag
            else:
                nvec = jnp.asarray(np.concatenate(
                    [s.astype(np.float64)
                     for s in sizes3]).astype(np.float32))
                p1 = jnp.clip(rc_nz / nvec, 1e-6, 1.0 - 1e-6)
                flag_bits = -(rc_nz * jnp.log2(p1)
                              + (nvec - rc_nz) * jnp.log2(1.0 - p1))
                rc_bits = rc_mag + flag_bits
        else:
            rc_bits = jnp.zeros((61, 3 * nb), jnp.float32)
            rc_err = jnp.zeros((61, 3 * nb), jnp.float32)

        if rdo_pick:
            # per-(component, band) RD argmin, index 60 excluded like the
            # reference (schro_subband_pick_quant, schroquantiser.c:808-835),
            # with the arith-correction ratios scaling the bit estimates
            # (schroquantiser.c:706-725).
            #
            # target_bits > 0 engages the per-frame lambda fit: a
            # geometric bisection scales the frame lambda so the
            # corrected bit estimate of the picks matches the TM5
            # allocation (the reference's entropy_to_lambda bisection,
            # schroquantiser.c:887-960, moved on device).  The TM5 qf
            # lambda seeds the search; the reference trusts qf's absolute
            # calibration against ITS histogram estimates, while our
            # exact tables need the per-frame fit to hold CBR spend.
            bits_c = corr_bands[None, :] * rc_bits[:60]
            cols = jnp.arange(3 * nb)

            def pick_at(s):
                cost = bits_c + (s * lam_bands)[None, :] * rc_err[:60]
                qi = jnp.argmin(cost, axis=0).astype(jnp.int32)
                return qi, bits_c[qi, cols].sum()

            def fit(_):
                def body(_, lohi):
                    lo, hi = lohi
                    mid = jnp.sqrt(lo * hi)
                    _, b = pick_at(mid)
                    # more lambda -> finer -> more bits
                    return (jnp.where(b < target_bits, mid, lo),
                            jnp.where(b < target_bits, hi, mid))

                # DOWN-scaling only (hi = 1): the fit exists to hold the
                # allocation when the TM5 quality level would overspend;
                # easy content keeps the TM5 stable-quality undershoot
                # (the reference's rdo_cbr behaviour) instead of being
                # inflated to the budget
                lo, hi = jax.lax.fori_loop(
                    0, 22, body,
                    (jnp.float32(1.0 / 16384.0), jnp.float32(1.0)))
                return jnp.sqrt(lo * hi)

            if _toggles.disabled("lam_fit"):
                s_fit = jnp.float32(1.0)
            else:
                s_fit = jax.lax.cond(target_bits > 0, fit,
                                     lambda _: jnp.float32(1.0),
                                     operand=None)
            lam_bands = s_fit * lam_bands
            qi_bands, _ = pick_at(s_fit)

        mq_qi = {}
        if mq_bands:
            from schroedinger_tpu.encoder.ratecontrol import _sint_bits
            for (ci, bi, vcb, hcb, boff, bh, bw,
                 (ys, xs, rmap, cmap)) in mq_bands:
                band = rc_flat[ci][boff:boff + bh * bw].astype(
                    jnp.int32).reshape(bh, bw)
                qi0 = qi_bands[ci * nb + bi]
                lamb = lam_bands[ci * nb + bi]
                costs = []
                for d in MQ_DELTAS:
                    qid = jnp.clip(qi0 + d, 0, 59)
                    qq = q.quantise(band, QF[qid], QO[qid])
                    dq = q.dequantise(qq, QF[qid], QO[qid])
                    cb_b = _cb_sums(_sint_bits(qq).astype(jnp.float32),
                                    ys, xs)
                    from schroedinger_tpu.encoder.ratecontrol import \
                        error_metric
                    cb_e = _cb_sums(error_metric(
                        jnp.abs((band - dq).astype(jnp.float32)),
                        error_power), ys, xs)
                    costs.append(cb_b + lamb * cb_e)
                pick = jnp.argmin(jnp.stack(costs), axis=0)
                mq_qi[(ci, bi)] = jnp.clip(
                    qi0 + jnp.asarray(MQ_DELTAS, jnp.int32)[pick], 0, 59)

        outq = []
        outlo = []
        outhi = []
        ovfs = []
        outr = []
        for ci, (flat, pred, shapes, sizes, (oh, ow), (wpic, hpic)) in \
                enumerate(zip(rc_flat, preds, shapes3, sizes3, iwt_dims,
                              pic_sizes)):
            n = int(sizes.sum())
            qi_c = qi_bands[ci * nb:(ci + 1) * nb]
            if mq_qi:
                # per-coefficient quant maps honoring the per-codeblock
                # picks for this component's multiquant bands
                qparts = []
                boff = 0
                for bi, (bh, bw) in enumerate(shapes):
                    cb = mq_qi.get((ci, bi))
                    if cb is None:
                        qparts.append(jnp.full((bh * bw,), 0,
                                               jnp.int32) + qi_c[bi])
                    else:
                        (ys, xs, rmap, cmap) = next(
                            m[7] for m in mq_bands
                            if m[0] == ci and m[1] == bi)
                        qparts.append(cb[rmap[:, None],
                                         cmap[None, :]].reshape(-1))
                    boff += bh * bw
                qi_coeff = jnp.concatenate(qparts)
                qf = QF[qi_coeff]
                qo = QO[qi_coeff]
            else:
                # constant band-id gather, not jnp.repeat: array-repeats
                # lower to a full-length cumsum whose reduce-window
                # decomposition constant-folds for minutes at HD shapes
                band_id = band_id3[ci]
                qf = QF[qi_c][band_id]
                qo = QO[qi_c][band_id]
            qq = q.quantise(flat, qf, qo)
            qq16 = qq.astype(jnp.int16)
            outq.append(qq16)
            # int8 wire format: the tunnel runs ~50 MB/s, so halving the
            # coefficient bytes is worth ~60 ms/frame at 1080p.  Low bytes
            # for everything + high bytes for the coarse bands (where big
            # values live); a device-computed flag marks the rare fine-band
            # overflow, for which the host refetches the full int16.
            n_c = int(sizes[:min(4, len(sizes))].sum())
            outlo.append(qq16.astype(jnp.int8))
            outhi.append((qq16[:n_c] >> 8).astype(jnp.int8))
            ovfs.append(jnp.any(jnp.abs(qq16[n_c:]) > 127))
            if want_recon:
                dq = q.dequantise(qq, qf, qo).astype(jnp.int16)
                bands = []
                pos = 0
                for (bh, bw) in shapes:
                    bands.append(dq[pos:pos + bh * bw].reshape(bh, bw))
                    pos += bh * bw
                rres = wv.inverse(sl.arrays_to_pyramid(bands, depth),
                                  wavelet)
                rec = (rres[:hpic, :wpic].astype(jnp.int32)
                       + pred.astype(jnp.int32) + 128)
                outr.append(jnp.clip(rec, 0, 255).astype(jnp.uint8))

        fbytes = jax.lax.bitcast_convert_type(f16, jnp.uint8).reshape(-1)
        rcb = jax.lax.bitcast_convert_type(
            jnp.stack([rc_bits, rc_err]), jnp.uint8).reshape(-1)
        parts = [fbytes, rcb,
                 jax.lax.bitcast_convert_type(
                     badblock[None].astype(jnp.float32),
                     jnp.uint8).reshape(-1)]
        if rdo_pick:
            parts.append(jax.lax.bitcast_convert_type(
                qi_bands.astype(jnp.int16), jnp.uint8).reshape(-1))
        for (ci, bi, vcb, hcb, _o, _h, _w, _m) in mq_bands:
            parts.append(jax.lax.bitcast_convert_type(
                mq_qi[(ci, bi)].astype(jnp.int16), jnp.uint8).reshape(-1))
        if _toggles.disabled("int8_wire"):
            qb = jnp.concatenate(
                [jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
                 for a in outq])
            wire = jnp.concatenate(parts + [qb])
        else:
            lob = jnp.concatenate(
                [jax.lax.bitcast_convert_type(a, jnp.uint8)
                 for a in outlo])
            hib = jnp.concatenate(
                [jax.lax.bitcast_convert_type(a, jnp.uint8)
                 for a in outhi])
            ovfb = jnp.stack(ovfs).astype(jnp.uint8)
            wire = jnp.concatenate(parts + [lob, hib, ovfb])
        return (wire,) + tuple(outq) + tuple(outr)

    qsel_lo = 4 if num_refs == 1 else 8

    def raw_step(packed, *args):
        fouts = front(packed, *args)
        return back(*fouts, *args[qsel_lo:qsel_lo + n_qsel])

    back_j = jax.jit(back)

    # first-call stage synchronisation: a remote XLA compile issued while
    # other work is executing can crash the axon TPU worker, so the first
    # invocation of each staged program waits for its inputs (the only
    # possible in-flight producers after the caller's compile barrier)
    # and then runs synchronously; warm calls dispatch fully async.
    _compiled = set()

    def _call_stage(fn, tag, *args):
        if _SYNC_DEBUG:
            _real_sync(args)
            if _DUMP_STAGE and _DUMP_STAGE[0] == tag:
                np.savez(_DUMP_STAGE[1],
                         **{f"a{i}": np.asarray(a)
                            for i, a in enumerate(args)})
                print(f"syncdbg dumped {tag} args to {_DUMP_STAGE[1]}",
                      file=sys.stderr, flush=True)
            print(f"syncdbg dispatch {tag}", file=sys.stderr, flush=True)
            outs = fn(*args)
            _real_sync(outs)
            print(f"syncdbg done {tag}", file=sys.stderr, flush=True)
            _compiled.add(tag)
            return outs
        if tag in _compiled:
            return fn(*args)
        # first call compiles: REALLY quiesce in-flight producers (small
        # leaves: ME fields, qsel vectors — big refs are host uploads or
        # already-fetched recons), then verify completion with a real
        # round-trip before going async on later calls
        _real_sync(args)
        for attempt in range(3):
            try:
                outs = fn(*args)
                _real_sync(outs)
                _compiled.add(tag)
                return outs
            except jax.errors.JaxRuntimeError as e:
                # the axon tunnel's remote compile occasionally drops the
                # HTTP response mid-body; the compile itself is retryable
                # (the relay caches finished compiles, so a retry is cheap
                # when the first attempt actually completed server-side)
                if not _is_transient_tunnel_error(e) or attempt == 2:
                    raise
                _log_stage_retry(tag, attempt, e)
                time.sleep(2.0 * (attempt + 1))

    if _toggles.disabled("stage_split"):
        # round-3 structure: the whole picture is ONE jitted program
        step_j = jax.jit(raw_step)

        def stepfn(*a):
            return _call_stage(step_j, "mono", *a)
    elif num_refs == 1:
        front_j = jax.jit(front)

        def stepfn(*a):
            fouts = _call_stage(front_j, "front", *a)
            return _call_stage(back_j, "back", *fouts,
                               *a[1 + qsel_lo:1 + qsel_lo + n_qsel])
    else:
        # the 2-ref picture splits further: one shared ME+subpel program
        # (run once per reference) and a mid program (RD split + render +
        # forward IWT).  The combined two-ME front faulted the TPU
        # backend at 1080p on real data (each piece runs clean alone);
        # staging also keeps every program's remote compile short.
        def unpack3(packed):
            (wy_pic, hy_pic) = pic_sizes[0]
            (wc_pic, hc_pic) = pic_sizes[1]
            ny = hy_pic * wy_pic
            nc = hc_pic * wc_pic
            return (packed[:ny].reshape(hy_pic, wy_pic),
                    packed[ny:ny + nc].reshape(hc_pic, wc_pic),
                    packed[ny + nc:ny + 2 * nc].reshape(hc_pic, wc_pic))

        def me_stage(packed, ref_y, up_y, up_u, up_v, *maybe_extra):
            y, u, v = unpack3(packed)
            extra = maybe_extra[0] if n_extra else None
            cpl = ((u, v, up_u[::2, ::2], up_v[::2, ::2])
                   if chroma_geom is not None else None)
            dy, dx, sad = me_body(y, ref_y, extra, cpl)
            if subpel_body is not None:
                dy, dx, sad = subpel_body(y, up_y, dy, dx)
            elif p.mv_precision > 0:
                dy = dy << p.mv_precision
                dx = dx << p.mv_precision
            return dy, dx, sad

        def mid2(packed, ref_y, up_y, up_u, up_v,
                 ref2_y, up2_y, up2_u, up2_v,
                 dy, dx, sad_mc, dy2, dx2, sad2, *qsel):
            y, u, v = unpack3(packed)
            if rdo_pick:
                lam = qsel[1].astype(jnp.float32)
            else:
                lam = QF[jnp.max(qsel[0][:nb])].astype(jnp.float32) / 8.0
            sad_dc, mean_y = _dc_stats(y, p.ybsep_luma, p.xbsep_luma,
                                       ynb, xnb)
            mean_u = _block_means(u, None, p.ybsep_luma >> v_shift,
                                  p.xbsep_luma >> h_shift, ynb, xnb)
            mean_v = _block_means(v, None, p.ybsep_luma >> v_shift,
                                  p.xbsep_luma >> h_shift, ynb, xnb)
            cpad = jnp.pad(y, ((0, pad_h - y.shape[0]),
                               (0, pad_w - y.shape[1])),
                           mode="edge").astype(jnp.int32)

            def padref(r):
                h, w = r.shape
                rp = jnp.pad(r, ((0, pad_h - h), (0, pad_w - w)),
                             mode="edge")
                return jnp.pad(rp, ((rd_margin, rd_margin),
                                    (rd_margin, rd_margin)), mode="edge")

            fields = rd_split_body(cpad, padref(ref_y), padref(ref2_y),
                                   dy, dx, sad_mc, dy2, dx2, sad2,
                                   sad_dc, mean_y, mean_u, mean_v, lam)
            bb_thr = jnp.int32(int(block_search_threshold
                                   * p.xbsep_luma * p.ybsep_luma))
            best_pred = jnp.minimum(jnp.minimum(sad_mc, sad_dc), sad2)
            badblock = jnp.mean((best_pred > bb_thr).astype(jnp.float32))
            preds = render_body(fields, (up_y, up_u, up_v),
                                (up2_y, up2_u, up2_v))
            if not _toggles.disabled("render_barrier"):
                # same fusion fence as front (see comment there)
                preds = jax.lax.optimization_barrier(tuple(preds))
            rc_flat = []
            for plane, pred, (oh, ow) in zip((y, u, v), preds, iwt_dims):
                h, w = plane.shape
                res = (plane.astype(jnp.int16) - 128
                       - pred.astype(jnp.int16))
                res = jnp.pad(res, ((0, oh - h), (0, ow - w)))
                pyr = wv.forward(res, depth, wavelet)
                flat, _ = sl.flatten_pyramid(pyr, depth)
                rc_flat.append(flat)
            f16 = jnp.stack([fields[k].astype(jnp.int16)
                             for k in _P_FIELD_ORDER])
            return tuple(rc_flat) + tuple(preds) + (f16, badblock)

        me_j = jax.jit(me_stage)
        mid_j = jax.jit(mid2)

        def stepfn(*a):
            packed = a[0]
            refargs = a[1:9]
            qsel = a[9:9 + n_qsel]
            extra = a[9 + n_qsel:]
            me1 = _call_stage(me_j, "me", packed, a[1], a[2], a[3], a[4],
                              *extra)
            me2 = me_j(packed, a[5], a[6], a[7], a[8], *extra)
            fouts = _call_stage(mid_j, "mid", packed, *refargs, *me1,
                                *me2, *qsel)
            return _call_stage(back_j, "back", *fouts, *qsel)

    layout = {
        "n_fields": n_fields, "yb": ynb, "xb": xnb, "nb": nb,
        "front": front, "back": back,   # unjitted bodies (debug/replay)
        "sizes_lo": sizes_lo, "sizes_hi": sizes_hi,
        "mq": [(ci, bi, vcb, hcb)
               for (ci, bi, vcb, hcb, _o, _h, _w, _m) in mq_bands],
        "raw_step": raw_step,  # unjitted body for shard_map composition
    }
    fns = (stepfn, shapes3, layout)
    _ME_CACHE[key] = fns
    return fns


def _codeblock_counts(p: Params, index: int):
    position = subband_position(index)
    if index == 0:
        return p.horiz_codeblocks[0], p.vert_codeblocks[0]
    level = position >> 2
    return p.horiz_codeblocks[level + 1], p.vert_codeblocks[level + 1]


def write_prediction_parameters(w: BitWriter, p: Params) -> None:
    """Mirror of read_picture_prediction_parameters."""
    blocks = [(0, 0, 0, 0), (8, 8, 4, 4), (12, 12, 8, 8),
              (16, 16, 12, 12), (24, 24, 16, 16)]
    tup = (p.xblen_luma, p.yblen_luma, p.xbsep_luma, p.ybsep_luma)
    if tup in blocks[1:]:
        w.write_uint(blocks.index(tup))
    else:
        w.write_uint(0)
        for v in tup:
            w.write_uint(v)
    w.write_uint(p.mv_precision)
    w.write_bit(1 if p.have_global_motion else 0)
    if p.have_global_motion:
        for i in range(p.num_refs):
            gm = p.global_motion[i]
            if (gm.b0, gm.b1) == (0, 0):
                w.write_bit(0)
            else:
                w.write_bit(1)
                w.write_sint(gm.b0)
                w.write_sint(gm.b1)
            if (gm.a_exp, gm.a00, gm.a01, gm.a10, gm.a11) == (0, 1, 0, 0, 1):
                w.write_bit(0)
            else:
                w.write_bit(1)
                w.write_uint(gm.a_exp)
                w.write_sint(gm.a00)
                w.write_sint(gm.a01)
                w.write_sint(gm.a10)
                w.write_sint(gm.a11)
            if (gm.c_exp, gm.c0, gm.c1) == (0, 0, 0):
                w.write_bit(0)
            else:
                w.write_bit(1)
                w.write_uint(gm.c_exp)
                w.write_sint(gm.c0)
                w.write_sint(gm.c1)
    w.write_uint(p.picture_pred_mode)
    if (p.picture_weight_bits, p.picture_weight_1, p.picture_weight_2) == (1, 1, 1):
        w.write_bit(0)
    else:
        w.write_bit(1)
        w.write_uint(p.picture_weight_bits)
        w.write_sint(p.picture_weight_1)
        if p.num_refs > 1:
            w.write_sint(p.picture_weight_2)


def start_inter_picture(planes_u8, p: Params, ref1: RefFrame,
                        base_qi: int = 20, use_phasecorr: bool = False,
                        qi_bands_override=None,
                        want_stats: bool = False,
                        ref2: Optional[RefFrame] = None,
                        want_recon: bool = True,
                        lam_bands=None, me_lam: float = None,
                        me_levels: int = 5,
                        block_search_threshold: float = 15.0,
                        scan_distance: float = 4.0,
                        estimation: tuple = (),
                        error_power: float = 4.0,
                        target_bits: float = 0.0,
                        corr_bands=None) -> dict:
    """Dispatch the fused inter step for one picture (async: XLA queues the
    work; nothing blocks). The returned pending dict carries the device
    handles — `recon`/`up` are usable as the next frame's reference
    immediately, so a caller can start picture N+1 while the host entropy
    coding of picture N runs (finish_inter_picture).  ref2 dispatches the
    two-reference step (tworef P / B pictures); want_recon=False skips the
    reconstruction tail for non-reference pictures.

    lam_bands: (nb,) per-band RD lambdas -> the quant indices are chosen
    ON DEVICE against this frame's own exact stat tables (the reference's
    current-frame estimate tables, schroquantiser.c:772-780); only the
    lambda (TM5 qf / constant_lambda) crosses pictures, so rate control
    no longer adds any feedback lag to the pipeline."""
    assert _native is not None
    assert (ref2 is None) == (p.num_refs == 1)
    nb = subband_count(p.transform_depth)
    qm = np.asarray(p.quant_matrix[:nb], np.int32)
    n_extra = N_PHASECORR_CANDS if use_phasecorr else 0
    rdo_pick = lam_bands is not None
    stepfn, shapes3, layout = _get_p_step(
        p, n_extra=n_extra, want_stats=want_stats, want_recon=want_recon,
        rdo_pick=rdo_pick, me_levels=me_levels,
        block_search_threshold=block_search_threshold,
        scan_distance=scan_distance, estimation=tuple(estimation),
        error_power=error_power)
    if rdo_pick:
        qi_bands = None
    elif qi_bands_override is not None:
        qi_bands = np.asarray(qi_bands_override, np.int32)
        if qi_bands.size == nb:          # shared across components
            qi_bands = np.tile(qi_bands, 3)
    else:
        qi_bands = np.tile(np.clip(base_qi - qm, 0, 60), 3).astype(np.int32)
    ups = ref1.get_upsampled()
    # one upload: all three planes in a single u8 vector
    packed = jnp.asarray(np.concatenate(
        [np.asarray(pl, np.uint8).ravel() for pl in planes_u8]))
    args = (packed, jnp.asarray(ref1.planes[0]), ups[0], ups[1], ups[2])
    if ref2 is not None:
        ups2 = ref2.get_upsampled()
        args = args + (jnp.asarray(ref2.planes[0]),
                       ups2[0], ups2[1], ups2[2])
    if rdo_pick:
        lam_bands = np.asarray(lam_bands, np.float64)
        if lam_bands.size == nb:
            lam_bands = np.tile(lam_bands, 3)
        cb = (np.ones(3 * nb) if corr_bands is None
              else np.asarray(corr_bands, np.float64))
        args = args + (jnp.asarray(lam_bands, jnp.float32),
                       jnp.float32(me_lam if me_lam is not None
                                   else float(tables.QUANT_FACTOR[base_qi])
                                   / 8.0),
                       jnp.float32(target_bits or 0.0),
                       jnp.asarray(cb, jnp.float32))
    else:
        args = args + (jnp.asarray(qi_bands),)
    if use_phasecorr:
        cur_y = packed[:np.asarray(planes_u8[0]).size].reshape(
            np.asarray(planes_u8[0]).shape)
        outs = stepfn(*args, _phasecorr_candidates(p, cur_y, args[1]))
    else:
        outs = stepfn(*args)
    return {
        "p": p, "outs": outs, "qi_bands": qi_bands, "shapes3": shapes3,
        "layout": layout, "rdo": rdo_pick,
        "base_qi": (int(np.asarray(qi_bands).ravel()[0] + qm[0])
                    if qi_bands is not None else base_qi),
        "want_stats": want_stats,
        "recon": (outs[4], outs[5], outs[6]) if want_recon else None,
        "up": None,
    }


_B_BATCH_CACHE = {}


def b_batch_is_cached(p: Params, n: int, **kw) -> bool:
    """True when the n-picture vmapped B step for this variant is built
    (compile-barrier hook for pipelined drivers, like p_step_is_cached)."""
    return (_p_step_key(p, kw.pop("n_extra", 0), **kw) + ("bbatch", n)) \
        in _B_BATCH_CACHE


def start_inter_batch(planes_list, p: Params, ref1: RefFrame,
                      ref2: RefFrame, qsels, want_recon: bool = False,
                      want_stats: bool = False, me_levels: int = 5,
                      block_search_threshold: float = 15.0,
                      scan_distance: float = 4.0, estimation: tuple = (),
                      error_power: float = 4.0):
    """Dispatch the N independent B pictures of a biref subgroup as ONE
    vmapped fused device program (single-chip frames-within-subgroup
    batching — the one-device analog of the frames-within-GOP mesh
    sharding, and the TPU-first counterpart of the reference's stage-DAG
    frame parallelism, schroencoder.c:1979-2192: B pictures of a
    subgroup have no mutual dependencies, schroengine.c:247-304).

    All pictures share (ref1, ref2); per-picture inputs are the packed
    frame and the rdo qsel (lam_bands, me_lam, target_bits, corr_bands).
    One dispatch replaces 4N staged RPCs, and the whole batch's wire
    comes back in ONE transfer (finish_inter_picture fetches the batched
    wire once and slices rows on host).

    Returns a list of pending dicts compatible with
    finish_inter_picture."""
    assert _native is not None
    assert p.num_refs == 2 and ref2 is not None
    n = len(planes_list)
    nb = subband_count(p.transform_depth)
    kw = dict(n_extra=0, want_stats=want_stats, want_recon=want_recon,
              rdo_pick=True, me_levels=me_levels,
              block_search_threshold=block_search_threshold,
              scan_distance=scan_distance, estimation=tuple(estimation),
              error_power=error_power)
    _, shapes3, layout = _get_p_step(p, **kw)
    raw = layout["raw_step"]
    key = _p_step_key(p, 0, **{k: v for k, v in kw.items()
                               if k != "n_extra"}) + ("bbatch", n)
    vj = _B_BATCH_CACHE.get(key)
    first = vj is None
    if first:
        vj = jax.jit(jax.vmap(
            raw, in_axes=(0,) + (None,) * 8 + (0, 0, 0, 0)))
        _B_BATCH_CACHE[key] = vj

    packed_b = jnp.asarray(np.stack(
        [np.concatenate([np.asarray(pl, np.uint8).ravel() for pl in pls])
         for pls in planes_list]))
    ups1 = ref1.get_upsampled()
    ups2 = ref2.get_upsampled()
    refargs = (jnp.asarray(ref1.planes[0]), ups1[0], ups1[1], ups1[2],
               jnp.asarray(ref2.planes[0]), ups2[0], ups2[1], ups2[2])

    lam_b = []
    melam_b = []
    tgt_b = []
    corr_b = []
    for qs in qsels:
        lb = np.asarray(qs["lam_bands"], np.float64)
        if lb.size == nb:
            lb = np.tile(lb, 3)
        lam_b.append(lb.astype(np.float32))
        melam_b.append(np.float32(qs["me_lam"]))
        tgt_b.append(np.float32(qs.get("target_bits") or 0.0))
        cb = qs.get("corr_bands")
        corr_b.append(np.ones(3 * nb, np.float32) if cb is None
                      else np.asarray(cb, np.float32))
    bargs = (packed_b,) + refargs + (
        jnp.asarray(np.stack(lam_b)), jnp.asarray(np.stack(melam_b)),
        jnp.asarray(np.stack(tgt_b)), jnp.asarray(np.stack(corr_b)))

    if first:
        # compile barrier semantics of _call_stage: first call of the
        # batched program REALLY waits for in-flight producers, runs
        # synchronously (real round-trip), retries transient failures
        _real_sync(bargs)
        for attempt in range(3):
            try:
                outs = vj(*bargs)
                _real_sync(outs)
                break
            except jax.errors.JaxRuntimeError as e:
                if not _is_transient_tunnel_error(e) or attempt == 2:
                    raise
                _log_stage_retry(f"bbatch{n}", attempt, e)
                time.sleep(2.0 * (attempt + 1))
    else:
        outs = vj(*bargs)

    shared = {"outs": outs}
    pendings = []
    for i in range(n):
        pendings.append({
            "p": p, "outs": tuple(o[i] for o in outs), "qi_bands": None,
            "shapes3": shapes3, "layout": layout, "rdo": True,
            "base_qi": 0, "want_stats": want_stats,
            "batch": (shared, i),
            "recon": ((outs[4][i], outs[5][i], outs[6][i])
                      if want_recon else None),
            "up": None,
        })
    return pendings


def prefetch_pending(pending: dict) -> None:
    """Kick the async device->host copy of the wire so the transfer
    overlaps the next frame's compute (no-op if the backend ignores it)."""
    try:
        pending["outs"][0].copy_to_host_async()
    except Exception:
        pass


def finish_inter_picture(pending: dict, frame_number: int, ref1_num: int,
                         is_ref: bool = True, retired: Optional[int] = None,
                         ref2_num: Optional[int] = None):
    """Fetch the fused step's packed wire (one transfer) and entropy-code
    the parse unit.  Returns (unit_bytes, stats)."""
    from schroedinger_tpu.utils.telemetry import timers
    p = pending["p"]
    outs = pending["outs"]
    lay = pending["layout"]
    with timers.span("p_transfer"):
        batch = pending.get("batch")
        if batch is not None:
            shared, bi = batch
            if "wires" not in shared:
                # ONE transfer for the whole subgroup's wires
                shared["wires"] = np.asarray(
                    jax.device_get(shared["outs"][0]))
            wire = shared["wires"][bi]
        else:
            wire = np.asarray(jax.device_get(outs[0]))
    nf, yb, xb, nb = (lay["n_fields"], lay["yb"], lay["xb"], lay["nb"])
    off = 0
    f16 = np.frombuffer(wire, np.int16, nf * yb * xb, off).reshape(
        nf, yb, xb)
    off += nf * yb * xb * 2
    rc = np.frombuffer(wire, np.float32, 2 * 61 * 3 * nb, off).reshape(
        2, 61, 3 * nb)
    off += 2 * 61 * 3 * nb * 4
    pending["badblock_ratio"] = float(
        np.frombuffer(wire, np.float32, 1, off)[0])
    off += 4
    qi_bands = pending["qi_bands"]
    if pending.get("rdo"):
        qi_bands = np.frombuffer(wire, np.int16, 3 * nb,
                                 off).astype(np.int32)
        off += 3 * nb * 2
        pending["qi_bands"] = qi_bands
    qi_cb = {}
    for (ci, bi, vcb, hcb) in lay.get("mq", ()):
        qi_cb[(ci, bi)] = np.frombuffer(
            wire, np.int16, vcb * hcb, off).astype(np.int32).reshape(
            vcb, hcb)
        off += vcb * hcb * 2
    pending["qi_cb"] = qi_cb
    mv = {k: np.ascontiguousarray(f16[i].astype(np.int32))
          for i, k in enumerate(_P_FIELD_ORDER)}
    # DC-block ratio: the reference's intra-bailout / badblock signal
    # (schro_motionest statistics, schroencoder.c:2373-2384)
    pending["dc_ratio"] = float(np.mean(mv["pred_mode"] == 0))
    stats = ((rc[0].copy(), rc[1].copy())
             if pending.get("want_stats") else None)
    if _STATS_DEBUG:
        pm = mv["pred_mode"]
        hist = [int((pm == m).sum()) for m in range(4)]
        print(f"statsdbg frame {frame_number}: bits max "
              f"{np.nanmax(rc[0]):.3e} err max {np.nanmax(rc[1]):.3e} "
              f"inf {np.isinf(rc).sum()} nan {np.isnan(rc).sum()} "
              f"modes dc/r1/r2/bi {hist} "
              f"qi {np.asarray(qi_bands).ravel().tolist() if pending.get('rdo') else None}",
              file=sys.stderr, flush=True)
    host_q = []
    if _toggles.disabled("int8_wire"):
        for n in lay["sizes_lo"]:
            host_q.append(np.frombuffer(wire, np.int16, n, off))
            off += 2 * n
    else:
        los = []
        for n in lay["sizes_lo"]:
            los.append(np.frombuffer(wire, np.int8, n, off))
            off += n
        his = []
        for n in lay["sizes_hi"]:
            his.append(np.frombuffer(wire, np.int8, n, off))
            off += n
        ovf = wire[off:off + 3]
        for c in range(3):
            if ovf[c]:
                # rare fine-band overflow (very low qi): refetch int16
                host_q.append(np.asarray(jax.device_get(outs[1 + c])))
                continue
            lo = los[c]
            hi = his[c]
            n_c = hi.shape[0]
            qv = lo.astype(np.int16)
            qv[:n_c] = ((hi.astype(np.int16) << 8)
                        | (lo[:n_c].astype(np.int16) & 0xFF))
            host_q.append(qv)
    refs = [ref1_num] if ref2_num is None else [ref1_num, ref2_num]
    from schroedinger_tpu.utils.telemetry import dump, dump_enabled
    if dump_enabled("lambda_curve") and qi_bands is not None:
        dump("lambda_curve", "%d %s", frame_number,
             " ".join(str(int(q)) for q in np.asarray(qi_bands).ravel()))
    if dump_enabled("motionest"):
        dump("motionest", "%d dc_ratio %.4f mean_|mv| %.2f", frame_number,
             pending["dc_ratio"],
             float(np.mean(np.hypot(mv["dx1"], mv["dy1"]))))
    with timers.span("p_entropy"):
        unit, band_bits = _write_p_unit(p, frame_number, refs, is_ref,
                                        retired, mv, host_q,
                                        pending["shapes3"], qi_bands,
                                        qi_cb=qi_cb)
    # per-(component, band) actual-vs-estimated coded bits at the picked
    # quant indices, for the arith-correction EMA tables
    # (schroencoder.c:2548-2590 analog; rc[0] rows are indexed by the
    # actual quant index, so row qi column j is the estimate of coding
    # band j at its picked index)
    pending["band_bits_actual"] = band_bits
    if qi_bands is not None and rc[0].any():
        qiv = np.asarray(qi_bands).ravel()
        if qiv.size == nb:
            qiv = np.tile(qiv, 3)
        pending["band_bits_est"] = rc[0][np.clip(qiv, 0, 60),
                                         np.arange(3 * nb)]
    else:
        pending["band_bits_est"] = None
    return unit, stats


def encode_inter_picture(planes_u8, p: Params, frame_number: int,
                         ref1_num: int, ref1: RefFrame,
                         base_qi: int = 20, is_ref: bool = True,
                         retired: Optional[int] = None,
                         use_phasecorr: bool = False,
                         qi_bands_override=None,
                         want_stats: bool = False,
                         lam_bands=None, me_lam: float = None,
                         me_levels: int = 5,
                         block_search_threshold: float = 15.0,
                         scan_distance: float = 4.0,
                         estimation: tuple = (),
                         error_power: float = 4.0):
    """Encode one P picture (start + finish of the fused step).  Returns
    (parse_unit_bytes, recon_planes, used_base_qi, stats, up_planes,
    dc_ratio, pending) where stats is (bits61, err61) per-(component, subband)
    estimate tables from the fused path (None on the CBR path), consumed
    by the constant-lambda / constant-error quantiser engines next frame.
    qi_bands_override: explicit per-subband quant indices, (nb,) shared
    or (3*nb,) per component; lam_bands: on-device RD pick (see
    start_inter_picture)."""
    assert _native is not None
    pend = start_inter_picture(planes_u8, p, ref1, base_qi=base_qi,
                               use_phasecorr=use_phasecorr,
                               qi_bands_override=qi_bands_override,
                               want_stats=want_stats,
                               lam_bands=lam_bands, me_lam=me_lam,
                               me_levels=me_levels,
                               block_search_threshold=block_search_threshold,
                               scan_distance=scan_distance,
                               estimation=estimation,
                               error_power=error_power)
    unit, stats = finish_inter_picture(pend, frame_number, ref1_num,
                                       is_ref=is_ref, retired=retired)
    return unit, pend["recon"], base_qi, stats, pend["up"], \
        pend.get("dc_ratio", 0.0), pend


def _write_p_unit(p: Params, frame_number: int, refs, is_ref: bool,
                  retired: Optional[int], mv, host_q, shapes3, qi_bands,
                  qi_cb=None):
    """Host entropy coding + parse-unit assembly for an inter picture.

    qi_bands: per-(component, band) quant indices, component-major
    (3*nb,), or (nb,) shared across components — the stream writes one
    quant index per band per component either way (the bitstream always
    carried this freedom; the reference also picks per-component,
    schroquantiser.c:855-880).

    Returns (unit_bytes, band_bits) where band_bits is the (3*nb,)
    per-(component, band) coded payload bits (actual_subband_bits analog,
    schroencoder.c:2532-2546) feeding the arith-correction EMA."""
    nb = subband_count(p.transform_depth)
    qiv = np.asarray(qi_bands).ravel()
    if qiv.size == nb:
        qiv = np.tile(qiv, 3)
    num_refs = len(refs)
    w = BitWriter()
    code = parse_code_picture(is_ref, num_refs, False, p.is_noarith)
    write_parse_info(w, code)
    retired_delta = None
    if is_ref:
        retired_delta = (retired - frame_number) if retired is not None else 0
    write_picture_header(w, frame_number,
                         ref_deltas=[r - frame_number for r in refs],
                         retired_delta=retired_delta)
    w.sync()
    write_prediction_parameters(w, p)
    w.sync()
    bufs = _native.motion_encode(mv, p.x_num_blocks, p.y_num_blocks,
                                 num_refs, is_noarith=p.is_noarith)
    for s in range(9):
        if bufs[s] is None:
            continue
        w.write_uint(len(bufs[s]))
        w.sync()
        w.write_bytes(bytes(bufs[s]))
    w.sync()
    # transform parameters (zero_residual=0)
    w.write_bit(0)
    w.write_uint(int(p.wavelet_filter_index))
    w.write_uint(p.transform_depth)
    is_default_cb = all(p.horiz_codeblocks[i] == 1 and p.vert_codeblocks[i] == 1
                        for i in range(p.transform_depth + 1)) \
        and p.codeblock_mode_index == 0
    if is_default_cb:
        w.write_bit(0)
    else:
        w.write_bit(1)
        for i in range(p.transform_depth + 1):
            w.write_uint(p.horiz_codeblocks[i])
            w.write_uint(p.vert_codeblocks[i])
        w.write_uint(p.codeblock_mode_index)
    w.sync()

    band_bits = np.zeros(3 * nb, np.float64)
    for comp in range(3):
        bands = sl.unflatten_host(host_q[comp], shapes3[comp])
        for index in range(nb):
            hcb, vcb = _codeblock_counts(p, index)
            position = subband_position(index)
            qi = int(qiv[comp * nb + index])
            qdata = bands[index]
            w.sync()
            if not np.any(qdata):
                w.write_uint(0)
                continue
            # parent context is a zero-test, so quantised data is
            # equivalent to the dequantised values the spec describes
            if p.is_noarith:
                payload = _native.encode_subband_noarith(
                    qdata, position, hcb, vcb,
                    p.codeblock_mode_index == 1)
                first_qi = qi
            else:
                parent_q = bands[index - 3] if position >= 4 else None
                cbqi = (qi_cb or {}).get((comp, index))
                if cbqi is None:
                    cbqi = np.full((vcb, hcb), qi, np.int32)
                payload, first_qi = sb.encode_subband_arith(
                    qdata, parent_q, position, hcb, vcb,
                    p.codeblock_mode_index == 1, cbqi)
            band_bits[comp * nb + index] = 8 * len(payload)
            w.write_uint(len(payload))
            if first_qi == -1:
                first_qi = qi
            w.write_uint(first_qi)
            w.sync()
            w.write_bytes(bytes(payload))
    w.sync()
    return w.get_bytes(), band_bits
