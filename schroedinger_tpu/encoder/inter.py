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
from schroedinger_tpu.ops import obmc
from schroedinger_tpu.params import Params, subband_count, subband_position

try:
    from schroedinger_tpu.coding import native as _native
except Exception:  # pragma: no cover
    _native = None

_ME_CACHE = {}


def _get_me(p: Params, n_extra: int = 0):
    vf = p.video_format
    key = (vf.width, vf.height, p.xbsep_luma, p.ybsep_luma,
           p.x_num_blocks, p.y_num_blocks, n_extra)
    fn = _ME_CACHE.get(key)
    if fn is None:
        fn = me_mod.make_me_fn(vf.height, vf.width, p.xbsep_luma,
                               p.ybsep_luma, p.x_num_blocks, p.y_num_blocks,
                               n_extra=n_extra)
        _ME_CACHE[key] = fn
    return fn


N_PHASECORR_CANDS = 8


def _phasecorr_candidates(p: Params, cur_y, ref_y):
    """Phase-correlation candidate vectors for this frame pair (device)."""
    from schroedinger_tpu.encoder import phasecorr as pcm
    vf = p.video_format
    key = ("pc", vf.width, vf.height)
    fn = _ME_CACHE.get(key)
    if fn is None:
        fn = pcm.make_phasecorr_fn(vf.height, vf.width)
        _ME_CACHE[key] = fn
    vecs = fn(cur_y, ref_y)
    return jnp.asarray(
        pcm.pick_candidates(np.asarray(vecs), n=N_PHASECORR_CANDS))


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _mode_stats(cur_y, ref_y, mv, ybsep, xbsep, ynb, xnb):
    """Per-block SAD of the MC prediction and of the DC (mean) prediction."""
    H = ybsep * ynb
    W = xbsep * xnb
    h, w = cur_y.shape
    c = jnp.pad(cur_y, ((0, H - h), (0, W - w)), mode="edge").astype(jnp.int32)
    r = jnp.pad(ref_y, ((0, H - h), (0, W - w)), mode="edge")
    dy_pix = jnp.repeat(jnp.repeat(mv[..., 0], ybsep, 0), xbsep, 1)
    dx_pix = jnp.repeat(jnp.repeat(mv[..., 1], ybsep, 0), xbsep, 1)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    sy = jnp.clip(yy + dy_pix, 0, H - 1)
    sx = jnp.clip(xx + dx_pix, 0, W - 1)
    pred = r[sy, sx].astype(jnp.int32)
    sad_mc = jnp.abs(c - pred).reshape(ynb, ybsep, xnb, xbsep).sum((1, 3))
    bmean = c.reshape(ynb, ybsep, xnb, xbsep).mean(axis=(1, 3))
    bmean_i = jnp.round(bmean).astype(jnp.int32)
    sad_dc = jnp.abs(c - jnp.repeat(jnp.repeat(bmean_i, ybsep, 0), xbsep, 1)
                     ).reshape(ynb, ybsep, xnb, xbsep).sum((1, 3))
    return sad_mc, sad_dc, bmean_i


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _block_means(plane, dummy, bsep_y, bsep_x, ynb, xnb):
    H, W = bsep_y * ynb, bsep_x * xnb
    h, w = plane.shape
    c = jnp.pad(plane, ((0, H - h), (0, W - w)), mode="edge").astype(jnp.int32)
    m = c.reshape(ynb, bsep_y, xnb, bsep_x).mean(axis=(1, 3))
    return jnp.round(m).astype(jnp.int32)


def _derive_splits(mv_fields, xnb, ynb):
    """Per-superblock split from block equality: 0 if all 16 equal, 1 if the
    four 2x2 quads are internally equal, else 2. Returns (ynb, xnb) array
    broadcast to blocks."""
    keys = np.stack([mv_fields[k] for k in
                     ("pred_mode", "dx1", "dy1", "dc0", "dc1", "dc2")], axis=-1)
    split = np.full((ynb, xnb), 2, np.int32)
    for j in range(0, ynb, 4):
        for i in range(0, xnb, 4):
            blk = keys[j:j + 4, i:i + 4]
            if (blk == blk[0, 0]).all():
                split[j:j + 4, i:i + 4] = 0
            else:
                ok1 = all((blk[a:a + 2, b:b + 2] == blk[a, b]).all()
                          for a in (0, 2) for b in (0, 2))
                split[j:j + 4, i:i + 4] = 1 if ok1 else 2
    return split


def _enforce_units(mv_fields, split, xnb, ynb):
    """Make block values consistent with the split units (copy the unit's
    top-left block into all members)."""
    for j in range(0, ynb, 4):
        for i in range(0, xnb, 4):
            s = split[j, i]
            if s == 2:
                continue
            step = 4 if s == 0 else 2
            for a in range(0, 4, step):
                for b in range(0, 4, step):
                    for k, arr in mv_fields.items():
                        arr[j + a:j + a + step, i + b:i + b + step] = \
                            arr[j + a, i + b]


def estimate_motion(planes_u8, ref: RefFrame, p: Params, lambda_dc=1.1,
                    use_phasecorr=False):
    """Full-pel ME + mode decision. Returns the MV field dict.

    use_phasecorr adds FFT phase-correlation candidate vectors to the
    search (schromotionest.c:80,1206 under enable_phasecorr_estimation)."""
    xnb, ynb = p.x_num_blocks, p.y_num_blocks
    cur_y = jnp.asarray(planes_u8[0])
    ref_y = jnp.asarray(ref.planes[0])
    if use_phasecorr:
        cands = _phasecorr_candidates(p, cur_y, ref_y)
        me = _get_me(p, n_extra=N_PHASECORR_CANDS)
        dy, dx = me(cur_y, ref_y, cands)
    else:
        me = _get_me(p)
        dy, dx = me(cur_y, ref_y)
    mv = jnp.stack([dy, dx], axis=-1)
    if p.mv_precision > 0:
        vf0 = p.video_format
        key = ("subpel", vf0.width, vf0.height, p.xbsep_luma, p.ybsep_luma,
               p.x_num_blocks, p.y_num_blocks, p.mv_precision)
        fn = _ME_CACHE.get(key)
        if fn is None:
            fn = me_mod.make_subpel_refine(vf0.height, vf0.width,
                                           p.xbsep_luma, p.ybsep_luma,
                                           p.x_num_blocks, p.y_num_blocks,
                                           p.mv_precision)
            _ME_CACHE[key] = fn
        dy_s, dx_s = fn(cur_y, ref.get_upsampled()[0], dy, dx)
    sad_mc, sad_dc, mean_y = _mode_stats(cur_y, ref_y, mv, p.ybsep_luma,
                                         p.xbsep_luma, ynb, xnb)
    h_shift = p.video_format.chroma_format.h_shift
    v_shift = p.video_format.chroma_format.v_shift
    mean_u = _block_means(jnp.asarray(planes_u8[1]), None,
                          p.ybsep_luma >> v_shift, p.xbsep_luma >> h_shift,
                          ynb, xnb)
    mean_v = _block_means(jnp.asarray(planes_u8[2]), None,
                          p.ybsep_luma >> v_shift, p.xbsep_luma >> h_shift,
                          ynb, xnb)

    sad_mc = np.asarray(sad_mc)
    sad_dc = np.asarray(sad_dc)
    use_dc = sad_dc.astype(np.float64) * lambda_dc < sad_mc
    pred_mode = np.where(use_dc, 0, 1).astype(np.int32)

    if p.mv_precision > 0:
        dx_final = np.asarray(dx_s)
        dy_final = np.asarray(dy_s)
    else:
        dx_final = np.asarray(dx)
        dy_final = np.asarray(dy)
    fields = {
        "split": np.full((ynb, xnb), 2, np.int32),
        "pred_mode": pred_mode,
        "using_global": np.zeros((ynb, xnb), np.int32),
        "dx1": (dx_final * (pred_mode == 1)).astype(np.int32),
        "dy1": (dy_final * (pred_mode == 1)).astype(np.int32),
        "dx2": np.zeros((ynb, xnb), np.int32),
        "dy2": np.zeros((ynb, xnb), np.int32),
        "dc0": (np.clip(np.asarray(mean_y) - 128, -128, 127)
                * (pred_mode == 0)).astype(np.int32),
        "dc1": (np.clip(np.asarray(mean_u) - 128, -128, 127)
                * (pred_mode == 0)).astype(np.int32),
        "dc2": (np.clip(np.asarray(mean_v) - 128, -128, 127)
                * (pred_mode == 0)).astype(np.int32),
    }
    split = _derive_splits(fields, xnb, ynb)
    fields["split"] = split
    _enforce_units(fields, split, xnb, ynb)
    return fields


def render_prediction(mv, p: Params, ref1: RefFrame,
                      ref2: Optional[RefFrame] = None):
    """OBMC prediction planes (s16, offset removed) — same jitted kernel the
    decoder uses, so encoder/decoder reconstructions match exactly."""
    mvj = {k: jnp.asarray(v) for k, v in mv.items()}
    render = obmc.make_render_fn(p, 2 if ref2 is not None else 1)
    if ref2 is not None:
        return render(mvj, tuple(ref1.get_upsampled()),
                      tuple(ref2.get_upsampled()))
    return render(mvj, tuple(ref1.get_upsampled()))


@partial(jax.jit, static_argnums=(2, 3))
def _residual(plane_u8, pred, iwt_h, iwt_w):
    """residual = (input - 128) - pred over the picture, zero beyond."""
    h, w = plane_u8.shape
    res = plane_u8.astype(jnp.int16) - 128 - pred.astype(jnp.int16)
    return jnp.pad(res, ((0, iwt_h - h), (0, iwt_w - w)))


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


def encode_inter_picture(planes_u8, p: Params, frame_number: int,
                         ref1_num: int, ref1: RefFrame,
                         base_qi: int = 20, is_ref: bool = True,
                         retired: Optional[int] = None,
                         target_bits: Optional[int] = None,
                         rc_correction: float = 1.0,
                         use_phasecorr: bool = False):
    """Encode one P picture. Returns (parse_unit_bytes, recon_planes,
    estimated_bits)."""
    assert _native is not None
    depth = p.transform_depth
    nb = subband_count(depth)
    vf = p.video_format

    mv = estimate_motion(planes_u8, ref1, p, use_phasecorr=use_phasecorr)
    preds = render_prediction(mv, p, ref1)

    # residuals -> IWT -> quantise + arith encode
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]
    qm = np.asarray(p.quant_matrix[:nb], np.int32)

    w = BitWriter()
    code = parse_code_picture(is_ref, 1, False, False)
    write_parse_info(w, code)
    retired_delta = None
    if is_ref:
        retired_delta = (retired - frame_number) if retired is not None else 0
    write_picture_header(w, frame_number,
                         ref_deltas=[ref1_num - frame_number],
                         retired_delta=retired_delta)
    w.sync()
    write_prediction_parameters(w, p)
    w.sync()
    bufs = _native.motion_encode(mv, p.x_num_blocks, p.y_num_blocks, 1)
    for s in range(9):
        if bufs[s] is None:
            continue
        w.write_uint(len(bufs[s]))
        w.sync()
        for byte in bufs[s]:
            w.write_bits(8, byte)
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

    pyramids = []
    for comp in range(3):
        oh, ow = iwt_dims[comp]
        res = _residual(jnp.asarray(planes_u8[comp]), preds[comp], oh, ow)
        pyramids.append(_forward_jit(res, depth, p.wavelet_filter_index))

    est_bits = None
    if target_bits is not None:
        from schroedinger_tpu.encoder import ratecontrol as rcmod
        band_lists = [sl.subband_arrays(pyr, depth) for pyr in pyramids]
        base_qi = rcmod.pick_base_qi(band_lists, p, target_bits, intra=False,
                                     correction=rc_correction)

    import jax as _jax
    flats = []
    shapes3 = []
    for comp in range(3):
        flat, shapes = sl.flatten_pyramid(pyramids[comp], depth)
        flats.append(flat)
        shapes3.append(shapes)
    host_flats = _jax.device_get(flats)  # one batched transfer

    recon_planes = []
    for comp in range(3):
        bands = [np.ascontiguousarray(b) for b in
                 sl.unflatten_host(host_flats[comp], shapes3[comp])]
        deq_bands = [None] * nb
        for index in range(nb):
            hcb, vcb = _codeblock_counts(p, index)
            position = subband_position(index)
            qi = int(np.clip(base_qi - qm[index], 0, 60))
            qi_arr = np.full((vcb, hcb), qi, np.int32)
            qdata, deq = sb.quantise_subband(bands[index], qi_arr, position,
                                             hcb, vcb, is_intra=False)
            deq_bands[index] = deq
            w.sync()
            if not np.any(qdata):
                w.write_uint(0)
                continue
            parent_deq = deq_bands[index - 3] if position >= 4 else None
            payload, first_qi = sb.encode_subband_arith(
                qdata, parent_deq, position, hcb, vcb,
                p.codeblock_mode_index == 1, qi_arr)
            w.write_uint(len(payload))
            if first_qi == -1:
                first_qi = qi
            w.write_uint(first_qi)
            w.sync()
            for byte in payload:
                w.write_bits(8, byte)

        # reconstruction: IIWT of dequantised bands + pred, clamped
        rpyr = sl.arrays_to_pyramid(
            [jnp.asarray(np.asarray(b, dtype=np.int16)) for b in deq_bands],
            depth)
        rres = _inverse_jit(rpyr, p.wavelet_filter_index)
        pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                     vf.picture_chroma_size()]
        (w_pic, h_pic) = pic_sizes[comp]
        recon_planes.append(np.asarray(
            _combine(rres, preds[comp], (h_pic, w_pic))))
    w.sync()
    return w.get_bytes(), tuple(recon_planes), base_qi


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _mode_stats_biref(cur_y, ref1_y, ref2_y, mvs, ybsep, xbsep, ynb, xnb):
    """Per-block SADs for ref1/ref2/biref given per-ref full-pel MV fields.

    mvs: (2, yb, xb, 2). Returns (sad1, sad2, sad_bi, sad_dc, mean)."""
    H = ybsep * ynb
    W = xbsep * xnb
    h, w = cur_y.shape
    c = jnp.pad(cur_y, ((0, H - h), (0, W - w)), mode="edge").astype(jnp.int32)

    def sample(ref_y, mv):
        r = jnp.pad(ref_y, ((0, H - h), (0, W - w)), mode="edge")
        dy_pix = jnp.repeat(jnp.repeat(mv[..., 0], ybsep, 0), xbsep, 1)
        dx_pix = jnp.repeat(jnp.repeat(mv[..., 1], ybsep, 0), xbsep, 1)
        yy = jnp.arange(H)[:, None]
        xx = jnp.arange(W)[None, :]
        sy = jnp.clip(yy + dy_pix, 0, H - 1)
        sx = jnp.clip(xx + dx_pix, 0, W - 1)
        return r[sy, sx].astype(jnp.int32)

    p1 = sample(ref1_y, mvs[0])
    p2 = sample(ref2_y, mvs[1])

    def bsum(x):
        return x.reshape(ynb, ybsep, xnb, xbsep).sum((1, 3))

    sad1 = bsum(jnp.abs(c - p1))
    sad2 = bsum(jnp.abs(c - p2))
    sad_bi = bsum(jnp.abs(c - ((p1 + p2 + 1) >> 1)))
    bmean = jnp.round(c.reshape(ynb, ybsep, xnb, xbsep).mean((1, 3))
                      ).astype(jnp.int32)
    sad_dc = bsum(jnp.abs(c - jnp.repeat(jnp.repeat(bmean, ybsep, 0),
                                         xbsep, 1)))
    return sad1, sad2, sad_bi, sad_dc, bmean


def estimate_motion_biref(planes_u8, ref1: RefFrame, ref2: RefFrame,
                          p: Params, lambda_dc=1.1, lambda_bi=0.95):
    """Two-ref ME + 4-way mode decision (DC/ref1/ref2/biref)."""
    xnb, ynb = p.x_num_blocks, p.y_num_blocks
    cur_y = jnp.asarray(planes_u8[0])
    me = _get_me(p)
    dys, dxs = [], []
    for ref in (ref1, ref2):
        dy, dx = me(cur_y, jnp.asarray(ref.planes[0]))
        dys.append(dy)
        dxs.append(dx)
    mvs = jnp.stack([jnp.stack([dys[i], dxs[i]], axis=-1) for i in range(2)])
    sad1, sad2, sad_bi, sad_dc, mean_y = _mode_stats_biref(
        cur_y, jnp.asarray(ref1.planes[0]), jnp.asarray(ref2.planes[0]),
        mvs, p.ybsep_luma, p.xbsep_luma, ynb, xnb)

    h_shift = p.video_format.chroma_format.h_shift
    v_shift = p.video_format.chroma_format.v_shift
    mean_u = _block_means(jnp.asarray(planes_u8[1]), None,
                          p.ybsep_luma >> v_shift, p.xbsep_luma >> h_shift,
                          ynb, xnb)
    mean_v = _block_means(jnp.asarray(planes_u8[2]), None,
                          p.ybsep_luma >> v_shift, p.xbsep_luma >> h_shift,
                          ynb, xnb)

    costs = np.stack([np.asarray(sad_dc) * lambda_dc, np.asarray(sad1),
                      np.asarray(sad2), np.asarray(sad_bi) * lambda_bi])
    pred_mode = np.argmin(costs, axis=0).astype(np.int32)

    prec_scale = 1 << p.mv_precision
    use1 = ((pred_mode & 1) != 0)
    use2 = ((pred_mode & 2) != 0)
    fields = {
        "split": np.full((ynb, xnb), 2, np.int32),
        "pred_mode": pred_mode,
        "using_global": np.zeros((ynb, xnb), np.int32),
        "dx1": (np.asarray(dxs[0]) * prec_scale * use1).astype(np.int32),
        "dy1": (np.asarray(dys[0]) * prec_scale * use1).astype(np.int32),
        "dx2": (np.asarray(dxs[1]) * prec_scale * use2).astype(np.int32),
        "dy2": (np.asarray(dys[1]) * prec_scale * use2).astype(np.int32),
        "dc0": (np.clip(np.asarray(mean_y) - 128, -128, 127)
                * (pred_mode == 0)).astype(np.int32),
        "dc1": (np.clip(np.asarray(mean_u) - 128, -128, 127)
                * (pred_mode == 0)).astype(np.int32),
        "dc2": (np.clip(np.asarray(mean_v) - 128, -128, 127)
                * (pred_mode == 0)).astype(np.int32),
    }
    keys_extra = ("dx2", "dy2")
    split = _derive_splits(fields, xnb, ynb)
    fields["split"] = split
    _enforce_units(fields, split, xnb, ynb)
    return fields


def encode_b_picture(planes_u8, p: Params, frame_number: int,
                     ref1_num: int, ref1: RefFrame,
                     ref2_num: int, ref2: RefFrame,
                     base_qi: int = 24,
                     target_bits: Optional[int] = None,
                     rc_correction: float = 1.0) -> bytes:
    """Encode one non-reference B picture (2 refs, biref OBMC)."""
    assert _native is not None
    depth = p.transform_depth
    nb = subband_count(depth)
    vf = p.video_format

    mv = estimate_motion_biref(planes_u8, ref1, ref2, p)
    preds = render_prediction(mv, p, ref1, ref2)

    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]
    qm = np.asarray(p.quant_matrix[:nb], np.int32)

    w = BitWriter()
    code = parse_code_picture(False, 2, False, False)
    write_parse_info(w, code)
    write_picture_header(w, frame_number,
                         ref_deltas=[ref1_num - frame_number,
                                     ref2_num - frame_number])
    w.sync()
    write_prediction_parameters(w, p)
    w.sync()
    bufs = _native.motion_encode(mv, p.x_num_blocks, p.y_num_blocks, 2)
    for s in range(9):
        if bufs[s] is None:
            continue
        w.write_uint(len(bufs[s]))
        w.sync()
        for byte in bufs[s]:
            w.write_bits(8, byte)
    w.sync()
    w.write_bit(0)  # zero residual
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

    pyramids = []
    for comp in range(3):
        oh, ow = iwt_dims[comp]
        res = _residual(jnp.asarray(planes_u8[comp]), preds[comp], oh, ow)
        pyramids.append(_forward_jit(res, depth, p.wavelet_filter_index))

    if target_bits is not None:
        from schroedinger_tpu.encoder import ratecontrol as rcmod
        band_lists = [sl.subband_arrays(pyr, depth) for pyr in pyramids]
        base_qi = rcmod.pick_base_qi(band_lists, p, target_bits, intra=False,
                                     correction=rc_correction)

    for comp in range(3):
        bands = [np.asarray(b) for b in sl.subband_arrays(pyramids[comp],
                                                          depth)]
        deq_bands = [None] * nb
        for index in range(nb):
            hcb, vcb = _codeblock_counts(p, index)
            position = subband_position(index)
            qi = int(np.clip(base_qi - qm[index], 0, 60))
            qi_arr = np.full((vcb, hcb), qi, np.int32)
            qdata, deq = sb.quantise_subband(bands[index], qi_arr, position,
                                             hcb, vcb, is_intra=False)
            deq_bands[index] = deq
            w.sync()
            if not np.any(qdata):
                w.write_uint(0)
                continue
            parent_deq = deq_bands[index - 3] if position >= 4 else None
            payload, first_qi = sb.encode_subband_arith(
                qdata, parent_deq, position, hcb, vcb,
                p.codeblock_mode_index == 1, qi_arr)
            w.write_uint(len(payload))
            if first_qi == -1:
                first_qi = qi
            w.write_uint(first_qi)
            w.sync()
            for byte in payload:
                w.write_bits(8, byte)
    w.sync()
    return w.get_bytes()
