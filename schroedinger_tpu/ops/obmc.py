"""OBMC motion compensation + half-pel upsampling, TPU-first.

Semantics are bit-exact with the reference's scalar renderer
(schromotionref.c) and upsampler (schroframe.c:1514-1680, 2001-2029):

- upsample: 8-tap {-1,3,-7,21,21,-7,3,-1}, (x+16)>>5, clamp 0..255, edge
  clamped taps; half-pel planes H0 (orig), H1 (horiz), H2 (vert),
  H3 (horiz of vert); last row/col copy rules per mc_edgeextend usage.
- pixel fetch at precision p: prec0 nearest with clamp; prec1 half-pel
  plane select with clamp to [0, 2w-2]; prec2/3 bilinear between half-pel
  samples with /16 round.
- OBMC: per-pixel sum of up to 4 block contributions weighted by the
  raised-ramp wx*wy (6-bit), ROUND_SHIFT 6; DC blocks contribute dc+128;
  ref blocks weighted by picture weights with ref_weight_precision shift.

The vectorized formulation splits blocks into 2x2 parity groups (disjoint
patches within a group since xblen <= 2*xbsep) and scatter-adds four dense
canvases — no serial loops, fully jittable.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

UP_TAPS = jnp.asarray([-1, 3, -7, 21, 21, -7, 3, -1], jnp.int32)


def _conv8_edge(x, axis):
    """8-tap filter at half positions along axis with clamped taps.

    out[i] = clamp((sum_j taps[j] * x[clamp(i + j - 3)] + 16) >> 5, 0, 255)

    Formulated as edge-pad + static slices (dense; jnp.take lowers to a
    slow TPU gather)."""
    n = x.shape[axis]
    pad = [(0, 0), (0, 0)]
    pad[axis] = (3, 4)
    xp = jnp.pad(x, pad, mode="edge").astype(jnp.int32)
    acc = jnp.zeros(x.shape, jnp.int32)
    for j in range(8):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(j, j + n)
        acc = acc + xp[tuple(sl)] * UP_TAPS[j]
    return jnp.clip((acc + 16) >> 5, 0, 255).astype(jnp.uint8)


def upsample_plane(p):
    """u8 plane -> (H0, H1, H2, H3) half-pel planes (reference semantics)."""
    h, w = p.shape
    h0 = p
    # vertical half: rows 0..h-2 filtered, last row = source last row
    h2 = _conv8_edge(p, 0)
    h2 = h2.at[h - 1, :].set(p[h - 1, :])
    # horizontal half of H0: last col = source last col
    h1 = _conv8_edge(p, 1)
    h1 = h1.at[:, w - 1].set(p[:, w - 1])
    # horizontal half of H2; last col = H2 last col; last row = H1 last row
    h3 = _conv8_edge(h2, 1)
    h3 = h3.at[:, w - 1].set(h2[:, w - 1])
    h3 = h3.at[h - 1, :].set(h1[h - 1, :])
    return h0, h1, h2, h3


def make_halfpel(planes):
    """Stack the 4 half-pel planes into one (2h, 2w) interleaved array:
    up[2y + (i>>1), 2x + (i&1)] = plane_i[y, x].

    Dense stack/reshape interleave (strided .at[].set scatters are slow
    on TPU)."""
    h0, h1, h2, h3 = planes
    h, w = h0.shape
    top = jnp.stack([h0, h1], axis=2).reshape(h, 2 * w)
    bot = jnp.stack([h2, h3], axis=2).reshape(h, 2 * w)
    return jnp.stack([top, bot], axis=1).reshape(2 * h, 2 * w)


def upsample_frame_np(p):
    """numpy version of upsample_plane for the host/reference path."""
    taps = np.array([-1, 3, -7, 21, 21, -7, 3, -1], np.int32)

    def conv8(x, axis):
        n = x.shape[axis]
        acc = np.zeros(x.shape, np.int32)
        for j in range(8):
            idx = np.clip(np.arange(n) + (j - 3), 0, n - 1)
            acc += np.take(x, idx, axis=axis).astype(np.int32) * taps[j]
        return np.clip((acc + 16) >> 5, 0, 255).astype(np.uint8)

    h, w = p.shape
    h0 = p
    h2 = conv8(p, 0)
    h2[h - 1, :] = p[h - 1, :]
    h1 = conv8(p, 1)
    h1[:, w - 1] = p[:, w - 1]
    h3 = conv8(h2, 1)
    h3[:, w - 1] = h2[:, w - 1]
    h3[h - 1, :] = h1[h - 1, :]
    up = np.zeros((2 * h, 2 * w), p.dtype)
    up[0::2, 0::2] = h0
    up[0::2, 1::2] = h1
    up[1::2, 0::2] = h2
    up[1::2, 1::2] = h3
    return up


def _ramp_weights(blen, offset):
    """1-D OBMC ramp weights for one block (length blen), 6-bit half.

    get_ramp(x, offset) on the leading edge, mirrored on the trailing edge,
    8 in the middle (schromotionref.c:160-168, 185-209)."""
    def get_ramp(x, off):
        if off == 1:
            return 3 if x == 0 else 5
        return 1 + (6 * x + off - 1) // (2 * off - 1)

    w = np.full(blen, 8, np.int32)
    if offset > 0:
        for x in range(2 * offset):
            w[x] = get_ramp(x, offset)
            w[blen - 1 - x] = get_ramp(x, offset)
    return w


def obmc_weight_grids(x_num_blocks, y_num_blocks, xblen, yblen, xbsep, ybsep,
                      width, height):
    """Per-block (yblen, xblen) weight grids as a (yb, xb, yblen, xblen)
    numpy array, including the picture-edge wx=8/wy=8 overrides."""
    xoffset = (xblen - xbsep) // 2
    yoffset = (yblen - ybsep) // 2
    wx_base = _ramp_weights(xblen, xoffset)
    wy_base = _ramp_weights(yblen, yoffset)
    full_w = xbsep * x_num_blocks
    full_h = ybsep * y_num_blocks

    W = np.zeros((y_num_blocks, x_num_blocks, yblen, xblen), np.int32)
    for j in range(y_num_blocks):
        ymin = j * ybsep - yoffset
        wy = wy_base.copy()
        for t in range(yblen):
            y = ymin + t
            if yoffset == 0 or y < yoffset or y >= full_h - yoffset:
                wy[t] = 8
        for i in range(x_num_blocks):
            xmin = i * xbsep - xoffset
            wx = wx_base.copy()
            for t in range(xblen):
                x = xmin + t
                if xoffset == 0 or x < xoffset or x >= full_w - xoffset:
                    wx[t] = 8
            W[j, i] = wy[:, None] * wx[None, :]
    return W


def fetch_block(up, mv_precision, px0, py0, blen_y, blen_x):
    """Sample a (blen_y, blen_x) patch from interleaved half-pel plane `up`
    at sub-pel origin (px0, py0) in units of 1/2^prec pel.

    Matches schro_upsampled_frame_get_pixel_precN semantics:
    prec 0: nearest (clamp); prec 1: half-pel (clamp to 2w-2);
    prec 2/3: bilinear of half-pel with 1/4 or... prec2 maps x<<1 to prec3.
    """
    h2, w2 = up.shape  # 2h x 2w
    ys = py0 + jnp.arange(blen_y) * (1 << mv_precision)
    xs = px0 + jnp.arange(blen_x) * (1 << mv_precision)

    if mv_precision == 0:
        yy = jnp.clip(ys, 0, h2 // 2 - 1)
        xx = jnp.clip(xs, 0, w2 // 2 - 1)
        return up[2 * yy[:, None], 2 * xx[None, :]].astype(jnp.int32)
    if mv_precision == 1:
        yy = jnp.clip(ys, 0, h2 - 2)
        xx = jnp.clip(xs, 0, w2 - 2)
        return up[yy[:, None], xx[None, :]].astype(jnp.int32)

    # prec 2 -> scale to prec 3
    if mv_precision == 2:
        ys = ys << 1
        xs = xs << 1
    hy = ys >> 2
    hx = xs >> 2
    ry = (ys & 3)[:, None]
    rx = (xs & 3)[None, :]
    c_y0 = jnp.clip(hy, 0, h2 - 2)
    c_x0 = jnp.clip(hx, 0, w2 - 2)
    c_y1 = jnp.clip(hy + 1, 0, h2 - 2)
    c_x1 = jnp.clip(hx + 1, 0, w2 - 2)
    p00 = up[c_y0[:, None], c_x0[None, :]].astype(jnp.int32)
    p01 = up[c_y0[:, None], c_x1[None, :]].astype(jnp.int32)
    p10 = up[c_y1[:, None], c_x0[None, :]].astype(jnp.int32)
    p11 = up[c_y1[:, None], c_x1[None, :]].astype(jnp.int32)
    v = ((4 - ry) * (4 - rx) * p00 + (4 - ry) * rx * p01
         + ry * (4 - rx) * p10 + ry * rx * p11)
    return (v + 8) >> 4


def _fetch_pixels(up, mv_precision, px, py):
    """Per-pixel sub-pel fetch from an interleaved half-pel plane.

    px, py: (H, W) int32 coordinates in units of 1/2^prec pel. One or four
    whole-frame gathers (XLA-friendly; no per-block control flow).
    """
    h2, w2 = up.shape
    if mv_precision == 0:
        yy = jnp.clip(py, 0, h2 // 2 - 1)
        xx = jnp.clip(px, 0, w2 // 2 - 1)
        return up[2 * yy, 2 * xx].astype(jnp.int32)
    if mv_precision == 1:
        yy = jnp.clip(py, 0, h2 - 2)
        xx = jnp.clip(px, 0, w2 - 2)
        return up[yy, xx].astype(jnp.int32)
    if mv_precision == 2:
        px = px << 1
        py = py << 1
    hy = py >> 2
    hx = px >> 2
    ry = py & 3
    rx = px & 3
    c_y0 = jnp.clip(hy, 0, h2 - 2)
    c_x0 = jnp.clip(hx, 0, w2 - 2)
    c_y1 = jnp.clip(hy + 1, 0, h2 - 2)
    c_x1 = jnp.clip(hx + 1, 0, w2 - 2)
    p00 = up[c_y0, c_x0].astype(jnp.int32)
    p01 = up[c_y0, c_x1].astype(jnp.int32)
    p10 = up[c_y1, c_x0].astype(jnp.int32)
    p11 = up[c_y1, c_x1].astype(jnp.int32)
    v = ((4 - ry) * (4 - rx) * p00 + (4 - ry) * rx * p01
         + ry * (4 - rx) * p10 + ry * rx * p11)
    return (v + 8) >> 4


def global_vectors(gm, xs, ys):
    """Per-pixel global (affine) motion vectors in 1/2^prec pel units
    (schromotionref.c schro_motion_get_global_vector)."""
    b0, b1, a_exp, a00, a01, a10, a11, c_exp, c0, c1 = gm
    x = xs[None, :].astype(jnp.int32)
    y = ys[:, None].astype(jnp.int32)
    scale = (1 << c_exp) - (c0 * x + c1 * y)
    dx = (scale * (a00 * x + a01 * y + (1 << a_exp) * b0)) >> (a_exp + c_exp)
    dy = (scale * (a10 * x + a11 * y + (1 << a_exp) * b1)) >> (a_exp + c_exp)
    return dx, dy


def render_component(mv_dx, mv_dy, mv_dx2, mv_dy2, pred_mode, dc,
                     up1, up2, weights,
                     xblen, yblen, xbsep, ybsep, mv_precision,
                     ref1_weight, ref2_weight, ref_weight_precision,
                     out_h, out_w, h_shift=0, v_shift=0,
                     using_global=None, gm1=None, gm2=None, row0=0):
    """Render one component's OBMC prediction (s16, already offset -128).

    row0: global row of the first output row — set by the tile-sharded
    render (parallel/tiles.py) so each device computes its own output
    band with all block/weight/global-motion math in global coordinates.

    Phase-decomposed formulation: blocks split into 2x2 parity phases; in
    each phase every pixel is covered by at most one block, so the whole
    contribution is per-pixel index math + one (or four) dense gathers.

    mv_*: (yb, xb) int32 per-block luma-scaled MVs (chroma shift applied
    here); pred_mode: (yb, xb); dc: (yb, xb) per-component dc values;
    up1/up2: interleaved half-pel reference planes ((2h,2w) u8) or None;
    weights: (yb, xb, yblen, xblen) from obmc_weight_grids (unused in this
    formulation; kept for API compat).
    Returns (out_h, out_w) int32 = clamp(pred, 0, 255) - 128.
    """
    yb, xb = pred_mode.shape
    xoffset = (xblen - xbsep) // 2
    yoffset = (yblen - ybsep) // 2
    full_w = xbsep * xb
    full_h = ybsep * yb

    dx1 = mv_dx >> h_shift if h_shift else mv_dx
    dy1 = mv_dy >> v_shift if v_shift else mv_dy
    dx2 = mv_dx2 >> h_shift if h_shift else mv_dx2
    dy2 = mv_dy2 >> v_shift if v_shift else mv_dy2

    # 1-D ramp profiles within a block + picture-edge overrides
    wx_prof = jnp.asarray(_ramp_weights(xblen, xoffset))
    wy_prof = jnp.asarray(_ramp_weights(yblen, yoffset))
    ys = row0 + jnp.arange(out_h)
    xs = jnp.arange(out_w)

    acc = jnp.zeros((out_h, out_w), jnp.int32)
    for pj in range(2):
        for pi in range(2):
            # phase block index covering each pixel (parity pj/pi)
            jj = ((ys + yoffset - pj * ybsep) // (2 * ybsep)) * 2 + pj
            ii = ((xs + xoffset - pi * xbsep) // (2 * xbsep)) * 2 + pi
            ty = ys - (jj * ybsep - yoffset)       # offset within block
            tx = xs - (ii * xbsep - xoffset)
            vy = (ty >= 0) & (ty < yblen) & (jj >= 0) & (jj < yb)
            vx = (tx >= 0) & (tx < xblen) & (ii >= 0) & (ii < xb)
            jjc = jnp.clip(jj, 0, yb - 1)
            iic = jnp.clip(ii, 0, xb - 1)
            tyc = jnp.clip(ty, 0, yblen - 1)
            txc = jnp.clip(tx, 0, xblen - 1)

            # per-pixel weights with picture-edge overrides
            if yoffset == 0:
                wy = jnp.full(out_h, 8, jnp.int32)
            else:
                wy = jnp.where((ys < yoffset) | (ys >= full_h - yoffset),
                               8, wy_prof[tyc])
            if xoffset == 0:
                wx = jnp.full(out_w, 8, jnp.int32)
            else:
                wx = jnp.where((xs < xoffset) | (xs >= full_w - xoffset),
                               8, wx_prof[txc])
            wgt = (wy * vy)[:, None] * (wx * vx)[None, :]

            # per-pixel block fields
            J = jjc[:, None]
            I = iic[None, :]
            mode = pred_mode[J, I]
            wsum = ref1_weight + ref2_weight
            half = (1 << ref_weight_precision) >> 1

            v = (dc[J, I] + 128) * (mode == 0)
            if up1 is not None:
                bdx, bdy = dx1[J, I], dy1[J, I]
                if using_global is not None and gm1 is not None:
                    gdx, gdy = global_vectors(gm1, xs, ys)
                    gdx = gdx >> h_shift if h_shift else gdx
                    gdy = gdy >> v_shift if v_shift else gdy
                    ug = using_global[J, I] != 0
                    bdx = jnp.where(ug, gdx, bdx)
                    bdy = jnp.where(ug, gdy, bdy)
                px = (xs[None, :] << mv_precision) + bdx
                py = (ys[:, None] << mv_precision) + bdy
                p1 = _fetch_pixels(up1, mv_precision, px, py)
                v = v + (((wsum * p1 + half) >> ref_weight_precision)
                         * (mode == 1))
            if up2 is not None:
                bdx, bdy = dx2[J, I], dy2[J, I]
                if using_global is not None and gm2 is not None:
                    gdx, gdy = global_vectors(gm2, xs, ys)
                    gdx = gdx >> h_shift if h_shift else gdx
                    gdy = gdy >> v_shift if v_shift else gdy
                    ug = using_global[J, I] != 0
                    bdx = jnp.where(ug, gdx, bdx)
                    bdy = jnp.where(ug, gdy, bdy)
                px = (xs[None, :] << mv_precision) + bdx
                py = (ys[:, None] << mv_precision) + bdy
                p2 = _fetch_pixels(up2, mv_precision, px, py)
                v = v + (((wsum * p2 + half) >> ref_weight_precision)
                         * (mode == 2))
                if up1 is not None:
                    v = v + (((ref1_weight * p1 + ref2_weight * p2 + half)
                              >> ref_weight_precision) * (mode == 3))
            acc = acc + v * wgt
    pred = (acc + 32) >> 6
    return jnp.clip(pred, 0, 255) - 128


# ---------------------------------------------------------------------------
# Patch-based fast render path.
#
# XLA per-pixel gathers run ~10 ns/element on TPU (measured ~27 ms per
# 2M-index gather at 1080p), which made the gather-formulated render the
# encoder's bottleneck.  Dirac MVs are block-constant, so every block reads a
# *contiguous* patch of the half-pel plane: extract one patch per block with
# a batched dynamic-slice (cheap), then all four bilinear taps become static
# strided views of the patch and the OBMC accumulate becomes a dense
# phase-decomposed reshape.  No per-pixel index math remains.
#
# Bit-exactness: the per-sample clamp of schro_upsampled_frame_get_pixel_*
# is baked into a pre-padded plane (pad_halfpel); the bilinear weights,
# picture-weight scaling, ramp weights and >>6 round are the same integer
# arithmetic as render_component.  Valid whenever |mv| <= MV_BOUND_PEL
# (the encoder clamps its MVs there; the decoder checks decoded MVs and
# falls back to the per-pixel path for hostile streams) and there is no
# global motion (per-pixel vectors).
# ---------------------------------------------------------------------------

MV_BOUND_PEL = 128


def pad_halfpel(up, margin_y, margin_x):
    """Padded half-pel plane with the reference's per-sample clamp baked in:

    out[my + k, mx + l] == up[clip(k, 0, h2-2), clip(l, 0, w2-2)]  for all
    k, l reachable within the margins.  (Row h2-1 / col w2-1 are never read
    by any fetch precision — prec 0 reads even rows only, prec 1..3 clamp
    to h2-2 — so replacing them is exact.)"""
    h2, w2 = up.shape
    core = up.at[h2 - 1, :].set(up[h2 - 2, :])
    core = core.at[:, w2 - 1].set(core[:, w2 - 2])
    return jnp.pad(core, ((margin_y, margin_y), (margin_x, margin_x)),
                   mode="edge")


def _round8(n):
    return (n + 7) // 8 * 8


def extract_patches(P, oy, ox, ph, pw):
    """Batched dynamic-slice: (nb,) offsets -> (nb, ph, pw) patches."""
    Ph, Pw = P.shape
    oyc = jnp.clip(oy, 0, Ph - ph)
    oxc = jnp.clip(ox, 0, Pw - pw)

    def slc(a, b):
        return jax.lax.dynamic_slice(P, (a, b), (ph, pw))

    return jax.vmap(slc)(oyc, oxc)


def _weight_rows(nblocks, blen, bsep, offset):
    """(nblocks, blen) per-block-row 1-D OBMC weights with the picture-edge
    overrides of obmc_weight_grids."""
    prof = _ramp_weights(blen, offset)
    W = np.tile(prof, (nblocks, 1)).astype(np.int32)
    if offset > 0:
        W[0, :2 * offset] = 8
        W[nblocks - 1, bsep:] = 8
    else:
        W[:] = 8
    return W


def _sample_blocks(up, dy8, dx8, yb, xb, yblen, xblen, ybsep, xbsep,
                   yoffset, xoffset, margin_y, margin_x):
    """Per-block sub-pel sample grids.

    dy8/dx8: (yb, xb) eighth-pel MVs (= mv << (3 - prec), chroma-shifted).
    Returns (nb, yblen, xblen) int32 samples — the exact value
    schro_upsampled_frame_get_pixel_prec{0,1,3} would fetch per pixel."""
    nb = yb * xb
    P = pad_halfpel(up, margin_y, margin_x)
    oy = dy8 >> 2
    ox = dx8 >> 2
    ry = (dy8 & 3).reshape(nb, 1, 1)
    rx = (dx8 & 3).reshape(nb, 1, 1)
    base_y = 2 * (jnp.arange(yb) * ybsep - yoffset)[:, None] + margin_y
    base_x = 2 * (jnp.arange(xb) * xbsep - xoffset)[None, :] + margin_x
    ph = _round8(2 * yblen)
    pw = _round8(2 * xblen)
    pat = extract_patches(P, (base_y + oy).ravel(), (base_x + ox).ravel(),
                          ph, pw)
    q = pat.astype(jnp.int32)
    p00 = q[:, 0:2 * yblen:2, 0:2 * xblen:2]
    p01 = q[:, 0:2 * yblen:2, 1:2 * xblen:2]
    p10 = q[:, 1:2 * yblen:2, 0:2 * xblen:2]
    p11 = q[:, 1:2 * yblen:2, 1:2 * xblen:2]
    v = ((4 - ry) * (4 - rx) * p00 + (4 - ry) * rx * p01
         + ry * (4 - rx) * p10 + ry * rx * p11)
    return (v + 8) >> 4


def recompose_phases(contrib, yb, xb, yblen, xblen, ybsep, xbsep,
                     yoffset, xoffset, out_h, out_w):
    """Dense OBMC accumulate: (yb, xb, yblen, xblen) weighted block
    contributions -> (out_h, out_w) sum.  Blocks are split into 2x2 parity
    phases; within a phase the (padded) blocks tile a canvas disjointly, so
    placement is pad/transpose/reshape — no scatter."""
    assert yblen <= 2 * ybsep and xblen <= 2 * xbsep
    ybe = yb + (yb & 1)
    xbe = xb + (xb & 1)
    c = jnp.pad(contrib, ((0, ybe - yb), (0, xbe - xb),
                          (0, 2 * ybsep - yblen), (0, 2 * xbsep - xblen)))
    acc = jnp.zeros((out_h, out_w), jnp.int32)
    for pj in range(2):
        for pi in range(2):
            sub = c[pj::2, pi::2]
            A, B = sub.shape[0], sub.shape[1]
            canvas = sub.transpose(0, 2, 1, 3).reshape(A * 2 * ybsep,
                                                       B * 2 * xbsep)
            oy = pj * ybsep - yoffset
            ox = pi * xbsep - xoffset
            sy, cy = max(0, oy), max(0, -oy)
            sx, cx = max(0, ox), max(0, -ox)
            hh = min(out_h - sy, canvas.shape[0] - cy)
            ww = min(out_w - sx, canvas.shape[1] - cx)
            if hh <= 0 or ww <= 0:
                continue
            piece = canvas[cy:cy + hh, cx:cx + ww]
            acc = acc + jnp.pad(piece, ((sy, out_h - sy - hh),
                                        (sx, out_w - sx - ww)))
    return acc


def render_component_patches(mv_dx, mv_dy, mv_dx2, mv_dy2, pred_mode, dc,
                             up1, up2, xblen, yblen, xbsep, ybsep,
                             mv_precision, ref1_weight, ref2_weight,
                             ref_weight_precision, out_h, out_w,
                             h_shift=0, v_shift=0):
    """Patch-based equivalent of render_component (no global motion).

    Produces bit-identical output for |mv| <= MV_BOUND_PEL (luma pel)."""
    yb, xb = pred_mode.shape
    nb = yb * xb
    xoffset = (xblen - xbsep) // 2
    yoffset = (yblen - ybsep) // 2
    sh = 3 - mv_precision

    def to8(d, shift):
        d = d >> shift if shift else d
        return d << sh

    # margins: worst |mv| in half-pel + block reach + patch size
    margin_y = (MV_BOUND_PEL * 2 + 8) + 2 * yoffset + _round8(2 * yblen)
    margin_x = (MV_BOUND_PEL * 2 + 8) + 2 * xoffset + _round8(2 * xblen)

    mode = pred_mode.reshape(nb, 1, 1)
    wsum = ref1_weight + ref2_weight
    half = (1 << ref_weight_precision) >> 1

    val = (dc.reshape(nb, 1, 1) + 128) * (mode == 0)
    if up1 is not None:
        v1 = _sample_blocks(up1, to8(mv_dy, v_shift), to8(mv_dx, h_shift),
                            yb, xb, yblen, xblen, ybsep, xbsep,
                            yoffset, xoffset, margin_y, margin_x)
        val = val + (((wsum * v1 + half) >> ref_weight_precision)
                     * (mode == 1))
    if up2 is not None:
        v2 = _sample_blocks(up2, to8(mv_dy2, v_shift), to8(mv_dx2, h_shift),
                            yb, xb, yblen, xblen, ybsep, xbsep,
                            yoffset, xoffset, margin_y, margin_x)
        val = val + (((wsum * v2 + half) >> ref_weight_precision)
                     * (mode == 2))
        if up1 is not None:
            val = val + (((ref1_weight * v1 + ref2_weight * v2 + half)
                          >> ref_weight_precision) * (mode == 3))

    wy = jnp.asarray(_weight_rows(yb, yblen, ybsep, yoffset))
    wx = jnp.asarray(_weight_rows(xb, xblen, xbsep, xoffset))
    contrib = (val.reshape(yb, xb, yblen, xblen)
               * wy[:, None, :, None] * wx[None, :, None, :])
    acc = recompose_phases(contrib, yb, xb, yblen, xblen, ybsep, xbsep,
                           yoffset, xoffset, out_h, out_w)
    pred = (acc + 32) >> 6
    return jnp.clip(pred, 0, 255) - 128


_RENDER_CACHE = {}


def make_render_fn(p, num_refs: int, use_patches=None):
    """Cached jitted whole-picture OBMC render for a Params geometry.

    fn(mv_dict, up1_planes, [up2_planes]) -> (pred_y, pred_u, pred_v),
    all device arrays; upsampled planes stay on device.
    """
    import jax as _jax
    body = make_render_body(p, num_refs, use_patches=use_patches)
    key = ("jit", id(body))
    fn = _RENDER_CACHE.get(key)
    if fn is None:
        if num_refs > 1:
            fn = _jax.jit(body)
        else:
            fn = _jax.jit(lambda mv, up1: body(mv, up1, None))
        _RENDER_CACHE[key] = fn
    return fn


def make_render_body(p, num_refs: int, use_patches=None):
    """Raw (traceable) whole-picture render body: (mv, up1, up2) -> preds.
    Cached per geometry; compose inside larger jitted programs.

    use_patches: None = auto (patch fast path unless global motion or odd
    geometry); False forces the per-pixel gather path (decoder fallback for
    streams with |mv| > MV_BOUND_PEL)."""
    vf = p.video_format
    gmk = tuple()
    if p.have_global_motion:
        gmk = tuple((g.b0, g.b1, g.a_exp, g.a00, g.a01, g.a10, g.a11,
                     g.c_exp, g.c0, g.c1) for g in p.global_motion)
    if use_patches is None:
        use_patches = (not p.have_global_motion
                       and p.yblen_luma <= 2 * p.ybsep_luma
                       and p.xblen_luma <= 2 * p.xbsep_luma)
    key = (vf.width, vf.height, int(vf.chroma_format), p.xblen_luma,
           p.yblen_luma, p.xbsep_luma, p.ybsep_luma, p.mv_precision,
           p.picture_weight_1, p.picture_weight_2, p.picture_weight_bits,
           p.x_num_blocks, p.y_num_blocks, num_refs, gmk, use_patches)
    fn = _RENDER_CACHE.get(key)
    if fn is not None:
        return fn

    h_shift = vf.chroma_format.h_shift
    v_shift = vf.chroma_format.v_shift
    xnb, ynb = p.x_num_blocks, p.y_num_blocks
    pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                 vf.picture_chroma_size()]
    geo = []
    for k in range(3):
        if k == 0:
            geo.append((p.xblen_luma, p.yblen_luma, p.xbsep_luma,
                        p.ybsep_luma, 0, 0))
        else:
            geo.append((p.xblen_luma >> h_shift, p.yblen_luma >> v_shift,
                        p.xbsep_luma >> h_shift, p.ybsep_luma >> v_shift,
                        h_shift, v_shift))

    have_gm = p.have_global_motion
    gm_tuple = lambda g: (g.b0, g.b1, g.a_exp, g.a00, g.a01, g.a10, g.a11,
                          g.c_exp, g.c0, g.c1)
    gm1 = gm_tuple(p.global_motion[0]) if have_gm else None
    gm2 = gm_tuple(p.global_motion[1]) if (have_gm and num_refs > 1) else None

    def render(mv, up1, up2):
        preds = []
        for k in range(3):
            xblen, yblen, xbsep, ybsep, hs, vs = geo[k]
            (w_pic, h_pic) = pic_sizes[k]
            dc = (mv["dc0"], mv["dc1"], mv["dc2"])[k]
            if use_patches:
                preds.append(render_component_patches(
                    mv["dx1"], mv["dy1"], mv["dx2"], mv["dy2"],
                    mv["pred_mode"], dc,
                    up1[k], up2[k] if up2 is not None else None,
                    xblen, yblen, xbsep, ybsep, p.mv_precision,
                    p.picture_weight_1, p.picture_weight_2,
                    p.picture_weight_bits, h_pic, w_pic, hs, vs))
                continue
            preds.append(render_component(
                mv["dx1"], mv["dy1"], mv["dx2"], mv["dy2"],
                mv["pred_mode"], dc,
                up1[k], up2[k] if up2 is not None else None,
                None, xblen, yblen, xbsep, ybsep, p.mv_precision,
                p.picture_weight_1, p.picture_weight_2,
                p.picture_weight_bits, h_pic, w_pic, hs, vs,
                using_global=mv.get("using_global") if have_gm else None,
                gm1=gm1, gm2=gm2))
        return tuple(preds)

    _RENDER_CACHE[key] = render
    return render
