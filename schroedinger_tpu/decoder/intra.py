"""Dirac intra picture decoder (arith / no-arith residuals).

Mirrors schrodecoder.c: parse per-subband lengths/quant indices
(:2938-2987), decode codeblocks with contexts (:3018-3100), DC prediction
for intra band 0 (:3220-3247), then the inverse wavelet on TPU.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding import subband as sb
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.decoder.lowdelay import _inverse_jit, _to_u8

from functools import partial


@partial(jax.jit, static_argnums=(1, 2, 3))
def _to_deep(plane_s32, h: int, w: int, bit_depth: int):
    """Deep output: values are already offset-binary (no recentring in the
    deep path); the reference plain-narrows S32->S16 (wrap), we clip to
    the legal range instead."""
    x = plane_s32[:h, :w].astype(jnp.int32)
    return jnp.clip(x, 0, (1 << bit_depth) - 1).astype(jnp.uint16)
from schroedinger_tpu.params import (Params, subband_count, subband_info,
                                     subband_position)

try:
    from schroedinger_tpu.coding import native as _native
except Exception:
    _native = None


def _codeblock_counts(p: Params, index: int):
    position = subband_position(index)
    if index == 0:
        return p.horiz_codeblocks[0], p.vert_codeblocks[0]
    level = position >> 2
    return p.horiz_codeblocks[level + 1], p.vert_codeblocks[level + 1]


def _band_shapes(p: Params, comp: int):
    depth = p.transform_depth
    iwt_h = p.iwt_luma_height if comp == 0 else p.iwt_chroma_height
    iwt_w = p.iwt_luma_width if comp == 0 else p.iwt_chroma_width
    shapes = [(iwt_h >> depth, iwt_w >> depth)]
    for i in range(1, subband_count(depth)):
        shift = depth - ((i - 1) // 3)
        shapes.append((iwt_h >> shift, iwt_w >> shift))
    return shapes


def dc_predict_integrate_np(band, deep=False):
    if _native is not None:
        return _native.dc_predict_integrate(band, deep=deep)
    b = band.astype(np.int32)
    h, w = b.shape
    if deep:
        div3 = lambda a: (int(a) - 2) // 3 if a < 0 else int(a) // 3
    else:
        div3 = lambda a: (np.int32(a) * np.int32(21845)
                          + np.int32(10922)) >> np.int32(16)
    for i in range(1, w):
        b[0, i] += b[0, i - 1]
    for j in range(1, h):
        b[j, 0] += b[j - 1, 0]
        for i in range(1, w):
            b[j, i] += div3(int(b[j, i - 1]) + int(b[j - 1, i])
                            + int(b[j - 1, i - 1]) + 1)
    return b


def decode_picture(payload: bytes, p: Params):
    """Decode intra transform data (payload starts at the first subband,
    byte aligned). Returns (y, u, v) uint8 planes."""
    depth = p.transform_depth
    nb = subband_count(depth)
    r = BitReader(payload)

    planes = []
    pic_sizes = [p.video_format.picture_luma_size(),
                 p.video_format.picture_chroma_size(),
                 p.video_format.picture_chroma_size()]
    for comp in range(3):
        shapes = _band_shapes(p, comp)
        bands = [None] * nb
        for index in range(nb):
            r.sync()
            h, w = shapes[index]
            length = r.read_uint()
            if length == 0:
                r.sync()
                bands[index] = np.zeros((h, w), dtype=np.int64)
                continue
            quant_index = r.read_uint()
            r.sync()
            start = r.bits_read // 8
            data = payload[start:start + length]
            r.skip_bits(length * 8)

            position = subband_position(index)
            hcb, vcb = _codeblock_counts(p, index)
            parent = bands[index - 3] if position >= 4 else None
            if p.is_noarith:
                bands[index] = _native.decode_subband_noarith(
                    data, (h, w), quant_index, position, hcb, vcb,
                    p.codeblock_mode_index == 1, num_refs=p.num_refs)
            else:
                bands[index] = sb.decode_subband_arith(
                    data, (h, w), quant_index, parent, position, hcb, vcb,
                    p.codeblock_mode_index == 1, is_intra=(p.num_refs == 0))
        bit_depth = p.video_format.bit_depth
        if p.num_refs == 0:
            bands[0] = dc_predict_integrate_np(bands[0],
                                               deep=bit_depth > 8)
        dt = np.int32 if bit_depth > 8 else np.int16
        pyr = sl.arrays_to_pyramid(
            [jnp.asarray(np.asarray(b, dtype=dt)) for b in bands], depth)
        planes.append(_inverse_jit(pyr, p.wavelet_filter_index))

    out = []
    bit_depth = p.video_format.bit_depth
    for plane, (w_pic, h_pic) in zip(planes, pic_sizes):
        if bit_depth > 8:
            out.append(np.asarray(_to_deep(plane, h_pic, w_pic, bit_depth)))
        else:
            out.append(np.asarray(_to_u8(plane, h_pic, w_pic)))
    return tuple(out)
