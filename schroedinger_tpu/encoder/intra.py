"""Dirac intra (main-intra / simple) picture encoder.

Structure (schroencoder.c schro_encoder_encode_picture, :2463-2643, intra
path): parse info + picture header + transform parameters + per-subband
coded data (arith or no-arith). The wavelet transform runs on TPU; subband
quantisation with per-codeblock quant indices and the entropy coding run on
the host (native C++ fast path, Python reference fallback).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from schroedinger_tpu.bitstream import (BitWriter, parse_code_picture,
                                        write_parse_info, write_picture_header,
                                        write_transform_parameters)
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding import subband as sb
from schroedinger_tpu.coding.bitio import BitWriter as _BW
from schroedinger_tpu.encoder.lowdelay import _prep_plane, _forward_jit

from functools import partial
import jax


@partial(jax.jit, static_argnums=(1, 2, 3))
def _prep_plane_deep(plane_u16, out_h: int, out_w: int, bit_depth: int):
    """Deep (10/16-bit) input prep: the reference widens S16 input to its
    S32 internal frames with a PLAIN convert — no recentring; only the
    8-bit path subtracts 128 (orc_convert_s32_s16 schroorc.orc:479-487 vs
    orc_offsetconvert_s16_u8 :524-530)."""
    del bit_depth
    x = plane_u16.astype(jnp.int32)
    h, w = x.shape
    return jnp.pad(x, ((0, out_h - h), (0, out_w - w)), mode="edge")
from schroedinger_tpu.params import (Params, subband_count, subband_info,
                                     subband_position)


def _codeblock_counts(p: Params, index: int):
    position = subband_position(index)
    if index == 0:
        return p.horiz_codeblocks[0], p.vert_codeblocks[0]
    level = position >> 2
    return p.horiz_codeblocks[level + 1], p.vert_codeblocks[level + 1]


def encode_picture(planes_u8, p: Params, frame_number: int,
                   quant_indices=None, is_ref: bool = False,
                   retired: int | None = None,
                   return_recon: bool = False,
                   band_bits_out: list | None = None):
    """Encode one intra picture; quant_indices: either None (all zero:
    lossless), an int, or a map (component, subband) -> (vcb, hcb) array.

    band_bits_out: optional list; when given, a (3*nb,) per-(component,
    band) coded-payload-bits array is appended (actual_subband_bits
    analog, schroencoder.c:2548-2568, for the arith-correction EMA)."""
    depth = p.transform_depth
    nb = subband_count(depth)
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]

    w = BitWriter()
    code = parse_code_picture(is_ref, 0, False, p.is_noarith)
    write_parse_info(w, code)
    retired_delta = None
    if is_ref:
        retired_delta = 0 if retired is None else retired - frame_number
    write_picture_header(w, frame_number, retired_delta=retired_delta)
    w.sync()
    write_transform_parameters(w, p)
    w.sync()

    bit_depth = p.video_format.bit_depth
    band_bits = np.zeros(3 * nb, np.float64)
    recon_planes = []
    for comp, (plane, (oh, ow)) in enumerate(zip(planes_u8, iwt_dims)):
        if bit_depth > 8:
            prepped = _prep_plane_deep(jnp.asarray(plane), oh, ow, bit_depth)
        else:
            prepped = _prep_plane(jnp.asarray(plane), oh, ow)
        pyr = _forward_jit(prepped, depth, p.wavelet_filter_index)
        bands = [np.asarray(b, dtype=np.int64)
                 for b in sl.subband_arrays(pyr, depth)]

        deq_bands = [None] * nb
        for index in range(nb):
            hcb, vcb = _codeblock_counts(p, index)
            position = subband_position(index)
            if quant_indices is None:
                qi_arr = np.zeros((vcb, hcb), dtype=np.int32)
            elif np.isscalar(quant_indices):
                qi_arr = np.full((vcb, hcb), int(quant_indices), np.int32)
            else:
                qi_arr = np.asarray(quant_indices[(comp, index)], np.int32)

            qdata, deq = sb.quantise_subband(
                bands[index], qi_arr, position, hcb, vcb,
                is_intra=(p.num_refs == 0), deep=bit_depth > 8)
            deq_bands[index] = deq

            w.sync()
            if not np.any(qdata):
                w.write_uint(0)
                continue

            parent_deq = deq_bands[index - 3] if position >= 4 else None
            have_qo = p.codeblock_mode_index == 1
            if p.is_noarith:
                from schroedinger_tpu.coding import native as _nat
                payload = _nat.encode_subband_noarith(
                    qdata, position, hcb, vcb, have_qo)
                first_qi = int(qi_arr[0, 0])
            else:
                payload, first_qi = sb.encode_subband_arith(
                    qdata, parent_deq, position, hcb, vcb, have_qo, qi_arr)
            band_bits[comp * nb + index] = 8 * len(payload)
            w.write_uint(len(payload))
            if first_qi == -1:
                first_qi = int(qi_arr[0, 0])
            if len(payload) > 0:
                w.write_uint(first_qi)
                w.sync()
                w.write_bytes(bytes(payload))
        if return_recon:
            from schroedinger_tpu.coding import slices as _sl
            from schroedinger_tpu.decoder.lowdelay import _inverse_jit, _to_u8
            from schroedinger_tpu.decoder.intra import _to_deep
            dt = np.int32 if bit_depth > 8 else np.int16
            rpyr = _sl.arrays_to_pyramid(
                [jnp.asarray(np.asarray(b, dtype=dt)) for b in deq_bands],
                depth)
            rplane = _inverse_jit(rpyr, p.wavelet_filter_index)
            sizes = [p.video_format.picture_luma_size(),
                     p.video_format.picture_chroma_size(),
                     p.video_format.picture_chroma_size()]
            (w_pic, h_pic) = sizes[comp]
            if bit_depth > 8:
                recon_planes.append(np.asarray(
                    _to_deep(rplane, h_pic, w_pic, bit_depth)))
            else:
                recon_planes.append(np.asarray(_to_u8(rplane, h_pic, w_pic)))
    w.sync()
    if band_bits_out is not None:
        band_bits_out.append(band_bits)
    if return_recon:
        return w.get_bytes(), tuple(recon_planes)
    return w.get_bytes()
