"""Jitted TPU compute pipelines for the encoder.

`make_lowdelay_analyze(...)` builds the fully-jitted per-frame TPU program
for low-delay encoding: DC-offset removal, edge extension, multi-level IWT,
slice reordering, dead-zone quantisation at every candidate base index, and
per-slice bit/last-nonzero aggregates. The host only runs the tiny per-slice
quant-index search and DC chains on the returned aggregates.

Frames-within-GOP data parallelism lives elsewhere: on a mesh, dryrun 1
(`__graft_entry__`) shards the fused 2-ref inter step one-B-per-device;
on a single chip, `encoder.inter.start_inter_batch` vmaps a subgroup's
B pictures into one program.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu import tables
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.ops import quant as q
from schroedinger_tpu.ops import wavelet as wv
from schroedinger_tpu.params import Params, subband_count


def _sint_bits_jnp(v):
    """Encoded sint VLC bit length (vectorized, jnp). v int32."""
    m = jnp.abs(v.astype(jnp.int32))
    n = 32 - jax.lax.clz(m + 1)
    return 2 * n - 1 + (m != 0)


def make_lowdelay_analyze(p: Params):
    """Returns jitted fn(y_u8, u_u8, v_u8) ->
    (y_slices, u_slices, v_slices, per-base aggregates...).

    All shapes/static config are closed over; the function is pure and
    jit-compiled once per video format.
    """
    depth = p.transform_depth
    wavelet = p.wavelet_filter_index
    ny, nx = p.n_vert_slices, p.n_horiz_slices
    nb = subband_count(depth)
    qm = np.asarray(p.quant_matrix[:nb], dtype=np.int32)
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]

    QF = jnp.asarray(tables.QUANT_FACTOR, jnp.int32)
    QO = jnp.asarray(tables.QUANT_OFFSET_1_2, jnp.int32)
    bd = p.video_format.bit_depth

    def prep_and_slice(plane, oh, ow):
        # deep (10/16-bit) sources use the s32 path (schrolowdelay.c:110-763)
        # with a PLAIN widen: only the 8-bit path recentres by 128
        # (orc_convert_s32_s16 vs orc_offsetconvert_s16_u8)
        if bd > 8:
            x = plane.astype(jnp.int32)
        else:
            x = plane.astype(jnp.int16) - 128
        h, w = x.shape
        x = jnp.pad(x, ((0, oh - h), (0, ow - w)), mode="edge")
        pyr = wv.forward(x, depth, wavelet)
        bands = list(sl.subband_arrays(pyr, depth))  # int16 on the wire
        sliced, bidx = sl.to_slices(bands, ny, nx)
        return sliced, bidx

    def aggregates(sliced, qmo, dcs):
        """Per-base (61) bits + last-nonzero over the non-DC segment."""
        nd = sliced[..., dcs:].astype(jnp.int32)
        qmo_nd = jnp.asarray(qmo[dcs:])
        pos = jnp.arange(nd.shape[-1], dtype=jnp.int32)

        def per_base(base):
            qi = jnp.clip(base - qmo_nd, 0, 60)
            qq = q.quantise(nd, QF[qi], QO[qi])
            bits = _sint_bits_jnp(qq).sum(axis=-1)
            nz = qq != 0
            lastnz = jnp.where(nz.any(-1),
                               jnp.where(nz, pos, -1).max(-1), -1)
            return bits.astype(jnp.int32), lastnz.astype(jnp.int32)

        return jax.lax.map(per_base, jnp.arange(61, dtype=jnp.int32))

    def analyze(y, u, v):
        outs = []
        for plane, (oh, ow) in zip((y, u, v), iwt_dims):
            sliced, bidx = prep_and_slice(plane, oh, ow)
            outs.append((sliced, bidx))
        (ys, ybi), (us, ubi), (vs, _) = outs
        dcs_y = int(np.sum(ybi == 0))
        dcs_uv = int(np.sum(ubi == 0))
        y_agg = aggregates(ys, qm[ybi], dcs_y)
        u_agg = aggregates(us, qm[ubi], dcs_uv)
        v_agg = aggregates(vs, qm[ubi], dcs_uv)
        return ys, us, vs, y_agg, u_agg, v_agg

    return jax.jit(analyze)


def make_lowdelay_transform(p: Params):
    """Jitted fn(y, u, v) -> (y_slices, u_slices, v_slices): the TPU part of
    low-delay encoding when the native host coder does the search/packing."""
    depth = p.transform_depth
    wavelet = p.wavelet_filter_index
    ny, nx = p.n_vert_slices, p.n_horiz_slices
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]

    bd = p.video_format.bit_depth

    def one(plane, oh, ow):
        if bd > 8:
            x = plane.astype(jnp.int32)   # plain widen, no recentring
        else:
            x = plane.astype(jnp.int16) - 128
        h, w = x.shape
        x = jnp.pad(x, ((0, oh - h), (0, ow - w)), mode="edge")
        pyr = wv.forward(x, depth, wavelet)
        # keep int16 on the wire: halves host<->device transfer volume
        bands = list(sl.subband_arrays(pyr, depth))
        sliced, _ = sl.to_slices(bands, ny, nx)
        return sliced

    def run(y, u, v):
        return tuple(one(pl, oh, ow)
                     for pl, (oh, ow) in zip((y, u, v), iwt_dims))

    return jax.jit(run)


