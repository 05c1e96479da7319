"""VC-2 low-delay picture decoder.

Slice payloads decode in lockstep across all slices (vectorized exp-Golomb);
dequantisation and the inverse wavelet run as array programs; only the small
LL DC-prediction integration is sequential (schrodecoder.c:3220-3247).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu import tables
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding import vlc
from schroedinger_tpu.ops import wavelet as wv
from schroedinger_tpu.params import Params, subband_count

try:
    from schroedinger_tpu.coding import native as _native
except Exception:  # pragma: no cover
    _native = None

QF = tables.QUANT_FACTOR.astype(np.int64)
QO = tables.QUANT_OFFSET_1_2.astype(np.int64)


def ilog2up(x: int) -> int:
    return int(x).bit_length()


def divide3(a):
    return (np.int32(a) * np.int32(21845) + np.int32(10922)) >> np.int32(16)


def divide3_s32(a):
    """Deep (s32) DC divide: schro_divide(a, 3), schrodecoder.c:3271."""
    a = int(a)
    return (a - 2) // 3 if a < 0 else a // 3


def dequantise_np(q, qf, qo):
    q = np.asarray(q, dtype=np.int64)
    mag = (np.abs(q) * qf + qo + 2) >> 2
    return np.where(q == 0, 0, np.where(q < 0, -mag, mag)).astype(np.int64)


def dc_predict_integrate(band: np.ndarray, deep: bool = False) -> np.ndarray:
    """In-place DC prediction integration (schro_decoder_subband_dc_predict;
    _s32 variant uses schro_divide, schrodecoder.c:3250-3275)."""
    if _native is not None:
        return _native.dc_predict_integrate(band, deep=deep)
    b = band.astype(np.int32)
    h, w = b.shape
    div3 = divide3_s32 if deep else divide3
    for i in range(1, w):
        b[0, i] += b[0, i - 1]
    for j in range(1, h):
        b[j, 0] += b[j - 1, 0]
        for i in range(1, w):
            pred = div3(int(b[j, i - 1]) + int(b[j - 1, i])
                        + int(b[j - 1, i - 1]) + 1)
            b[j, i] += pred
    return b


def _inverse(pyr, wavelet):
    return wv.inverse(pyr, wavelet)


_inverse_jit = jax.jit(_inverse, static_argnums=1)


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def _to_u8(plane_s16, h: int, w: int):
    x = plane_s16[:h, :w] + 128
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _to_u16(plane_s32, h: int, w: int, bit_depth: int):
    """Deep (10/16-bit) output conversion (schrolowdelay.c s32 paths):
    values are offset-binary already — the deep path never recentres
    (plain orc_convert_* widen/narrow); clip to the legal range."""
    x = plane_s32[:h, :w].astype(jnp.int32)
    return jnp.clip(x, 0, (1 << bit_depth) - 1).astype(jnp.uint16)


def decode_picture(payload: bytes, params: Params):
    """Decode low-delay slice data (after transform parameters, byte aligned).

    Returns (y, u, v) uint8 numpy planes at picture sizes.
    """
    p = params
    depth = p.transform_depth
    nb = subband_count(depth)
    ny, nx = p.n_vert_slices, p.n_horiz_slices
    n_slices = ny * nx

    # geometry
    def band_shapes(iwt_h, iwt_w):
        shapes = [(iwt_h >> depth, iwt_w >> depth)]
        for i in range(1, nb):
            shift = depth - ((i - 1) // 3)
            shapes.append((iwt_h >> shift, iwt_w >> shift))
        return shapes

    y_shapes = band_shapes(p.iwt_luma_height, p.iwt_luma_width)
    uv_shapes = band_shapes(p.iwt_chroma_height, p.iwt_chroma_width)
    S_y = sum((h // ny) * (w // nx) for h, w in y_shapes)
    S_uv = sum((h // ny) * (w // nx) for h, w in uv_shapes)

    band_idx_y = np.concatenate([
        np.full((h // ny) * (w // nx), i, dtype=np.int32)
        for i, (h, w) in enumerate(y_shapes)])
    band_idx_uv = np.concatenate([
        np.full((h // ny) * (w // nx), i, dtype=np.int32)
        for i, (h, w) in enumerate(uv_shapes)])
    qm = np.asarray(p.quant_matrix[:nb], dtype=np.int64)

    # slice byte layout
    n_bytes = p.slice_bytes_num // p.slice_bytes_denom
    remainder = p.slice_bytes_num % p.slice_bytes_denom
    sbytes = np.zeros(n_slices, dtype=np.int64)
    acc = 0
    for i in range(n_slices):
        acc += remainder
        if acc >= p.slice_bytes_denom:
            sbytes[i] = n_bytes + 1
            acc -= p.slice_bytes_denom
        else:
            sbytes[i] = n_bytes
    offsets_bytes = np.concatenate([[0], np.cumsum(sbytes)])[:-1]
    start_bits = offsets_bytes * 8
    end_bits = (offsets_bytes + sbytes) * 8
    length_bits = np.array([ilog2up(8 * int(b)) for b in sbytes], dtype=np.int64)

    if _native is not None:
        qm_i32 = qm.astype(np.int32)
        dy3, du3, dv3, _bases = _native.ld_decode(
            payload, qm_i32[band_idx_y], qm_i32[band_idx_uv],
            ny, nx, S_y, S_uv, sbytes)
        dy, du, dv = (dy3.astype(np.int64), du3.astype(np.int64),
                      dv3.astype(np.int64))
        return _finish(dy, du, dv, p, y_shapes, uv_shapes, ny, nx)

    # headers: base index (7 bits) + y length
    hdr = vlc.LockstepDecoder(payload, start_bits, end_bits)
    w64 = hdr._window()
    base = (w64 >> np.uint64(57)).astype(np.int64)
    y_len = np.zeros(n_slices, dtype=np.int64)
    for lb in np.unique(length_bits):
        m = length_bits == lb
        y_len[m] = ((w64[m] >> (np.uint64(57) - np.uint64(lb)))
                    & np.uint64((1 << int(lb)) - 1)).astype(np.int64)

    # Y coefficients
    y_off = start_bits + 7 + length_bits
    y_lim = np.minimum(y_off + y_len, end_bits)
    ydec = vlc.LockstepDecoder(payload, y_off, y_lim)
    qy = np.stack([ydec.read_sints() for _ in range(S_y)], axis=1)

    # UV coefficients (start after y_len bits, run to slice end)
    uv_off = start_bits + 7 + length_bits + y_len
    uvdec = vlc.LockstepDecoder(payload, uv_off, end_bits)
    quv = np.stack([uvdec.read_sints() for _ in range(2 * S_uv)], axis=1)
    qu = quv[:, 0::2]
    qv = quv[:, 1::2]

    # dequantise
    qi_y = np.clip(base[:, None] - qm[band_idx_y][None, :], 0, 60).astype(np.int64)
    qi_uv = np.clip(base[:, None] - qm[band_idx_uv][None, :], 0, 60).astype(np.int64)
    dy = dequantise_np(qy, QF[qi_y], QO[qi_y]).reshape(ny, nx, S_y)
    du = dequantise_np(qu, QF[qi_uv], QO[qi_uv]).reshape(ny, nx, S_uv)
    dv = dequantise_np(qv, QF[qi_uv], QO[qi_uv]).reshape(ny, nx, S_uv)

    return _finish(dy, du, dv, p, y_shapes, uv_shapes, ny, nx)


def _finish(dy, du, dv, p: Params, y_shapes, uv_shapes, ny, nx):
    """Subband assembly, DC integration, inverse wavelet, u8 conversion."""
    depth = p.transform_depth
    planes = []
    pic_sizes = [p.video_format.picture_luma_size(),
                 p.video_format.picture_chroma_size(),
                 p.video_format.picture_chroma_size()]
    bd = p.video_format.bit_depth
    band_dtype = np.int32 if bd > 8 else np.int16
    for data, shapes in ((dy, y_shapes), (du, uv_shapes), (dv, uv_shapes)):
        bands = sl.from_slices(data, shapes, ny, nx)
        bands[0] = dc_predict_integrate(bands[0], deep=bd > 8)
        bands = [np.asarray(b, dtype=band_dtype) for b in bands]
        pyr = sl.arrays_to_pyramid(
            [jnp.asarray(b) for b in bands], depth)
        planes.append(_inverse_jit(pyr, p.wavelet_filter_index))

    out = []
    for plane, (w_pic, h_pic) in zip(planes, pic_sizes):
        if bd > 8:
            out.append(np.asarray(_to_u16(plane, h_pic, w_pic, bd)))
        else:
            out.append(np.asarray(_to_u8(plane, h_pic, w_pic)))
    return tuple(out)
