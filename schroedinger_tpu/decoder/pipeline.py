"""Pipelined stream decoder: host entropy decode overlaps device render.

The reference decoder overlaps CPU entropy decoding of picture N+1 with
GPU motion render / inverse wavelet of picture N via exec-domain-tagged
worker threads (schrodecoder.c:1556-1568, schrodomain.h:29-31).  The TPU
analog uses XLA's async dispatch instead of threads: each picture's
device work (inverse IWT x3 + OBMC render + combine, fused into ONE
jitted program) is dispatched and its output handles queued; the host
immediately moves on to entropy-decoding the next picture while the
device executes.  Output planes are only fetched `pipeline_depth`
pictures later, so the serial C++ subband/MV arith decode runs entirely
in the shadow of device compute — the decoder twin of the encoder
pipeline that hides entropy coding at 0.3% of wall (PROFILE.md section 1).

The P-chain dependency (picture N+1 references picture N's
reconstruction) lives ON DEVICE: reference pictures are stored as device
arrays and never come back to the host unless the caller fetches them.

Pictures the fused path cannot express fall back to the base class
per-picture path (still bit-exact, just unpipelined): low-delay,
deep (>8-bit), global motion, out-of-bound MVs, telemetry overlay.
"""
from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.decoder import intra as di
from schroedinger_tpu.decoder.core import (BrokenPicture, RefFrame,
                                           StreamDecoder,
                                           decode_residual_bands)
from schroedinger_tpu.ops import obmc
from schroedinger_tpu.params import (Params, subband_count,
                                     subband_position)

try:
    from schroedinger_tpu.coding import native as _native
except Exception:  # pragma: no cover
    _native = None

_DEC_CACHE = {}

_MV_FIELD_ORDER = ("split", "pred_mode", "using_global", "dx1", "dy1",
                   "dx2", "dy2", "dc0", "dc1", "dc2")

_N_COARSE = 4    # bands shipped as int16 (big values); the rest int8


def _get_dec_step(p: Params, wide: bool):
    """One fused jitted device program for a whole picture's back half,
    fed by ONE packed uint8 blob (the decode twin of the encoder P-step's
    single-wire design):

      blob = [mvpack i16 (10*ynb*xnb)]   (inter only)
             [qi_bands i16 (3*nb)]
             [coarse bands i16 x3 comps] (quantised; intra band 0 is
                                          pre-dequantised + DC-integrated
                                          by the host and passes through)
             [fine bands i8 x3 comps]    (i16 when wide=True — rare
                                          pictures with |q| > 127)

    step(blob[, up1_y, up1_u, up1_v[, up2...]]) -> u8 planes x3:
    dequantise on device (per-band quant indices, half the wire bytes of
    shipping dequantised int16), inverse IWT x3, OBMC render + combine.
    """
    vf = p.video_format
    num_refs = p.num_refs
    key = (vf.picture_luma_size(), vf.picture_chroma_size(),
           p.transform_depth, int(p.wavelet_filter_index), num_refs,
           p.mv_precision, p.xbsep_luma, p.ybsep_luma, p.xblen_luma,
           p.yblen_luma, p.picture_weight_bits, p.picture_weight_1,
           p.picture_weight_2, bool(wide))
    hit = _DEC_CACHE.get(key)
    if hit is not None:
        return hit

    from schroedinger_tpu import tables
    from schroedinger_tpu.ops import quant as q
    from schroedinger_tpu.ops import wavelet as wv

    depth = p.transform_depth
    nb = subband_count(depth)
    wavelet = p.wavelet_filter_index
    shapes3 = [di._band_shapes(p, c) for c in range(3)]
    sizes3 = [np.asarray([h * w for (h, w) in shapes], np.int64)
              for shapes in shapes3]
    n_coarse = [int(s[:_N_COARSE].sum()) for s in sizes3]
    n_fine = [int(s[_N_COARSE:].sum()) for s in sizes3]
    cband_id = [np.repeat(np.arange(_N_COARSE, dtype=np.int32),
                          s[:_N_COARSE]) for s in sizes3]
    fband_id = [np.repeat(np.arange(_N_COARSE, nb, dtype=np.int32),
                          s[_N_COARSE:]) for s in sizes3]
    pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                 vf.picture_chroma_size()]
    render_body = (obmc.make_render_body(p, num_refs) if num_refs else None)
    ynb, xnb = (p.y_num_blocks, p.x_num_blocks) if num_refs else (0, 0)
    n_mv = 10 * ynb * xnb if num_refs else 0
    QF = jnp.asarray(tables.QUANT_FACTOR, jnp.int32)
    QO = jnp.asarray(tables.QUANT_OFFSET_1_2 if num_refs == 0
                     else tables.QUANT_OFFSET_3_8, jnp.int32)
    fine_t = jnp.int16 if wide else jnp.int8
    fine_b = 2 if wide else 1

    def step(blob, *args):
        off = 0
        if num_refs:
            mvpack = jax.lax.bitcast_convert_type(
                blob[:n_mv * 2].reshape(10, ynb, xnb, 2), jnp.int16)
            off += n_mv * 2
        qi_bands = jax.lax.bitcast_convert_type(
            blob[off:off + 3 * nb * 2].reshape(3 * nb, 2),
            jnp.int16).astype(jnp.int32)
        off += 3 * nb * 2
        coarse = []
        for ci in range(3):
            coarse.append(jax.lax.bitcast_convert_type(
                blob[off:off + n_coarse[ci] * 2].reshape(-1, 2), jnp.int16))
            off += n_coarse[ci] * 2
        fine = []
        for ci in range(3):
            fine.append(jax.lax.bitcast_convert_type(
                blob[off:off + n_fine[ci] * fine_b].reshape(-1, fine_b),
                fine_t).reshape(-1))
            off += n_fine[ci] * fine_b

        residuals = []
        for ci, shapes in enumerate(shapes3):
            qi_c = qi_bands[ci * nb:(ci + 1) * nb]
            qc = coarse[ci].astype(jnp.int32)
            dq_c = q.dequantise(qc, QF[qi_c][cband_id[ci]],
                                QO[qi_c][cband_id[ci]])
            if num_refs == 0:
                # intra band 0 arrives pre-dequantised + DC-integrated
                n0 = int(sizes3[ci][0])
                dq_c = jnp.concatenate([qc[:n0], dq_c[n0:]])
            qf_ = fine[ci].astype(jnp.int32)
            dq_f = q.dequantise(qf_, QF[qi_c][fband_id[ci]],
                                QO[qi_c][fband_id[ci]])
            flat = jnp.concatenate([dq_c, dq_f]).astype(jnp.int16)
            bands = []
            pos = 0
            for (h, w) in shapes:
                bands.append(flat[pos:pos + h * w].reshape(h, w))
                pos += h * w
            pyr = sl.arrays_to_pyramid(bands, depth)
            residuals.append(wv.inverse(pyr, wavelet))
        # fusion fence (axon bug, see inter.py): materialize the three
        # dequant->inverse-IWT pipelines before they feed the combine
        residuals = list(jax.lax.optimization_barrier(tuple(residuals)))
        outs = []
        if num_refs == 0:
            for res, (w_pic, h_pic) in zip(residuals, pic_sizes):
                outs.append(jnp.clip(res[:h_pic, :w_pic] + 128, 0,
                                     255).astype(jnp.uint8))
            return tuple(outs)
        fields = {k: mvpack[i].astype(jnp.int32)
                  for i, k in enumerate(_MV_FIELD_ORDER)}
        ups1 = tuple(args[0:3])
        ups2 = tuple(args[3:6]) if num_refs == 2 else None
        preds = render_body(fields, ups1, ups2)
        # fusion fence (same axon bug as the encoder's front/mid, see
        # inter.py): three OBMC patch-gather renders fused into their
        # consumers kernel-fault the TPU worker for certain data;
        # materializing the pred planes is the empirically green shape
        preds = jax.lax.optimization_barrier(tuple(preds))
        for res, pred, (w_pic, h_pic) in zip(residuals, preds, pic_sizes):
            rec = (res[:h_pic, :w_pic].astype(jnp.int32)
                   + pred.astype(jnp.int32) + 128)
            outs.append(jnp.clip(rec, 0, 255).astype(jnp.uint8))
        return tuple(outs)

    fn = jax.jit(step)
    _DEC_CACHE[key] = fn
    return fn


class _Fallback(Exception):
    pass


class PipelinedStreamDecoder(StreamDecoder):
    """StreamDecoder with cross-picture host/device pipelining."""

    def __init__(self, telemetry: Optional[bool] = None,
                 pipeline_depth: int = 3):
        super().__init__(telemetry=telemetry)
        self.pipeline_depth = int(pipeline_depth)

    def _decode_bands_raw(self, r, payload, p: Params):
        """Host arith decode to QUANTISED bands + per-band quant indices.
        Returns (bands3 int16 lists, qi_bands (3nb,) int32, wide flag) or
        raises _Fallback (per-codeblock quant variation needs per-
        coefficient dequant — the legacy path handles those streams)."""
        depth = p.transform_depth
        nb = subband_count(depth)
        qi_bands = np.zeros(3 * nb, np.int32)
        comps = []
        wide = False
        for comp in range(3):
            shapes = di._band_shapes(p, comp)
            bands = [None] * nb
            for index in range(nb):
                r.sync()
                h, w = shapes[index]
                length = r.read_uint()
                if length == 0:
                    r.sync()
                    bands[index] = np.zeros((h, w), dtype=np.int32)
                    continue
                quant_index = r.read_uint()
                r.sync()
                start = r.bits_read // 8
                data = payload[start:start + length]
                r.skip_bits(length * 8)
                position = subband_position(index)
                hcb, vcb = di._codeblock_counts(p, index)
                parent = bands[index - 3] if position >= 4 else None
                band, qi_map = _native.decode_subband_arith_raw(
                    data, (h, w), quant_index, parent, position, hcb, vcb,
                    p.codeblock_mode_index == 1)
                if not np.all(qi_map == qi_map.flat[0]):
                    raise _Fallback   # per-codeblock quant deltas
                qi_bands[comp * nb + index] = int(qi_map.flat[0])
                bands[index] = band
                if index >= _N_COARSE and not wide:
                    wide = bool(np.abs(band).max(initial=0) > 127)
            if p.num_refs == 0:
                # dequantise + DC-integrate band 0 on host (serial); it
                # passes through the device dequant stage untouched
                from schroedinger_tpu import tables as _t
                qi0 = qi_bands[comp * nb]
                qf, qo = int(_t.QUANT_FACTOR[qi0]), \
                    int(_t.QUANT_OFFSET_1_2[qi0])
                b0 = bands[0].astype(np.int64)
                mag = np.abs(b0)
                dq = np.where(mag > 0, (qo + qf * mag + 2) >> 2, 0)
                dq = np.where(b0 < 0, -dq, dq).astype(np.int64)
                bands[0] = di.dc_predict_integrate_np(dq).astype(np.int32)
            comps.append(bands)
        return comps, qi_bands, wide

    def _decode_fast(self, code: int, payload: bytes):
        """Parse + host entropy decode (quantised) + ONE packed upload +
        ONE fused device dispatch.  Returns (picture_number,
        device_planes).  Raises _Fallback for pictures outside the fused
        path's envelope."""
        if self.telemetry or self.vf.bit_depth > 8:
            raise _Fallback
        (r, p, picture_number, ref_nums, retired, is_ref,
         zero_residual, mv) = self._parse_picture(code, payload)
        if p.is_lowdelay or p.is_noarith \
                or (p.num_refs and p.have_global_motion):
            raise _Fallback
        if p.num_refs:
            bound = obmc.MV_BOUND_PEL << p.mv_precision
            if any(np.abs(mv[k]).max(initial=0) > bound
                   for k in ("dx1", "dy1", "dx2", "dy2")):
                raise _Fallback

        nb = subband_count(p.transform_depth)
        shapes3 = [di._band_shapes(p, c) for c in range(3)]
        if zero_residual:
            comps = [[np.zeros((h, w), np.int32) for (h, w) in shapes]
                     for shapes in shapes3]
            qi_bands = np.zeros(3 * nb, np.int32)
            wide = False
        else:
            comps, qi_bands, wide = self._decode_bands_raw(r, payload, p)

        # one packed uint8 blob: mv fields + per-band quant indices +
        # int16 coarse bands + int8 (int16 when wide) fine bands
        parts = []
        if p.num_refs:
            parts.append(np.stack(
                [mv[k].astype(np.int16) for k in _MV_FIELD_ORDER])
                .view(np.uint8).ravel())
        parts.append(qi_bands.astype(np.int16).view(np.uint8))
        for bands in comps:
            parts.append(np.concatenate(
                [np.asarray(b, np.int16).ravel()
                 for b in bands[:_N_COARSE]]).view(np.uint8))
        ft = np.int16 if wide else np.int8
        for bands in comps:
            if len(bands) > _N_COARSE:
                parts.append(np.concatenate(
                    [np.asarray(b, ft).ravel()
                     for b in bands[_N_COARSE:]]).view(np.uint8))
        blob = np.concatenate(parts)

        step = _get_dec_step(p, wide)
        args = (jnp.asarray(blob),)
        if p.num_refs:
            for rn in ref_nums:
                if rn not in self.refs:
                    raise BrokenPicture(
                        "missing_reference",
                        f"reference picture {rn} not in buffer for "
                        f"{picture_number}")
            args = args + tuple(self.refs[ref_nums[0]].get_upsampled())
            if p.num_refs == 2:
                args = args + tuple(self.refs[ref_nums[1]].get_upsampled())
        planes = step(*args)

        if is_ref:
            self.refs[picture_number] = RefFrame(planes)
            if retired is not None and retired != picture_number:
                self.refs.pop(retired, None)
        return picture_number, planes

    def decode_stream(self, stream: bytes, presentation_order: bool = True):
        out = []
        pend = deque()   # (num, planes: device tuple or np tuple, md5)

        def drain_one():
            num, planes, md5 = pend.popleft()
            host = tuple(np.asarray(pl) for pl in planes)
            if md5 is not None and _native is not None:
                if _native.frame_md5(host) != md5:
                    self.md5_failures.append(num)
            out.append((num, host))

        for code, payload in bs.split_units(stream):
            if code == bs.SEQUENCE_HEADER:
                self.vf = bs.read_sequence_header(
                    BitReader(payload)).video_format
            elif code == bs.AUXILIARY_DATA:
                if len(payload) >= 17 and payload[0] == 3:  # MD5 checksum
                    self._pending_md5 = payload[1:17]
            elif bs.is_picture(code):
                try:
                    try:
                        num, planes = self._decode_fast(code, payload)
                    except _Fallback:
                        num, planes = self.decode_picture_unit(code, payload)
                        # base path verified MD5 in-line? no: stream-level
                        # aux handling lives here, so fall through to the
                        # common md5-at-fetch path below
                except BrokenPicture as e:
                    self.errors.append({"code": code, "error": repr(e),
                                        "kind": e.kind})
                    self._pending_md5 = None
                    continue
                except (ValueError, KeyError, IndexError) as e:
                    self.errors.append({"code": code, "error": repr(e),
                                        "kind": "parse"})
                    self._pending_md5 = None
                    continue
                pend.append((num, planes, self._pending_md5))
                self._pending_md5 = None
                while len(pend) > self.pipeline_depth:
                    drain_one()
        while pend:
            drain_one()
        if presentation_order:
            out.sort(key=lambda t: t[0])
        return [planes for _, planes in out]
