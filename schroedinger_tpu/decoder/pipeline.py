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
from schroedinger_tpu.params import Params, subband_count

try:
    from schroedinger_tpu.coding import native as _native
except Exception:  # pragma: no cover
    _native = None

_DEC_CACHE = {}

_MV_FIELD_ORDER = ("split", "pred_mode", "using_global", "dx1", "dy1",
                   "dx2", "dy2", "dc0", "dc1", "dc2")


def _get_dec_step(p: Params):
    """One fused jitted device program for a whole picture's back half:
    unpack flat int16 bands -> inverse IWT x3 [-> OBMC render -> combine]
    -> u8 planes.  Mirrors the encoder's fused P-step design
    (encoder/inter.py _get_p_step): one dispatch, one upload."""
    vf = p.video_format
    num_refs = p.num_refs
    key = (vf.picture_luma_size(), vf.picture_chroma_size(),
           p.transform_depth, int(p.wavelet_filter_index), num_refs,
           p.mv_precision, p.xbsep_luma, p.ybsep_luma, p.xblen_luma,
           p.yblen_luma, p.picture_weight_bits, p.picture_weight_1,
           p.picture_weight_2)
    hit = _DEC_CACHE.get(key)
    if hit is not None:
        return hit

    from schroedinger_tpu.ops import wavelet as wv

    depth = p.transform_depth
    wavelet = p.wavelet_filter_index
    shapes3 = [di._band_shapes(p, c) for c in range(3)]
    pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                 vf.picture_chroma_size()]
    render_body = (obmc.make_render_body(p, num_refs) if num_refs else None)
    ynb, xnb = (p.y_num_blocks, p.x_num_blocks) if num_refs else (0, 0)

    def step(flat, *args):
        pos = 0
        residuals = []
        for shapes in shapes3:
            bands = []
            for (h, w) in shapes:
                bands.append(flat[pos:pos + h * w].reshape(h, w))
                pos += h * w
            pyr = sl.arrays_to_pyramid(bands, depth)
            residuals.append(wv.inverse(pyr, wavelet))
        outs = []
        if num_refs == 0:
            for res, (w_pic, h_pic) in zip(residuals, pic_sizes):
                outs.append(jnp.clip(res[:h_pic, :w_pic] + 128, 0,
                                     255).astype(jnp.uint8))
            return tuple(outs)
        mvpack = args[0]
        fields = {k: mvpack[i].astype(jnp.int32)
                  for i, k in enumerate(_MV_FIELD_ORDER)}
        ups1 = tuple(args[1:4])
        ups2 = tuple(args[4:7]) if num_refs == 2 else None
        preds = render_body(fields, ups1, ups2)
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

    def _decode_fast(self, code: int, payload: bytes):
        """Parse + host entropy decode + ONE fused device dispatch.
        Returns (picture_number, device_planes).  Raises _Fallback for
        pictures outside the fused path's envelope."""
        if self.telemetry or self.vf.bit_depth > 8:
            raise _Fallback
        (r, p, picture_number, ref_nums, retired, is_ref,
         zero_residual, mv) = self._parse_picture(code, payload)
        if p.is_lowdelay or (p.num_refs and p.have_global_motion):
            raise _Fallback
        if p.num_refs:
            bound = obmc.MV_BOUND_PEL << p.mv_precision
            if any(np.abs(mv[k]).max(initial=0) > bound
                   for k in ("dx1", "dy1", "dx2", "dy2")):
                raise _Fallback

        nb = subband_count(p.transform_depth)
        if zero_residual:
            total = sum(h * w for c in range(3)
                        for (h, w) in di._band_shapes(p, c))
            flat = np.zeros(total, np.int16)
        else:
            comps = decode_residual_bands(r, payload, p)
            flat = np.concatenate(
                [np.asarray(b, np.int16).ravel()
                 for bands in comps for b in bands])

        step = _get_dec_step(p)
        args = (jnp.asarray(flat),)
        if p.num_refs:
            for rn in ref_nums:
                if rn not in self.refs:
                    raise BrokenPicture(
                        "missing_reference",
                        f"reference picture {rn} not in buffer for "
                        f"{picture_number}")
            mvpack = jnp.asarray(np.stack(
                [mv[k].astype(np.int16) for k in _MV_FIELD_ORDER]))
            args = args + (mvpack,)
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
