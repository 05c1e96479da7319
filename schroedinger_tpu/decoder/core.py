"""Full Dirac/VC-2 stream decoder: intra + inter + low-delay pictures.

Decoder pipeline per picture (mirrors the reference stage DAG,
schrodecoder.c:61-69): parse -> motion decode (native C++) -> residual
decode (native C++ subband entropy) -> inverse wavelet (TPU) -> OBMC
render (TPU) -> combine -> reference bookkeeping.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding import subband as sb
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.decoder import intra as di
from schroedinger_tpu.decoder import lowdelay as lod
from schroedinger_tpu.decoder.lowdelay import _inverse_jit
from schroedinger_tpu.ops import obmc
from schroedinger_tpu.params import (Params, subband_count, subband_position)
from schroedinger_tpu.video_format import VideoFormat


class BrokenPicture(Exception):
    """Data-dependent picture decode failure with a classified kind,
    mirroring the reference's distinction between unpack overrun and
    parse failure (schrounpack.h:16-22, schrodecoder.c:1402-1415).

    kind: "missing_reference" | "parse" | "payload"."""

    def __init__(self, kind: str, msg: str):
        super().__init__(msg)
        self.kind = kind

try:
    from schroedinger_tpu.coding import native as _native
except Exception:  # pragma: no cover
    _native = None


@dataclasses.dataclass
class RefFrame:
    planes: Tuple[np.ndarray, np.ndarray, np.ndarray]  # u8 picture planes
    upsampled: Optional[list] = None  # cached interleaved half-pel planes

    def get_upsampled(self):
        if self.upsampled is None:
            # device arrays: consumed directly by the jitted OBMC render
            self.upsampled = [_upsample_jit(jnp.asarray(p))
                              for p in self.planes]
        return self.upsampled


@jax.jit
def _upsample_jit(plane):
    return obmc.make_halfpel(obmc.upsample_plane(plane))


@partial(jax.jit, static_argnums=(2,))
def _combine(residual, pred, clip_shape):
    h, w = clip_shape
    out = residual[:h, :w].astype(jnp.int32) + pred + 128
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def read_picture_prediction_parameters(r: BitReader, p: Params) -> None:
    """schrodecoder.c:2405-2517."""
    index = r.read_uint()
    if index == 0:
        p.xblen_luma = r.read_uint()
        p.yblen_luma = r.read_uint()
        p.xbsep_luma = r.read_uint()
        p.ybsep_luma = r.read_uint()
    else:
        blocks = [(0, 0, 0, 0), (8, 8, 4, 4), (12, 12, 8, 8),
                  (16, 16, 12, 12), (24, 24, 16, 16)]
        (p.xblen_luma, p.yblen_luma, p.xbsep_luma, p.ybsep_luma) = blocks[index]
    p.mv_precision = r.read_uint()
    p.have_global_motion = bool(r.read_bit())
    if p.have_global_motion:
        for i in range(p.num_refs):
            gm = p.global_motion[i]
            if r.read_bit():
                gm.b0 = r.read_sint()
                gm.b1 = r.read_sint()
            else:
                gm.b0 = gm.b1 = 0
            if r.read_bit():
                gm.a_exp = r.read_uint()
                gm.a00 = r.read_sint()
                gm.a01 = r.read_sint()
                gm.a10 = r.read_sint()
                gm.a11 = r.read_sint()
            else:
                gm.a_exp, gm.a00, gm.a01, gm.a10, gm.a11 = 0, 1, 0, 0, 1
            if r.read_bit():
                gm.c_exp = r.read_uint()
                gm.c0 = r.read_sint()
                gm.c1 = r.read_sint()
            else:
                gm.c_exp = gm.c0 = gm.c1 = 0
    p.picture_pred_mode = r.read_uint()
    p.picture_weight_bits = 1
    p.picture_weight_1 = 1
    p.picture_weight_2 = 1
    if r.read_bit():
        p.picture_weight_bits = r.read_uint()
        p.picture_weight_1 = r.read_sint()
        if p.num_refs > 1:
            p.picture_weight_2 = r.read_sint()


def read_block_data_buffers(r: BitReader, payload: bytes, num_refs: int):
    """schro_decoder_parse_block_data: 9 length-prefixed buffers."""
    bufs: List[Optional[bytes]] = []
    for i in range(9):
        if num_refs < 2 and i in (4, 5):
            bufs.append(None)
            continue
        length = r.read_uint()
        r.sync()
        start = r.bits_read // 8
        bufs.append(payload[start:start + length])
        r.skip_bits(length * 8)
    return bufs


def decode_residual_bands(payload_reader: BitReader, payload: bytes,
                          p: Params):
    """Host entropy decode of the transform data -> 3 lists of np subband
    arrays (DC-predicted for intra).  This is the CPU half of residual
    decoding; the inverse wavelet runs on device separately so a pipelined
    caller can overlap them across pictures (schrodecoder.c:1556-1568's
    CPU-entropy / GPU-render exec-domain split)."""
    depth = p.transform_depth
    nb = subband_count(depth)
    r = payload_reader
    comps = []
    for comp in range(3):
        shapes = di._band_shapes(p, comp)
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
            hcb, vcb = di._codeblock_counts(p, index)
            parent = bands[index - 3] if position >= 4 else None
            if p.is_noarith:
                bands[index] = _native.decode_subband_noarith(
                    data, (h, w), quant_index, position, hcb, vcb,
                    p.codeblock_mode_index == 1, num_refs=p.num_refs)
            else:
                bands[index] = sb.decode_subband_arith(
                    data, (h, w), quant_index, parent, position, hcb, vcb,
                    p.codeblock_mode_index == 1, is_intra=(p.num_refs == 0))
        if p.num_refs == 0:
            bands[0] = di.dc_predict_integrate_np(bands[0])
        comps.append(bands)
    return comps


def decode_residual(payload_reader: BitReader, payload: bytes, p: Params):
    """Decode transform data -> list of 3 residual planes (s16 iwt-sized)."""
    depth = p.transform_depth
    planes = []
    for bands in decode_residual_bands(payload_reader, payload, p):
        pyr = sl.arrays_to_pyramid(
            [jnp.asarray(np.asarray(b, dtype=np.int16)) for b in bands], depth)
        planes.append(_inverse_jit(pyr, p.wavelet_filter_index))
    return planes


class StreamDecoder:
    """Decodes a full Dirac stream; returns frames in presentation order."""

    def __init__(self, telemetry: Optional[bool] = None):
        self.vf: Optional[VideoFormat] = None
        self.refs: Dict[int, RefFrame] = {}
        self._pending_md5: Optional[bytes] = None
        self.md5_failures: List[int] = []
        self.errors: List[dict] = []
        if telemetry is None:
            import os
            telemetry = os.environ.get("SCHRO_TPU_TELEMETRY", "") not in \
                ("", "0")
        self.telemetry = bool(telemetry)

    def _render_inter(self, p: Params, mv, ref1: RefFrame,
                      ref2: Optional[RefFrame], residual_planes):
        vfmt = p.video_format
        mvj = {k: jnp.asarray(v) for k, v in mv.items()}
        # hostile streams may carry MVs beyond the patch path's margin;
        # fall back to the per-pixel render for those pictures
        bound = obmc.MV_BOUND_PEL << p.mv_precision
        in_bound = all(np.abs(mv[k]).max(initial=0) <= bound
                       for k in ("dx1", "dy1", "dx2", "dy2"))
        render = obmc.make_render_fn(p, 2 if ref2 is not None else 1,
                                     use_patches=None if in_bound else False)
        if ref2 is not None:
            preds = render(mvj, tuple(ref1.get_upsampled()),
                           tuple(ref2.get_upsampled()))
        else:
            preds = render(mvj, tuple(ref1.get_upsampled()))
        pic_sizes = [vfmt.picture_luma_size(), vfmt.picture_chroma_size(),
                     vfmt.picture_chroma_size()]
        return tuple(
            np.asarray(_combine(residual_planes[k], preds[k],
                                (pic_sizes[k][1], pic_sizes[k][0])))
            for k in range(3))

    def _parse_picture(self, code: int, payload: bytes):
        """Parse picture header + prediction/transform parameters + MV
        entropy decode (the host-serial front half of a picture).  Returns
        (r, p, picture_number, ref_nums, retired, is_ref, zero_residual,
        mv) with the BitReader positioned at the residual data."""
        r = BitReader(payload)
        picture_number = r.read_bits(32)
        num_refs = bs.num_refs(code)
        is_ref = bs.is_reference(code)
        ref_nums = []
        for i in range(num_refs):
            ref_nums.append((picture_number + r.read_sint()) & 0xFFFFFFFF)
        retired = None
        if is_ref:
            delta = r.read_sint()
            retired = (picture_number + delta) & 0xFFFFFFFF

        p = Params(video_format=self.vf, num_refs=num_refs,
                   is_lowdelay=bs.is_lowdelay(code),
                   is_noarith=not bs.using_ac(code))

        mv = None
        if num_refs > 0:
            r.sync()
            read_picture_prediction_parameters(r, p)
            r.sync()
            bufs = read_block_data_buffers(r, payload, num_refs)
            mv = _native.motion_decode(bufs, p.x_num_blocks, p.y_num_blocks,
                                       num_refs, p.have_global_motion,
                                       p.is_noarith)

        r.sync()
        zero_residual = False
        if num_refs > 0:
            zero_residual = bool(r.read_bit())
        if not zero_residual:
            p.wavelet_filter_index = __import__(
                "schroedinger_tpu.wavelets", fromlist=["Wavelet"]
            ).Wavelet(r.read_uint())
            p.transform_depth = r.read_uint()
            if not p.is_lowdelay:
                if r.read_bit():
                    for i in range(p.transform_depth + 1):
                        p.horiz_codeblocks[i] = r.read_uint()
                        p.vert_codeblocks[i] = r.read_uint()
                    p.codeblock_mode_index = r.read_uint()
                else:
                    for i in range(p.transform_depth + 1):
                        p.horiz_codeblocks[i] = 1
                        p.vert_codeblocks[i] = 1
                    p.codeblock_mode_index = 0
            else:
                p.n_horiz_slices = r.read_uint()
                p.n_vert_slices = r.read_uint()
                p.slice_bytes_num = r.read_uint()
                p.slice_bytes_denom = r.read_uint()
                if r.read_bit():
                    p.quant_matrix[0] = r.read_uint()
                    for i in range(p.transform_depth):
                        p.quant_matrix[1 + 3 * i] = r.read_uint()
                        p.quant_matrix[2 + 3 * i] = r.read_uint()
                        p.quant_matrix[3 + 3 * i] = r.read_uint()
                else:
                    p.set_default_quant_matrix()
            r.sync()
        return (r, p, picture_number, ref_nums, retired, is_ref,
                zero_residual, mv)

    def decode_picture_unit(self, code: int, payload: bytes):
        (r, p, picture_number, ref_nums, retired, is_ref,
         zero_residual, mv) = self._parse_picture(code, payload)

        num_refs = p.num_refs
        if p.is_lowdelay:
            planes = lod.decode_picture(payload[r.bits_read // 8:], p)
        elif num_refs == 0:
            planes = di.decode_picture(payload[r.bits_read // 8:], p)
        else:
            if zero_residual:
                res = [jnp.zeros((p.iwt_luma_height, p.iwt_luma_width),
                                 jnp.int16),
                       jnp.zeros((p.iwt_chroma_height, p.iwt_chroma_width),
                                 jnp.int16),
                       jnp.zeros((p.iwt_chroma_height, p.iwt_chroma_width),
                                 jnp.int16)]
            else:
                res = decode_residual(r, payload, p)
            for rn in ref_nums:
                if rn not in self.refs:
                    raise BrokenPicture("missing_reference",
                                        f"reference picture {rn} not in "
                                        f"buffer for {picture_number}")
            ref1 = self.refs[ref_nums[0]]
            ref2 = self.refs[ref_nums[1]] if num_refs > 1 else None
            planes = self._render_inter(p, mv, ref1, ref2, res)

        if is_ref:
            self.refs[picture_number] = RefFrame(planes)
            if retired is not None and retired != picture_number:
                self.refs.pop(retired, None)
        if self.telemetry and mv is not None:
            # telemetry overlay on the OUTPUT copy only; the reference
            # planes kept above stay pristine (schrodecoder.c:107).
            # Verify the in-stream MD5 against the CLEAN picture first.
            if self._pending_md5 is not None and _native is not None:
                if _native.frame_md5(planes) != self._pending_md5:
                    self.md5_failures.append(picture_number)
                self._pending_md5 = None
            from schroedinger_tpu.decoder.overlay import overlay_motion
            planes = (overlay_motion(planes[0], mv, p),) + tuple(planes[1:])
        return picture_number, planes

    def decode_stream(self, stream: bytes, presentation_order: bool = True):
        out = []
        for code, payload in bs.split_units(stream):
            if code == bs.SEQUENCE_HEADER:
                self.vf = bs.read_sequence_header(BitReader(payload)).video_format
            elif code == bs.AUXILIARY_DATA:
                if len(payload) >= 17 and payload[0] == 3:  # MD5 checksum
                    self._pending_md5 = payload[1:17]
            elif bs.is_picture(code):
                try:
                    num, planes = self.decode_picture_unit(code, payload)
                except BrokenPicture as e:
                    # data-dependent decode failure: record the picture
                    # error and continue, like the reference's per-picture
                    # error flag (schrodecoder.c:1402-1415). Programming
                    # errors (TypeError/AttributeError/...) propagate.
                    self.errors.append({"code": code, "error": repr(e),
                                        "kind": e.kind})
                    self._pending_md5 = None
                    continue
                except (ValueError, KeyError, IndexError) as e:
                    # malformed fields (bad enum, shape mismatch, missing
                    # reference) from a corrupted payload
                    self.errors.append({"code": code, "error": repr(e),
                                        "kind": "parse"})
                    self._pending_md5 = None
                    continue
                if self._pending_md5 is not None and _native is not None:
                    if _native.frame_md5(planes) != self._pending_md5:
                        self.md5_failures.append(num)
                    self._pending_md5 = None
                out.append((num, planes))
        if presentation_order:
            out.sort(key=lambda t: t[0])
        return [planes for _, planes in out]
