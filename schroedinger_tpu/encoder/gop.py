"""Long-GOP encoder driver: GOP structure, reference management, rate control.

Round-1 scope: IPPP (backref) GOP with intra pictures every `au_distance`,
constant base quantiser (constant-lambda analog); CBR buffer model follows.
The stream is standard Dirac main profile, decodable by the reference.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.decoder.core import RefFrame
from schroedinger_tpu.encoder import inter as ei_inter
from schroedinger_tpu.encoder import intra as ei_intra
from schroedinger_tpu.decoder import intra as di_intra
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.params import Params, subband_count
from schroedinger_tpu.video_format import VideoFormat
from schroedinger_tpu.wavelets import MAX_DEPTH_S16, Wavelet


class GopEncoder:
    def __init__(self, video_format: VideoFormat,
                 intra_wavelet: Wavelet = Wavelet.DESLAURIERS_DUBUC_9_7,
                 inter_wavelet: Wavelet = Wavelet.LE_GALL_5_3,
                 transform_depth: int = 3,
                 gop_length: int = 24,
                 base_qi_intra: int = 16,
                 base_qi_inter: int = 20,
                 bitrate: int = 0,
                 fps: float = 25.0,
                 enable_md5: bool = False,
                 mv_precision: int = 0,
                 enable_scene_change: bool = True,
                 scene_change_threshold: float = 3.0,
                 b_frames: int = 0,
                 enable_phasecorr: bool = False,
                 quantiser_engine=None,
                 stats=None,
                 pipeline_depth: int = 3):
        self.vf = video_format
        self.intra_wavelet = intra_wavelet
        self.inter_wavelet = inter_wavelet
        self.depth = min(transform_depth,
                         MAX_DEPTH_S16[intra_wavelet],
                         MAX_DEPTH_S16[inter_wavelet])
        self.gop_length = gop_length
        self.base_qi_intra = base_qi_intra
        self.base_qi_inter = base_qi_inter
        self.frame_number = 0
        self.last_ref: Optional[int] = None
        self.prev_ref: Optional[int] = None
        self.ref_frames = {}
        self._chain = bs.OffsetChain()
        self.enable_md5 = enable_md5
        self.mv_precision = mv_precision
        self.enable_scene_change = enable_scene_change
        self.scene_change_threshold = scene_change_threshold
        self._prev_input = None
        self._prev_mad = None
        if stats is None:
            from schroedinger_tpu.utils.telemetry import FrameStats
            stats = FrameStats()
        self.stats = stats
        self.b_frames = b_frames
        self.field_factor = 2 if video_format.interlaced_coding else 1
        self.enable_phasecorr = enable_phasecorr
        self.qengine = quantiser_engine
        self.pipeline_depth = pipeline_depth
        self._bbuf = []  # buffered (num, planes) awaiting the next reference
        self._last_stats = None  # newest finished frame's (bits61, err61)
        self.rc = None
        if bitrate:
            from schroedinger_tpu.encoder.ratecontrol import CbrController
            self.rc = CbrController(bitrate, fps, gop_length)

    def _params(self, num_refs: int) -> Params:
        p = Params(video_format=self.vf, num_refs=num_refs,
                   transform_depth=self.depth,
                   wavelet_filter_index=(self.inter_wavelet if num_refs
                                         else self.intra_wavelet))
        p.set_default_codeblocks()
        p.set_default_quant_matrix()
        p.mv_precision = self.mv_precision if num_refs else 0
        # adaptive block size by resolution (schroengine.c:391-430)
        area = self.vf.width * self.vf.height
        if area >= 1920 * 1080:
            p.xblen_luma = p.yblen_luma = 24
            p.xbsep_luma = p.ybsep_luma = 16
        elif area >= 960 * 540:
            p.xblen_luma = p.yblen_luma = 16
            p.xbsep_luma = p.ybsep_luma = 12
        else:
            p.xblen_luma = p.yblen_luma = 12
            p.xbsep_luma = p.ybsep_luma = 8
        return p

    def _scene_change_score(self, planes) -> float:
        """MAD vs previous input, downsampled 4x (schroencoder.c:1909
        calculate_sc_score analog): score = mad / running mad."""
        y = np.asarray(planes[0], np.int32)[::4, ::4]
        score = 0.0
        if self._prev_input is not None:
            mad = float(np.abs(y - self._prev_input).mean())
            base = self._prev_mad if self._prev_mad else max(mad, 1e-3)
            score = mad / max(base, 1e-3)
            self._prev_mad = (0.7 * (self._prev_mad or mad) + 0.3 * mad)
        self._prev_input = y
        return score

    def encode_frame(self, planes) -> bytes:
        """Display-order input; emits coded-order units (refs before the
        B pictures that reference them). May return b'' while buffering.

        Interlaced coding: the frame splits into two field pictures
        (schro_encoder_push_frame_full, schroencoder.c:1072-1110) coded
        back to back; the second field predicts from the first."""
        if self.field_factor == 2:
            from schroedinger_tpu import frontends as ff
            f1, f2 = ff.split_fields(planes, tff=self.vf.top_field_first)
            return self._encode_one(f1) + self._encode_one(f2)
        return self._encode_one(planes)

    def _encode_one(self, planes) -> bytes:
        num = self.frame_number
        is_intra = ((num // self.field_factor) % self.gop_length) == 0
        sc_score = 0.0
        if self.enable_scene_change:
            sc_score = self._scene_change_score(planes)
            if (not is_intra and sc_score > self.scene_change_threshold
                    and self.last_ref is not None):
                is_intra = True

        if self.b_frames and not is_intra and self.last_ref is not None \
                and len(self._bbuf) < self.b_frames:
            self._bbuf.append((num, planes))
            self.frame_number += 1
            return b""

        out = bytearray()
        prev_ref_num = self.last_ref
        out += self._encode_ref(planes, num, is_intra, sc_score)
        if self._bbuf:
            for bnum, bplanes in self._bbuf:
                out += self._encode_b(bplanes, bnum, prev_ref_num, num)
            self._bbuf = []
        return bytes(out)

    def flush(self) -> bytes:
        """Encode any buffered frames (trailing, no future ref) as P."""
        out = bytearray()
        for bnum, bplanes in self._bbuf:
            out += self._encode_ref(bplanes, bnum, False, 0.0)
        self._bbuf = []
        return bytes(out)

    def encode_stream(self, frames) -> bytes:
        """Encode a sequence with device/host pipelining: the fused P-step
        of frame N+1 is dispatched (XLA queues it asynchronously) before the
        host entropy coding of frame N runs, so TPU compute and C++ arith
        coding overlap.

        CBR and the quantiser engines stay pipelined: each P frame's quant
        choice uses the newest *finished* frame's stat tables (feedback lag
        = pipeline depth, the analog of the reference's strictly-ordered
        quant_slot chain, schroencoder.c:2110-2142, traded for overlap; the
        buffer model absorbs the lag).  Only B-frame buffering falls back
        to the serial path (the tworef engine supersedes it)."""
        from schroedinger_tpu.encoder import inter as ei_inter
        if self.field_factor == 2:
            from schroedinger_tpu import frontends as ff
            frames = [fld for fr in frames
                      for fld in ff.split_fields(fr, self.vf.top_field_first)]
        out = bytearray()
        if self.b_frames:
            for f in frames:
                out += self._encode_one(f)
            out += self.flush()
            out += self._chain.add([bs.make_eos_unit()], final_eos=True)
            return bytes(out)

        # keep several frames in flight: the tunnel's per-RPC latency and
        # the device compute then overlap (the P-chain dependency lives on
        # device, so depth only delays host entropy coding, not refs)
        from collections import deque
        depth = int(self.pipeline_depth)
        want_stats = (self.qengine is not None) or (self.rc is not None)
        pends = deque()  # (pending dict, (num, ref_num, retired, sc_score))
        for planes in frames:
            num = self.frame_number
            is_intra = ((num // self.field_factor) % self.gop_length) == 0
            sc = (self._scene_change_score(planes)
                  if self.enable_scene_change else 0.0)
            if (not is_intra and sc > self.scene_change_threshold
                    and self.last_ref is not None):
                is_intra = True
            if is_intra or self.last_ref is None:
                while pends:
                    out += self._finish_pending(pends.popleft())
                out += self._encode_ref(planes, num, True, sc)
                continue

            p = self._params(1)
            if want_stats and self._last_stats is None and pends:
                # no stat feedback yet (stream start): drain the oldest
                # in-flight frame so the engine engages from the 2nd P
                out += self._finish_pending(pends.popleft())
            qi_over = None
            if self.qengine is not None:
                qi_over = self.qengine.pick()
            elif self.rc is not None:
                qi_over = self._cbr_pick(p)
            meta = (num, self.last_ref, self.prev_ref, sc)
            pending = ei_inter.start_inter_picture(
                planes, p, self.ref_frames[self.last_ref],
                base_qi=self.base_qi_inter,
                use_phasecorr=self.enable_phasecorr,
                qi_bands_override=qi_over,
                want_stats=want_stats)
            if pends:
                ei_inter.prefetch_pending(pends[-1][0])
            # the new recon/upsample device handles become the reference
            # immediately; XLA serialises the dependency on device
            if self.prev_ref is not None:
                self.ref_frames.pop(self.prev_ref, None)
            self.ref_frames[num] = RefFrame(tuple(pending["recon"]),
                                            upsampled=pending["up"])
            self.prev_ref = self.last_ref
            self.last_ref = num
            self.frame_number += 1
            pends.append((pending, meta))
            if len(pends) > depth:
                out += self._finish_pending(pends.popleft())
        while pends:
            out += self._finish_pending(pends.popleft())
        out += self._chain.add([bs.make_eos_unit()], final_eos=True)
        return bytes(out)

    def _cbr_pick(self, p: Params):
        """Per-band quant indices for the next P frame from the newest
        finished frame's stat tables (None before any stats exist -> the
        constant base_qi fallback inside start_inter_picture)."""
        stats = self._last_stats
        if stats is None:
            return None
        from schroedinger_tpu.encoder.ratecontrol import pick_base_from_stats
        nb = subband_count(p.transform_depth)
        qm = np.asarray(p.quant_matrix[:nb], np.int32)
        base = pick_base_from_stats(stats[0], qm,
                                    self.rc.frame_target(False),
                                    correction=self.rc.correction)
        return np.clip(base - qm, 0, 60).astype(np.int32)

    def _finish_pending(self, pend) -> bytes:
        from schroedinger_tpu.encoder import inter as ei_inter
        pending, (num, ref_num, retired, sc) = pend
        unit, stats = ei_inter.finish_inter_picture(pending, num, ref_num,
                                                    is_ref=True,
                                                    retired=retired)
        if self.qengine:
            self.qengine.update(stats)
        if stats is not None:
            self._last_stats = stats
        if self.rc is not None:
            from schroedinger_tpu.encoder.ratecontrol import estimate_bits_at
            est = (estimate_bits_at(stats[0], pending["qi_bands"])
                   if stats is not None else None)
            self.rc.update(len(unit) * 8, est)
        units = []
        if self.enable_md5:
            from schroedinger_tpu.coding import native as _native
            units.append(bs.make_aux_unit(
                bs.AUX_MD5_CHECKSUM,
                _native.frame_md5(tuple(np.asarray(pl)
                                        for pl in pending["recon"]))))
        units.append(unit)
        self.stats.record(frame=num, intra=False, bits=len(unit) * 8,
                          sc_score=round(sc, 3), buffer_level=None)
        return self._chain.add(units)

    def _encode_b(self, planes, num, ref1_num, ref2_num) -> bytes:
        from schroedinger_tpu.encoder.inter import encode_b_picture
        p = self._params(2)
        target = None
        if self.rc:
            target = self.rc.frame_target(kind="B")
        unit = encode_b_picture(planes, p, num, ref1_num,
                                self.ref_frames[ref1_num], ref2_num,
                                self.ref_frames[ref2_num],
                                base_qi=min(60, self.base_qi_inter + 4),
                                target_bits=target,
                                rc_correction=self.rc.correction
                                if self.rc else 1.0)
        if self.rc:
            self.rc.update(len(unit) * 8)
        self.stats.record(frame=num, intra=False, b_picture=True,
                          bits=len(unit) * 8)
        return self._chain.add([unit])

    def _encode_ref(self, planes, num, is_intra, sc_score) -> bytes:
        units = []
        if is_intra:
            units.append(bs.write_sequence_header(self.vf, profile=8, level=0))
            p = self._params(0)
            nb = subband_count(p.transform_depth)
            qm = np.asarray(p.quant_matrix[:nb], np.int32)
            base = self.base_qi_intra
            if self.rc:
                import jax.numpy as jnp
                from schroedinger_tpu.coding import slices as sl
                from schroedinger_tpu.encoder.lowdelay import (_forward_jit,
                                                               _prep_plane)
                from schroedinger_tpu.encoder.ratecontrol import pick_base_qi
                dims = [(p.iwt_luma_height, p.iwt_luma_width),
                        (p.iwt_chroma_height, p.iwt_chroma_width),
                        (p.iwt_chroma_height, p.iwt_chroma_width)]
                band_lists = []
                for plane, (oh, ow) in zip(planes, dims):
                    prepped = _prep_plane(jnp.asarray(plane), oh, ow)
                    pyr = _forward_jit(prepped, p.transform_depth,
                                       p.wavelet_filter_index)
                    band_lists.append(sl.subband_arrays(pyr, p.transform_depth))
                base = pick_base_qi(band_lists, p,
                                    self.rc.frame_target(True), intra=True,
                                    correction=self.rc.correction)
            qis = {}
            for comp in range(3):
                for i in range(nb):
                    hcb, vcb = ei_inter._codeblock_counts(p, i)
                    qi = int(np.clip(base - qm[i], 0, 60))
                    qis[(comp, i)] = np.full((vcb, hcb), qi, np.int32)
            unit, recon = ei_intra.encode_picture(planes, p, num,
                                                  quant_indices=qis,
                                                  is_ref=True,
                                                  retired=self.prev_ref,
                                                  return_recon=True)
            up = None
            if self.rc:
                self.rc.update(len(unit) * 8)
        else:
            p = self._params(1)
            target = self.rc.frame_target(False) if self.rc else None
            qi_over = self.qengine.pick() if self.qengine else None
            unit, recon, used_qi, stats, up = ei_inter.encode_inter_picture(
                planes, p, num, self.last_ref, self.ref_frames[self.last_ref],
                base_qi=self.base_qi_inter, is_ref=True,
                retired=self.prev_ref, target_bits=target,
                rc_correction=self.rc.correction if self.rc else 1.0,
                use_phasecorr=self.enable_phasecorr,
                qi_bands_override=qi_over,
                want_stats=self.qengine is not None)
            if self.qengine:
                self.qengine.update(stats)
            if self.rc:
                self.rc.update(len(unit) * 8)
        if self.enable_md5:
            from schroedinger_tpu.coding import native as _native
            units.append(bs.make_aux_unit(
                bs.AUX_MD5_CHECKSUM,
                _native.frame_md5(tuple(np.asarray(pl) for pl in recon))))
        units.append(unit)

        if self.prev_ref is not None:
            self.ref_frames.pop(self.prev_ref, None)
        self.ref_frames[num] = RefFrame(recon, upsampled=up)
        self.prev_ref = self.last_ref
        self.last_ref = num
        if num == self.frame_number:
            self.frame_number += 1
        self.stats.record(frame=num, intra=bool(is_intra),
                          bits=len(unit) * 8, sc_score=round(sc_score, 3),
                          buffer_level=(self.rc.buffer_level if self.rc
                                        else None))
        return self._chain.add(units)

