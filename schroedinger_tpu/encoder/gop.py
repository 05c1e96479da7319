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
                 enable_phasecorr: bool = False,
                 quantiser_engine=None,
                 stats=None,
                 pipeline_depth: int = 3,
                 gop_structure: str = "backref",
                 subgroup_length: int = 4,
                 base_qi_b: Optional[int] = None,
                 perceptual_weighting: str = "ccir959",
                 perceptual_distance: float = 4.0,
                 open_gop: bool = True,
                 enable_psnr: bool = False,
                 enable_ssim: bool = False,
                 block_size: str = "automatic",
                 block_overlap: str = "automatic",
                 codeblock_size: str = "automatic",
                 enable_multiquant: bool = False,
                 enable_dc_multiquant: bool = False,
                 filtering: str = "none",
                 filter_value: float = 5.0,
                 rdo_cbr: bool = True,
                 buffer_size: int = 0,
                 buffer_level: int = 0,
                 downsample_levels: int = 5,
                 enable_noarith: bool = False,
                 max_refs: int = 3,
                 estimation: tuple = (),
                 enable_b_batch: bool = True,
                 magic: Optional[dict] = None):
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
        self.field_factor = 2 if video_format.interlaced_coding else 1
        self.enable_phasecorr = enable_phasecorr
        self.enable_b_batch = enable_b_batch
        self.qengine = quantiser_engine
        self.pipeline_depth = pipeline_depth
        self._last_stats = None  # newest finished frame's (bits61, err61)
        if max_refs < 2 and gop_structure == "biref":
            # a 1-deep reference buffer cannot host the tworef engine's
            # forward references: degrade to the backref (IPPP) engine
            gop_structure = "backref"
        self.gop_structure = gop_structure
        self.subgroup_length = subgroup_length
        self.base_qi_b = (base_qi_b if base_qi_b is not None
                          else min(60, base_qi_inter + 4))
        self._queue = []          # biref: display-order (num, planes, sc)
        self._pends2 = None       # biref: coded-order pending deque
        self._stats_by_kind = {}  # biref: newest stat tables per P/B
        self._refbuf = {}         # biref: picture number -> expired flag
        self._enc_last_ref = None  # mirrors encoder->last_ref
        self._au_frame = None     # picture number of the last AU intra
        self._last_badblock = 0.0  # newest frame's badblock ratio
        self._sent_stream_aux = False  # codec/bitrate aux emitted yet?
        # EMA of non-residual bits per picture (headers + MV data),
        # subtracted from the TM5 allocation to get the residual target
        # of the on-device lambda fit (the reference knows the exact
        # value because it packs headers first, schroencoder.c:2532)
        self._oh_inter = None
        self._oh_intra = None
        # retired references are parked here for a few more pictures
        # instead of being freed immediately: deleting device buffers
        # that queued-but-unexecuted pictures still read races the
        # execution queue through the axon tunnel and crashes the TPU
        # worker (reproducible at the first AU boundary of a pipelined
        # biref encode)
        from collections import deque as _deque
        self._ref_graveyard = _deque(maxlen=8)
        self.perceptual_weighting = perceptual_weighting
        self.perceptual_distance = perceptual_distance
        self.open_gop = open_gop
        self.enable_psnr = enable_psnr
        self.enable_ssim = enable_ssim
        self.block_size = block_size
        self.block_overlap = block_overlap
        self.codeblock_size = codeblock_size
        self.enable_multiquant = enable_multiquant
        self.enable_dc_multiquant = enable_dc_multiquant
        self.filtering = filtering
        self.filter_value = filter_value
        self.downsample_levels = downsample_levels
        # VLC (no-arith) residual + MV coding for every picture type: the
        # reference's encoder core supports this for inter pictures too
        # (schroencoder.c:4073+, is_noarith branches) even though its
        # settings dispatch only ever selects noarith for intra-only
        # profiles — exposed here directly
        self.enable_noarith = enable_noarith
        # decoder-visible reference-buffer budget (schroengine.c:127-245
        # manages up to 4; the max_refs setting caps it)
        self.max_refs = max(1, int(max_refs))
        # estimation-stage switches (enable_*_estimation settings):
        # tokens among {no_hierarchical, no_deep, no_bigblock, no_zero,
        # chroma_me, fullscan}, resolved by inter._get_p_step
        self.estimation = tuple(estimation)
        # magic_* tuning constants (schroencoder.c:4513-4535 defaults)
        m = dict(subband0_lambda_scale=10.0, diagonal_lambda_scale=1.0,
                 chroma_lambda_scale=0.1,
                 me_lambda_scale=1.0, I_lambda_scale=1.0,
                 P_lambda_scale=0.25, B_lambda_scale=0.01,
                 inter_cpd_scale=1.0, keyframe_weight=7.5,
                 inter_p_weight=1.5, inter_b_weight=0.2,
                 allocation_scale=1.1, me_bailout_limit=0.33,
                 badblock_multiplier_ref=8.0,
                 badblock_multiplier_nonref=4.0,
                 block_search_threshold=15.0, scan_distance=4.0,
                 error_power=4.0)
        m.update(magic or {})
        self.magic = m
        self.rc = None
        if bitrate and rdo_cbr:
            from schroedinger_tpu.encoder.ratecontrol import CbrControllerTM5
            self.rc = CbrControllerTM5(
                bitrate, fps, gop_length,
                subgroup_length=(subgroup_length
                                 if gop_structure == "biref" else 4),
                buffer_size=buffer_size, buffer_level=buffer_level,
                interlaced=video_format.interlaced_coding,
                b_lambda_scale=self.magic["B_lambda_scale"],
                p_lambda_scale=self.magic["P_lambda_scale"],
                i_lambda_scale=self.magic["I_lambda_scale"])
        elif bitrate:
            # enable_rdo_cbr=FALSE: the reference's alternative CBR path
            # (rdo_bit_allocation engine + get_alloc reservoir curve,
            # schroengine.c:552-637) -- per-picture bit targets from
            # weighted allocations, lambda bisected to fit each target
            from schroedinger_tpu.encoder.ratecontrol import CbrController
            self.rc = CbrController(
                bitrate, fps, gop_length,
                buffer_size=buffer_size, buffer_level=buffer_level,
                interlaced=video_format.interlaced_coding,
                keyframe_weight=self.magic["keyframe_weight"],
                inter_p_weight=self.magic["inter_p_weight"],
                inter_b_weight=self.magic["inter_b_weight"],
                allocation_scale=self.magic["allocation_scale"])
        if (self.qengine is not None
                and getattr(self.qengine, "band_scales", None) is None):
            self.qengine.band_scales = self._band_scales3(False)
        # per-(component, band) x {intra, inter} arith-vs-estimate bit
        # ratio tables (schroencoder.c:2548-2590) — scale the per-band
        # bit estimates inside every RD pick so the spend balances
        # against what the arith coder ACTUALLY costs per band
        from schroedinger_tpu.encoder.ratecontrol import ArithCorrection
        self.acorr = ArithCorrection(3 * subband_count(self.depth))

    def _params(self, num_refs: int) -> Params:
        p = Params(video_format=self.vf, num_refs=num_refs,
                   transform_depth=self.depth,
                   wavelet_filter_index=(self.inter_wavelet if num_refs
                                         else self.intra_wavelet))
        p.set_default_codeblocks()
        p.set_default_quant_matrix()
        p.mv_precision = self.mv_precision if num_refs else 0

        # motion block size/overlap (init_params, schroengine.c:410-455);
        # "automatic" overlap maps to partial (blen = 3/2 bsep), our fused
        # OBMC's tuned geometry, where the reference defaults to full
        sizes = {"small": 8, "medium": 12, "large": 16}
        area = self.vf.width * self.vf.height
        if self.block_size in sizes:
            bsep = sizes[self.block_size]
        elif area >= 1920 * 1080:
            bsep = 16
        elif area >= 960 * 540:
            bsep = 12
        else:
            bsep = 8
        p.xbsep_luma = p.ybsep_luma = bsep
        if self.block_overlap == "none":
            blen = bsep
        elif self.block_overlap == "full":
            blen = 2 * bsep
        else:  # partial / automatic
            blen = (bsep * 3 // 2) & ~3
        p.xblen_luma = p.yblen_luma = blen

        # codeblock_size (schroengine.c:459-505): small/medium target
        # ~5x5 / ~8x8 coefficient blocks, large = spec defaults (the
        # set_default_codeblocks above), full = one block per subband
        if self.codeblock_size in ("small", "medium"):
            denom = 5 if self.codeblock_size == "small" else 8
            for i in range(self.depth + 1):
                shift = self.depth if i == 0 else self.depth + 1 - i
                p.horiz_codeblocks[i] = max(
                    1, (p.iwt_luma_width >> shift) // denom)
                p.vert_codeblocks[i] = max(
                    1, (p.iwt_luma_height >> shift) // denom)
        elif self.codeblock_size == "full":
            for i in range(self.depth + 1):
                p.horiz_codeblocks[i] = 1
                p.vert_codeblocks[i] = 1
        if not self.enable_dc_multiquant:
            # reference decoder-compat workaround (schroengine.c:508-511)
            p.horiz_codeblocks[0] = 1
            p.vert_codeblocks[0] = 1
        # schroengine.c:517-521: multiquant picks the per-codeblock
        # quant-delta codeblock mode
        p.codeblock_mode_index = 1 if self.enable_multiquant else 0
        if self.enable_noarith:
            p.is_noarith = True
            # quant-offset mode is ambiguous in noarith streams (same
            # compat choice as the vc2_simple intra path)
            p.codeblock_mode_index = 0
        return p

    def _prefilter(self, planes):
        """Encoder prefilter dispatch (schroencoder.c:2211-2234)."""
        if self.filtering in ("none", 0, None):
            return planes
        from schroedinger_tpu.ops.filters import apply_prefilter
        return tuple(np.asarray(pl) for pl in
                     apply_prefilter(planes, self.filtering,
                                     self.filter_value))

    def _quality_metrics(self, recon, planes) -> dict:
        """Optional postanalyse (schroencoder.c:2729-2752): luma PSNR and
        SSIM of the coded reconstruction vs the (prefiltered) input."""
        out = {}
        if recon is None or (not self.enable_psnr
                             and not self.enable_ssim):
            return out
        rec = np.asarray(recon[0], np.float64)
        src = np.asarray(planes[0], np.float64)
        if self.enable_psnr:
            mse = np.mean((rec - src) ** 2)
            out["psnr"] = round(99.0 if mse == 0
                                else 10 * np.log10(255.0 ** 2 / mse), 3)
        if self.enable_ssim:
            from schroedinger_tpu.ops.metrics import ssim_frame
            out["ssim"] = round(float(ssim_frame(src, rec)), 4)
        return out

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
        planes = self._prefilter(planes)
        if self.gop_structure == "biref":
            if self._pends2 is None:
                from collections import deque
                self._pends2 = deque()
            out = bytearray()
            if self.field_factor == 2:
                from schroedinger_tpu import frontends as ff
                flds = ff.split_fields(planes, tff=self.vf.top_field_first)
            else:
                flds = [planes]
            for fld in flds:
                num = self.frame_number
                self.frame_number += 1
                sc = (self._scene_change_score(fld)
                      if self.enable_scene_change else 0.0)
                self._queue.append((num, fld, sc))
                out += self._drain_subgroups(final=False)
            return bytes(out)
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

        return bytes(self._encode_ref(planes, num, is_intra, sc_score))

    def flush(self) -> bytes:
        """Drain pending coded-order pictures (biref engine)."""
        out = bytearray()
        if self.gop_structure == "biref" and self._pends2 is not None:
            out += self._drain_subgroups(final=True)
            while self._pends2:
                out += self._finish_pending2(self._pends2.popleft())
        return bytes(out)

    def encode_stream(self, frames, progress=None) -> bytes:
        """Encode a sequence with device/host pipelining: the fused P-step
        of frame N+1 is dispatched (XLA queues it asynchronously) before the
        host entropy coding of frame N runs, so TPU compute and C++ arith
        coding overlap.

        CBR (TM5) and constant_lambda stay pipelined with ZERO stat lag:
        the per-band RD pick runs on device against each frame's own stat
        tables; only the TM5 qf crosses pictures (the reference's
        strictly-ordered quant_slot, schroencoder.c:2110-2142, carries
        exactly the same state).  constant_error keeps a lagged host pick."""
        from schroedinger_tpu.encoder import inter as ei_inter
        if self.gop_structure == "biref":
            return self._encode_stream_biref(frames, progress)
        frames = (self._prefilter(f) for f in frames)
        if self.field_factor == 2:
            from schroedinger_tpu import frontends as ff
            frames = [fld for fr in frames
                      for fld in ff.split_fields(fr, self.vf.top_field_first)]
        out = bytearray()
        # keep several frames in flight: the tunnel's per-RPC latency and
        # the device compute then overlap (the P-chain dependency lives on
        # device, so depth only delays host entropy coding, not refs)
        from collections import deque
        depth = int(self.pipeline_depth)
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
            qargs = self._quant_args("P", p)
            if (qargs.get("want_stats")
                    and qargs.get("qi_bands_override") is None and pends):
                # lagged-pick engine with no stat feedback yet (stream
                # start): drain the oldest in-flight frame so the engine
                # engages from the 2nd P
                out += self._finish_pending(pends.popleft())
                qargs = self._quant_args("P", p)
            if not ei_inter.p_step_is_cached(
                    p, **self._step_variant_kw(True, qargs)):
                # compile barrier (see _drain_if_compiling): fetch so the
                # device is idle for the compile; commits stay scheduled
                for pd in pends:
                    self._fetch_pending(pd)
            keep = planes if (self.enable_psnr or self.enable_ssim) \
                else None
            meta = (num, self.last_ref, self.prev_ref, sc, keep)
            pending = ei_inter.start_inter_picture(
                planes, p, self.ref_frames[self.last_ref],
                base_qi=self.base_qi_inter,
                use_phasecorr=self.enable_phasecorr,
                me_levels=self.downsample_levels,
                block_search_threshold=self.magic["block_search_threshold"],
                scan_distance=self.magic["scan_distance"],
                estimation=self.estimation,
                error_power=self.magic["error_power"], **qargs)
            if pends:
                ei_inter.prefetch_pending(pends[-1][0])
            # the new recon/upsample device handles become the reference
            # immediately; XLA serialises the dependency on device
            if self.prev_ref is not None:
                self._ref_graveyard.append(
                    self.ref_frames.pop(self.prev_ref, None))
            self.ref_frames[num] = RefFrame(tuple(pending["recon"]),
                                            upsampled=pending["up"])
            self.prev_ref = self.last_ref
            self.last_ref = num
            self.frame_number += 1
            pends.append((pending, meta))
            if len(pends) > depth:
                out += self._finish_pending(pends.popleft())
            if progress is not None:
                progress(num, len(out))
        while pends:
            out += self._finish_pending(pends.popleft())
        out += self._chain.add([bs.make_eos_unit()], final_eos=True)
        return bytes(out)

    def _band_scales(self, intra: bool) -> np.ndarray:
        """Per-band lambda multipliers (perceptual weights + magic scales,
        schroquantiser.c:856-880)."""
        from schroedinger_tpu.encoder.weights import (band_lambda_scales,
                                                      cycles_per_degree)
        cpd_h, cpd_v = cycles_per_degree(
            self.vf.height, self.vf.aspect_ratio_numerator,
            self.vf.aspect_ratio_denominator, self.perceptual_distance,
            self.vf.interlaced_coding)
        return band_lambda_scales(
            self.intra_wavelet if intra else self.inter_wavelet,
            self.depth, self.perceptual_weighting, cpd_h, cpd_v,
            inter_cpd_scale=self.magic["inter_cpd_scale"], intra=intra,
            subband0_scale=self.magic["subband0_lambda_scale"],
            diagonal_scale=self.magic["diagonal_lambda_scale"])

    def _band_scales3(self, intra: bool) -> np.ndarray:
        """Per-(component, band) lambda multipliers, component-major
        (3*nb,): the luma scales plus magic_chroma_lambda_scale on the
        chroma components (schroquantiser.c:865-880 — the reference
        scales lambda per component before the per-band pick)."""
        s = self._band_scales(intra)
        c = self.magic["chroma_lambda_scale"]
        return np.concatenate([s, s * c, s * c])

    def _quant_args(self, kind: str, p: Params) -> dict:
        """kwargs for start_inter_picture's quant selection: the on-device
        RD pick (lam_bands) whenever the engine is lambda-driven (CBR TM5,
        constant_lambda) — zero stat lag, pipeline stays full — or a host
        pick (constant_error needs a bisection against lagged tables)."""
        nb = subband_count(p.transform_depth)
        # the on-device RD argmin computes bits + lam*err; dividing the
        # per-band lambda by the arith-correction ratio c gives the same
        # argmin as the reference's corrected cost c*bits + lam*err
        # (schroquantiser.c:706-725 scales est_entropy by the ratios
        # before the pick)
        corr = np.maximum(self.acorr.inter, 1e-3)
        if self.qengine is not None:
            if self.qengine.mode == "constant_lambda":
                scales = (self.qengine.band_scales
                          if self.qengine.band_scales is not None
                          else np.ones(3 * nb))
                return {"lam_bands": self.qengine.lam * scales,
                        "corr_bands": corr,
                        "me_lam": self._me_lam()}
            return {"qi_bands_override": self.qengine.pick(),
                    "want_stats": True}
        if self.rc is not None:
            if hasattr(self.rc, "frame_lambda"):   # TM5 (enable_rdo_cbr)
                # per-frame on-device lambda fit: the TM5 lambda seeds
                # the device bisection, which rescales it so the
                # corrected bit estimate of the picks matches this
                # picture's complexity-weighted allocation (the
                # reference's entropy_to_lambda, schroquantiser.c:
                # 887-960).  Without the fit, spend responds to lambda
                # only as ~lambda^(1/4) in the power-4 error units and
                # the subgroup controller needs tens of frames to track
                # a rate change (measured r5: 1.7x overspend after 96
                # frames of a 500 kbps request; with the fit the spend
                # lands on the allocation per frame, like the I does)
                alloc = {"I": self.rc.I_frame_alloc,
                         "P": self.rc.P_frame_alloc,
                         "B": self.rc.B_frame_alloc}[kind]
                oh = self._oh_inter or 0.0
                # buffer-aware cap, not a hard per-frame budget: a full
                # reservoir lets pictures spend up to ~3x their
                # complexity allocation (quality rides the buffer, like
                # the reference's get_alloc curve, schroengine.c:
                # 552-637), a draining one tightens toward 1x.  A hard
                # cap starves P's and death-spirals the complexity
                # model (measured r5: P psnr -6.7 dB at equal rate)
                occ = max(self.rc.buffer_level / self.rc.buffer_size,
                          0.0)
                if occ > 0.7:
                    # reservoir healthy: the buffer IS the CBR contract,
                    # so let TM5 stable-quality spend ride it (capping
                    # while the buffer is full starves the P chain and
                    # drifts quality down the GOP — measured r5)
                    target = 0.0
                else:
                    cap = alloc * (1.0 + 2.0 * occ)
                    target = max(cap - oh, 0.25 * alloc)
                return {"lam_bands": (self.rc.frame_lambda(kind)
                                      * self._band_scales3(False)),
                        "corr_bands": corr,
                        "target_bits": target,
                        "me_lam": self._me_lam()}
            # allocation engine: host pick against lagged stat tables
            stats = (self._last_stats or self._stats_by_kind.get(kind)
                     or self._stats_by_kind.get("P")
                     or self._stats_by_kind.get("B"))
            qi = None
            if stats is not None:
                from schroedinger_tpu.encoder.ratecontrol import \
                    pick_bands_rdo
                # badblock-weighted allocation (schroengine.c:610-617;
                # the ratio is the newest finished frame's, one frame of
                # pipeline lag vs the reference's same-frame ME stats)
                mult = self.magic["badblock_multiplier_nonref" if kind == "B"
                                  else "badblock_multiplier_ref"]
                extra = self._last_badblock * mult
                qi = pick_bands_rdo(stats,
                                    self.rc.frame_target(kind=kind,
                                                         extra_weight=extra),
                                    band_scales=self._band_scales3(False),
                                    correction=corr)
            return {"qi_bands_override": qi, "want_stats": True}
        return {}

    def _rc_update(self, kind: str, bits: int, num: int,
                   est: float = None) -> bytes:
        """Updates the CBR model; returns a PADDING parse unit when the
        reservoir overran (schroencoder.c:2601-2611), else b''."""
        if self.rc is None:
            return b""
        if hasattr(self.rc, "frame_lambda"):
            pad = self.rc.update(kind, bits, num, self.field_factor)
        else:
            pad = self.rc.update(bits, est)
        return bs.make_padding_unit(pad) if pad else b""

    def _acorr_update(self, pending, unit_bits: int = 0) -> None:
        """EMA the inter arith-correction tables from a finished inter
        picture's actual vs estimated per-band bits, and the non-residual
        overhead EMA feeding the lambda-fit target."""
        est = pending.get("band_bits_est")
        if est is not None:
            self.acorr.update(False, pending["band_bits_actual"], est)
        if unit_bits:
            oh = max(unit_bits - float(
                np.sum(pending.get("band_bits_actual", 0.0))), 0.0)
            self._oh_inter = (oh if self._oh_inter is None
                              else 0.8 * self._oh_inter + 0.2 * oh)

    def _step_variant_kw(self, want_recon: bool, qargs: dict) -> dict:
        return dict(
            n_extra=(ei_inter.N_PHASECORR_CANDS if self.enable_phasecorr
                     else 0),
            want_stats=bool(qargs.get("want_stats")),
            want_recon=want_recon,
            rdo_pick="lam_bands" in qargs,
            me_levels=self.downsample_levels,
            block_search_threshold=self.magic["block_search_threshold"],
            scan_distance=self.magic["scan_distance"],
            estimation=self.estimation,
            error_power=self.magic["error_power"])

    def _drain_if_compiling(self, p, want_recon: bool, qargs: dict) -> bytes:
        """Quiesce the device before dispatching a picture variant whose
        fused step is not yet compiled: on the axon tunnel a remote XLA
        compile issued while other executions are queued can crash the
        TPU worker (observed reproducibly at 1080p biref).

        Pending pictures are FETCHED (their wire transfers block until
        all queued device work completes, so the device is idle for the
        compile) but NOT committed: rate-control / quantiser-engine /
        correction updates and byte emission stay on the normal pipeline
        schedule, so the output bytes are identical whether or not a
        compile barrier fired here (cold vs warm compile caches produce
        byte-identical streams — the multihost sharding contract)."""
        if ei_inter.p_step_is_cached(p, **self._step_variant_kw(want_recon,
                                                                qargs)):
            return b""
        for pend in self._pends2:
            self._fetch_pending2(pend)
        return b""

    def _fetch_pending2(self, pend) -> None:
        """Fetch a pending picture's device results (blocking) without
        committing its rate-control side effects; idempotent."""
        pending, (num, refs, retired, is_ref, kind, sc, keep) = pend
        if "_fetched" not in pending:
            pending["_fetched"] = ei_inter.finish_inter_picture(
                pending, num, refs[0], is_ref=is_ref, retired=retired,
                ref2_num=refs[1] if len(refs) > 1 else None)


    def _me_lam(self) -> float:
        """Mode-decision lambda (frame_me_lambda analog): tracks the
        newest finished frame's coarsest quant step (QF/8 SAD per bit)."""
        from schroedinger_tpu import tables
        qi = getattr(self, "_last_max_qi", None)
        if qi is None:
            qi = self.base_qi_inter
        return (float(tables.QUANT_FACTOR[min(int(qi), 60)]) / 8.0
                * self.magic["me_lambda_scale"])

    # ---- tworef/BBBP engine --------------------------------------------
    # TPU-first re-expression of the reference's tworef GOP machinery
    # (schroengine.c:685-796 handle_gop_tworef, :247-304 code_BBBP,
    # :127-245 pick_refs/pick_retire): display-order frames buffer into
    # subgroups of `subgroup_length`; the last picture of each subgroup is
    # coded FIRST as a P, then the earlier pictures as non-reference 2-ref
    # B's (back ref = previous I/P, forward ref = the new P/I).  The
    # decoder-visible reference buffer is modelled explicitly: coding a P
    # *expires* the previous P (schroengine.c:276 expire_reference) but the
    # retire lags one subgroup (pick_retire returns the oldest EXPIRED
    # ref), because the reference decoder retires BEFORE binding refs
    # (schrodecoder.c:1302).  The most recent AU's intra picture stays
    # unexpired until the next AU, so steady-state P pictures are 2-ref
    # (refs = previous P + long-term I) exactly as the reference's
    # pick_refs yields.  All inter pictures run the fused 1/2-ref step
    # (subpel ME + RD mode/split) dispatched ahead of host entropy coding:
    # the subgroup dependency chain lives on device.

    # decoder-visible reference buffer model (schroengine.c:127-245)
    def _pick_refs(self, fn: int):
        """ref0 = most recent back ref (expiry ignored); ref1 = earliest
        forward unexpired ref, else newest older unexpired back ref."""
        back = [n for n in self._refbuf if n < fn]
        ref0 = max(back)
        fwd = [n for n, exp in self._refbuf.items() if n > fn and not exp]
        if fwd:
            return ref0, min(fwd)
        older = [n for n, exp in self._refbuf.items()
                 if n < ref0 and not exp]
        return ref0, (max(older) if older else None)

    def _pick_retire(self):
        """Oldest expired ref; forced oldest-overall when the buffer holds
        max_refs pictures (the max_refs setting; schroengine.c:186-205's
        forced retire)."""
        expired = [n for n, e in self._refbuf.items() if e]
        if expired:
            return min(expired)
        if len(self._refbuf) >= self.max_refs:
            return min(self._refbuf)
        return None

    def _retire_and_add(self, retire, fn: int):
        if retire is not None:
            self._refbuf.pop(retire, None)
            self._ref_graveyard.append(
                self.ref_frames.pop(retire, None))
        self._refbuf[fn] = False

    def _encode_stream_biref(self, frames, progress=None) -> bytes:
        out = bytearray()
        for i, planes in enumerate(frames):
            out += self.encode_frame(planes)
            if progress is not None:
                progress(i, len(out))
        out += self.flush()
        out += self._chain.add([bs.make_eos_unit()], final_eos=True)
        return bytes(out)

    def _drain_subgroups(self, final: bool) -> bytes:
        """Cut completed subgroups off the display-order queue and encode
        them (handle_gop_tworef's boundary logic, schroengine.c:703-776):
        an AU boundary ends the subgroup *with* the AU frame as its intra
        last picture (open GOP: the preceding B's reference the new I
        forward); a scene cut at the head becomes an I, a cut mid-subgroup
        ends the subgroup just before the cut frame."""
        out = bytearray()
        while self._queue:
            sg = self.subgroup_length
            n = len(self._queue)
            take = None
            last_is_intra = False
            for j in range(min(sg, n)):
                num, _, sc = self._queue[j]
                is_au = (self._au_frame is None
                         or (num - self._au_frame)
                         >= self.gop_length * self.field_factor)
                cut = (self.enable_scene_change
                       and sc > self.scene_change_threshold
                       and self._refbuf)
                if is_au:
                    # open GOP: the AU frame ends the subgroup as its
                    # intra last picture (preceding B's reference it
                    # forward); closed GOP cuts before it so no picture
                    # crosses the AU (schroengine.c:729-736)
                    if self.open_gop or j == 0:
                        take, last_is_intra = j + 1, True
                    else:
                        take, last_is_intra = j, False
                    break
                if cut:
                    if j == 0:
                        take, last_is_intra = 1, True
                    else:
                        take, last_is_intra = j, False
                    break
            if take is None:
                if n >= sg:
                    take = sg
                elif final:
                    take = n
                else:
                    break  # wait for more frames
            group = [self._queue.pop(0) for _ in range(take)]
            out += self._encode_subgroup(group, last_is_intra)
        return bytes(out)

    def _encode_subgroup(self, group, last_is_intra: bool) -> bytes:
        out = bytearray()
        num, planes, sc = group[-1]
        if last_is_intra or not self._refbuf:
            while self._pends2:
                out += self._finish_pending2(self._pends2.popleft())
            retire = self._pick_retire()
            out += self._encode_ref(planes, num, True, sc,
                                    retired=retire, manage_refs=False)
            self._retire_and_add(retire, num)
            intra_num = num
        else:
            out += self._start_ref_biref(planes, num, sc)
            intra_num = None
        bs_ = group[:-1]
        batched = (self._start_b_batch(bs_)
                   if len(bs_) >= 2 and self.enable_b_batch else None)
        if batched is not None:
            out += batched
        else:
            for (bnum, bplanes, bsc) in bs_:
                out += self._start_b_biref(bplanes, bnum, bsc)
        if intra_num is not None:
            # expire_refs_before (schroengine.c:294-296): pre-AU refs
            # become retire candidates for subsequent ref pictures
            for n in self._refbuf:
                if n < intra_num:
                    self._refbuf[n] = True
            self._au_frame = intra_num
        return bytes(out)

    def _start_ref_biref(self, planes, num, sc) -> bytes:
        """Code the subgroup-last P: ref0 = previous I/P, ref1 = long-term
        unexpired ref (the last AU's intra) when one exists; retire lags
        by one subgroup (schroengine.c:267-277)."""
        from schroedinger_tpu.encoder import inter as ei_inter
        retire = self._pick_retire()
        ref0, ref1 = self._pick_refs(num)
        if self.max_refs < 2:
            ref1 = None
        refs = [ref0] if ref1 is None else [ref0, ref1]
        p = self._params(len(refs))
        qargs = self._quant_args("P", p)
        out_pre = self._drain_if_compiling(p, True, qargs)
        pending = ei_inter.start_inter_picture(
            planes, p, self.ref_frames[ref0],
            base_qi=self.base_qi_inter,
            use_phasecorr=self.enable_phasecorr,
            ref2=(self.ref_frames[ref1] if ref1 is not None else None),
            want_recon=True, me_levels=self.downsample_levels,
            block_search_threshold=self.magic["block_search_threshold"],
            scan_distance=self.magic["scan_distance"],
            estimation=self.estimation,
            error_power=self.magic["error_power"],
            **qargs)
        keep = planes if (self.enable_psnr or self.enable_ssim) else None
        meta = (num, refs, retire, True, "P", sc, keep)
        self.ref_frames[num] = RefFrame(tuple(pending["recon"]),
                                        upsampled=None)
        self._retire_and_add(retire, num)
        # expire_reference(encoder->last_ref) after coding each P
        if self._enc_last_ref in self._refbuf:
            self._refbuf[self._enc_last_ref] = True
        self._enc_last_ref = num
        self._pends2.append((pending, meta))
        return out_pre + self._drain_pends2()

    def _start_b_biref(self, planes, num, sc) -> bytes:
        from schroedinger_tpu.encoder import inter as ei_inter
        ref0, ref1 = self._pick_refs(num)
        refs = [ref0, ref1]
        p = self._params(2)
        qargs = self._quant_args("B", p)
        want_rec = (self.enable_md5 or self.enable_psnr
                    or self.enable_ssim)
        out_pre = self._drain_if_compiling(p, want_rec, qargs)
        pending = ei_inter.start_inter_picture(
            planes, p, self.ref_frames[ref0],
            base_qi=self.base_qi_b,
            use_phasecorr=self.enable_phasecorr,
            ref2=self.ref_frames[ref1],
            want_recon=want_rec,
            me_levels=self.downsample_levels,
            block_search_threshold=self.magic["block_search_threshold"],
            scan_distance=self.magic["scan_distance"],
            estimation=self.estimation,
            error_power=self.magic["error_power"],
            **qargs)
        keep = planes if (self.enable_psnr or self.enable_ssim) else None
        meta = (num, refs, None, False, "B", sc, keep)
        self._pends2.append((pending, meta))
        return out_pre + self._drain_pends2()

    def _start_b_batch(self, bs_):
        """Dispatch a whole subgroup's B pictures as ONE vmapped device
        program (inter.start_inter_batch): 1 dispatch + 1 wire transfer
        instead of 4N staged RPCs.  Returns None to fall back to the
        per-picture path when the batch preconditions don't hold
        (phasecorr extra inputs, mixed refs, host-pick quantisers,
        recon-needed Bs)."""
        from schroedinger_tpu.encoder import inter as ei_inter
        if self.enable_phasecorr:
            return None
        if len(bs_) != self.subgroup_length - 1:
            return None     # tail/cut subgroups: one-off batch shapes
                            # are not worth their own compile; per-pic
        want_rec = (self.enable_md5 or self.enable_psnr
                    or self.enable_ssim)
        if want_rec:
            return None     # recon slicing unvalidated; keep simple path
        nums = [b[0] for b in bs_]
        refsl = [self._pick_refs(n) for n in nums]
        ref0, ref1 = refsl[0]
        if ref1 is None or any(r != refsl[0] for r in refsl[1:]):
            return None
        if self.max_refs < 2:
            return None
        p = self._params(2)
        qargs_l = [self._quant_args("B", p) for _ in bs_]
        if "lam_bands" not in qargs_l[0]:
            return None     # host-pick engine: per-picture path
        kw = self._step_variant_kw(want_rec, qargs_l[0])
        if not ei_inter.b_batch_is_cached(p, len(bs_), **kw):
            for pend in self._pends2:
                self._fetch_pending2(pend)
        qsels = [{"lam_bands": qa["lam_bands"],
                  "me_lam": qa.get("me_lam", self._me_lam()),
                  "target_bits": qa.get("target_bits", 0.0),
                  "corr_bands": qa.get("corr_bands")} for qa in qargs_l]
        pendings = ei_inter.start_inter_batch(
            [self._prefilter(b[1]) for b in bs_], p,
            self.ref_frames[ref0], self.ref_frames[ref1], qsels,
            want_recon=want_rec,
            want_stats=bool(qargs_l[0].get("want_stats")),
            me_levels=self.downsample_levels,
            block_search_threshold=self.magic["block_search_threshold"],
            scan_distance=self.magic["scan_distance"],
            estimation=self.estimation,
            error_power=self.magic["error_power"])
        out = bytearray()
        for (num, planes, sc), pending in zip(bs_, pendings):
            meta = (num, [ref0, ref1], None, False, "B", sc, None)
            self._pends2.append((pending, meta))
        out += self._drain_pends2()
        return bytes(out)

    def _drain_pends2(self) -> bytes:
        out = bytearray()
        if (self.qengine is not None
                and self.qengine.mode != "constant_lambda"
                and not self._stats_by_kind and self._pends2):
            # lagged-pick engine with no stat feedback yet (stream
            # start): drain the oldest
            out += self._finish_pending2(self._pends2.popleft())
        while len(self._pends2) > self.pipeline_depth:
            out += self._finish_pending2(self._pends2.popleft())
        return bytes(out)

    def _finish_pending2(self, pend) -> bytes:
        self._fetch_pending2(pend)
        pending, (num, refs, retired, is_ref, kind, sc, keep) = pend
        unit, stats = pending.pop("_fetched")
        if self.qengine:
            self.qengine.update(stats)
        if stats is not None:
            self._stats_by_kind[kind] = stats
        self._acorr_update(pending, len(unit) * 8)
        self._last_badblock = pending.get("badblock_ratio", 0.0)
        if pending.get("qi_bands") is not None and kind != "B":
            nbq = pending["layout"]["nb"]
            self._last_max_qi = int(np.max(
                np.asarray(pending["qi_bands"]).ravel()[:nbq]))
        pad_unit = b""
        if self.rc is not None:
            est = None
            if stats is not None and pending.get("qi_bands") is not None:
                from schroedinger_tpu.encoder.ratecontrol import \
                    estimate_bits_at
                est = estimate_bits_at(stats[0], pending["qi_bands"])
            pad_unit = self._rc_update(kind, len(unit) * 8, num, est)
        units = []
        if self.enable_md5 and pending["recon"] is not None:
            from schroedinger_tpu.coding import native as _native
            units.append(bs.make_aux_unit(
                bs.AUX_MD5_CHECKSUM,
                _native.frame_md5(tuple(np.asarray(pl)
                                        for pl in pending["recon"]))))
        units.append(unit)
        self.stats.record(frame=num, intra=False, b_picture=(kind == "B"),
                          bits=len(unit) * 8, sc_score=round(sc, 3),
                          dc_ratio=round(pending.get("dc_ratio", 0.0), 3),
                          badblock=round(
                              pending.get("badblock_ratio", 0.0), 3),
                          buffer_level=(self.rc.buffer_level if self.rc
                                        else None),
                          base_lambda=getattr(self.rc, "base_lambda",
                                              None) if self.rc else None,
                          **(self._quality_metrics(pending["recon"], keep)
                             if keep is not None else {}))
        if pad_unit:
            units.append(pad_unit)
        return self._chain.add(units)

    def _fetch_pending(self, pend) -> None:
        """Backref-path analog of _fetch_pending2: blocking fetch,
        commit deferred; idempotent."""
        pending, (num, ref_num, retired, sc, keep) = pend
        if "_fetched" not in pending:
            pending["_fetched"] = ei_inter.finish_inter_picture(
                pending, num, ref_num, is_ref=True, retired=retired)

    def _finish_pending(self, pend) -> bytes:
        self._fetch_pending(pend)
        pending, (num, ref_num, retired, sc, keep) = pend
        unit, stats = pending.pop("_fetched")
        if self.qengine:
            self.qengine.update(stats)
        if stats is not None:
            self._last_stats = stats
        self._acorr_update(pending, len(unit) * 8)
        self._last_badblock = pending.get("badblock_ratio", 0.0)
        if pending.get("qi_bands") is not None:
            nbq = pending["layout"]["nb"]
            self._last_max_qi = int(np.max(
                np.asarray(pending["qi_bands"]).ravel()[:nbq]))
        pad_unit = b""
        if self.rc is not None:
            est = None
            if stats is not None and pending.get("qi_bands") is not None:
                from schroedinger_tpu.encoder.ratecontrol import \
                    estimate_bits_at
                est = estimate_bits_at(stats[0], pending["qi_bands"])
            pad_unit = self._rc_update("P", len(unit) * 8, num, est)
        units = []
        if self.enable_md5:
            from schroedinger_tpu.coding import native as _native
            units.append(bs.make_aux_unit(
                bs.AUX_MD5_CHECKSUM,
                _native.frame_md5(tuple(np.asarray(pl)
                                        for pl in pending["recon"]))))
        units.append(unit)
        self.stats.record(frame=num, intra=False, bits=len(unit) * 8,
                          sc_score=round(sc, 3), buffer_level=None,
                          dc_ratio=round(pending.get("dc_ratio", 0.0), 3),
                          **(self._quality_metrics(pending["recon"], keep)
                             if keep is not None else {}))
        if pad_unit:
            units.append(pad_unit)
        return self._chain.add(units)

    def _seed_rc_from_intra(self, planes, p) -> None:
        """Calibrate the TM5 base lambda against THIS content before the
        first picture is coded: transform the first frame, build its
        exact stat tables, and solve for the lambda whose RD pick costs
        the I-frame allocation (lambda_for_bits — the reference's
        entropy_to_lambda bisection, schroquantiser.c:887-960, applied
        once at stream start).  One extra device IWT + stats fetch,
        first frame only."""
        import jax.numpy as jnp
        from schroedinger_tpu.coding import slices as sl
        from schroedinger_tpu.encoder.lowdelay import (_forward_jit,
                                                       _prep_plane)
        from schroedinger_tpu.encoder.ratecontrol import (lambda_for_bits,
                                                          stats_tables)
        dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]
        import jax as _jax
        for attempt in range(3):
            try:
                band_lists = []
                for plane, (oh, ow) in zip(planes, dims):
                    prepped = _prep_plane(jnp.asarray(plane), oh, ow)
                    pyr = _forward_jit(prepped, p.transform_depth,
                                       p.wavelet_filter_index)
                    band_lists.append(
                        sl.subband_arrays(pyr, p.transform_depth))
                stats = stats_tables(
                    band_lists, p, intra=True,
                    error_power=self.magic["error_power"])
                break
            except _jax.errors.JaxRuntimeError as e:
                if (not ei_inter._is_transient_tunnel_error(e)
                        or attempt == 2):
                    raise
                ei_inter._log_stage_retry("rc_seed", attempt, e)
                import time as _t
                _t.sleep(2.0 * (attempt + 1))
        corr_i = np.maximum(self.acorr.intra, 1e-3)
        bits_c = np.asarray(stats[0], np.float64) * corr_i
        # only seed when the allocation is BINDING: if even the finest
        # pick (row 0) costs less than the I allocation, the content is
        # cheaper than the budget and the default quality-level lambda
        # (with the TM5 undershoot-on-easy-content behaviour, like the
        # reference) is the right regime — an unbounded fit would pin
        # everything at maximum quality and overspend the first GOP
        # reservoir-aware first-I target: the reference lets its intra
        # borrow deeply from the buffer (high-quality refs are what make
        # the cheap B's work), so fit to ~0.3 buffer rather than the
        # pro-rata allocation — the never-finer clamp below keeps this
        # inactive whenever the default quality level already fits
        target = max(self.rc.I_frame_alloc, 0.3 * self.rc.buffer_size)
        max_bits = float(bits_c[0].sum())
        if target >= 0.9 * max_bits:
            return
        lam = lambda_for_bits(bits_c, stats[1], target,
                              band_scales=self._band_scales3(True))
        if np.isfinite(lam) and lam > 0:
            # base_lambda is the I-level lambda (frame_lambda("I")
            # returns it unscaled); P/B derive via the magic scales;
            # never seed FINER than the default quality level — the fit
            # exists to descend fast on over-budget content
            self.rc.base_lambda = float(min(lam, self.rc.base_lambda))

    def _encode_ref(self, planes, num, is_intra, sc_score,
                    retired="auto", manage_refs=True) -> bytes:
        if retired == "auto":
            retired = self.prev_ref
        units = []
        if is_intra:
            units.append(bs.write_sequence_header(self.vf, profile=8, level=0))
            if not self._sent_stream_aux:
                # codec-comment + CBR bitrate auxiliary data with the
                # first coded frame (schro_encoder_encode_codec_comment /
                # _bitrate_comment, schroencoder.c:1480-1507,:744)
                self._sent_stream_aux = True
                units.append(bs.make_aux_unit(
                    1, b"schroedinger-tpu 2.0"))      # ENCODER_STRING
                if self.rc is not None:
                    units.append(bs.make_aux_unit(
                        4, int(self.rc.bitrate).to_bytes(4, "big")))
            p = self._params(0)
            nb = subband_count(p.transform_depth)
            qm = np.asarray(p.quant_matrix[:nb], np.int32)
            qi_bands = np.tile(np.clip(self.base_qi_intra - qm, 0, 60), 3)
            intra_lambda = None
            intra_est_bands = None
            if (self.qengine is not None
                    and self.qengine.mode == "constant_lambda"):
                intra_lambda = (self.qengine.lam
                                * self.magic["I_lambda_scale"])
            elif self.rc is not None and hasattr(self.rc, "frame_lambda"):
                if getattr(self.rc, "intra_cbr_lambda", False) is None:
                    # FIRST intra: seed the TM5 base lambda by fitting
                    # this frame's exact stat tables to its allocation.
                    # The reference trusts its fixed qf->lambda absolute
                    # calibration; ours measures it instead — without
                    # this, low-rate clips overspend for a whole GOP
                    # while the subgroup controller descends (measured
                    # r5: 1.6 Mbps delivered for a 500 kbps request on
                    # 32 frames)
                    self._seed_rc_from_intra(planes, p)
                intra_lambda = self.rc.frame_lambda("I")
            from schroedinger_tpu.utils import toggles as _toggles
            use_fused = (intra_lambda is not None
                         and self.vf.bit_depth == 8
                         and not self.enable_noarith
                         and p.codeblock_mode_index == 0
                         and not _toggles.disabled("fused_intra"))
            if use_fused:
                # fused intra path: one device dispatch + one wire fetch
                # (transform, stats, on-device RD pick, quantise), host
                # native entropy + serial DC-predict band 0, device recon
                (unit, recon, qi_bands, stats, bb_act,
                 bb_est) = ei_intra.encode_picture_fused(
                    planes, p, num,
                    intra_lambda * self._band_scales3(True),
                    is_ref=True, retired=retired,
                    corr=self.acorr.intra,
                    error_power=self.magic["error_power"])
                self.acorr.update(True, bb_act, bb_est)
                oh = max(len(unit) * 8 - float(np.sum(bb_act)), 0.0)
                self._oh_intra = (oh if self._oh_intra is None
                                  else 0.8 * self._oh_intra + 0.2 * oh)
                up = None
                pad_unit = b""
                if self.rc:
                    pad_unit = self._rc_update("I", len(unit) * 8, num)
                if self.enable_md5 or self.enable_psnr or self.enable_ssim:
                    recon = tuple(np.asarray(pl) for pl in recon)
                if self.enable_md5:
                    from schroedinger_tpu.coding import native as _native
                    units.append(bs.make_aux_unit(
                        bs.AUX_MD5_CHECKSUM,
                        _native.frame_md5(tuple(np.asarray(pl)
                                                for pl in recon))))
                units.append(unit)
                if pad_unit:
                    units.append(pad_unit)
                if manage_refs:
                    if self.prev_ref is not None:
                        self._ref_graveyard.append(
                            self.ref_frames.pop(self.prev_ref, None))
                    self.prev_ref = self.last_ref
                    self.last_ref = num
                self.ref_frames[num] = RefFrame(tuple(recon), upsampled=up)
                if num == self.frame_number:
                    self.frame_number += 1
                self.stats.record(frame=num, intra=True,
                                  bits=len(unit) * 8,
                                  sc_score=round(sc_score, 3),
                                  **(self._quality_metrics(recon, planes)
                                     if isinstance(recon[0], np.ndarray)
                                     else {}),
                                  buffer_level=(self.rc.buffer_level
                                                if self.rc else None))
                return self._chain.add(units)
            if self.rc or intra_lambda is not None:
                import jax.numpy as jnp
                from schroedinger_tpu.coding import slices as sl
                from schroedinger_tpu.encoder.lowdelay import (_forward_jit,
                                                               _prep_plane)
                from schroedinger_tpu.encoder.ratecontrol import (
                    qi_from_lambda, stats_tables)
                dims = [(p.iwt_luma_height, p.iwt_luma_width),
                        (p.iwt_chroma_height, p.iwt_chroma_width),
                        (p.iwt_chroma_height, p.iwt_chroma_width)]
                band_lists = []
                for plane, (oh, ow) in zip(planes, dims):
                    prepped = _prep_plane(jnp.asarray(plane), oh, ow)
                    pyr = _forward_jit(prepped, p.transform_depth,
                                       p.wavelet_filter_index)
                    band_lists.append(sl.subband_arrays(pyr, p.transform_depth))
                stats = stats_tables(band_lists, p, intra=True,
                                     error_power=self.magic["error_power"])
                # intra arith-correction: scale the per-band bit
                # estimates by the measured intra coder ratios before
                # the RD pick (schroquantiser.c:704-725)
                corr_i = np.maximum(self.acorr.intra, 1e-3)
                bits_c = np.asarray(stats[0], np.float64) * corr_i
                if intra_lambda is not None:
                    qi_bands = qi_from_lambda(
                        bits_c, stats[1], intra_lambda,
                        band_scales=self._band_scales3(True))
                elif hasattr(self.rc, "frame_lambda"):
                    qi_bands = qi_from_lambda(
                        bits_c, stats[1], self.rc.frame_lambda("I"),
                        band_scales=self._band_scales3(True))
                else:
                    from schroedinger_tpu.encoder.ratecontrol import \
                        pick_bands_rdo
                    qi_bands = pick_bands_rdo(
                        stats, self.rc.frame_target(True),
                        band_scales=self._band_scales3(True),
                        correction=corr_i)
                intra_est_bands = np.asarray(stats[0], np.float64)[
                    np.clip(np.asarray(qi_bands), 0, 60),
                    np.arange(3 * nb)]
            qis = {}
            for comp in range(3):
                for i in range(nb):
                    hcb, vcb = ei_inter._codeblock_counts(p, i)
                    qis[(comp, i)] = np.full(
                        (vcb, hcb), int(qi_bands[comp * nb + i]), np.int32)
            bb_out = []
            unit, recon = ei_intra.encode_picture(planes, p, num,
                                                  quant_indices=qis,
                                                  is_ref=True,
                                                  retired=retired,
                                                  return_recon=True,
                                                  band_bits_out=bb_out)
            if intra_est_bands is not None and bb_out:
                self.acorr.update(True, bb_out[0], intra_est_bands)
            up = None
            pad_unit = b""
            if self.rc:
                pad_unit = self._rc_update("I", len(unit) * 8, num)
        else:
            p = self._params(1)
            (unit, recon, used_qi, stats, up,
             dc_ratio, ipend) = ei_inter.encode_inter_picture(
                planes, p, num, self.last_ref, self.ref_frames[self.last_ref],
                base_qi=self.base_qi_inter, is_ref=True,
                retired=retired,
                use_phasecorr=self.enable_phasecorr,
                me_levels=self.downsample_levels,
                block_search_threshold=self.magic["block_search_threshold"],
                scan_distance=self.magic["scan_distance"],
                estimation=self.estimation,
                error_power=self.magic["error_power"],
                **self._quant_args("P", p))
            if dc_ratio > self.magic.get("me_bailout_limit", 0.33):
                # intra bailout (schroencoder.c:2373-2384): motion
                # compensation failed for most blocks -> code this
                # picture as intra instead (same number/retire, so any
                # dependent picture numbering is unaffected)
                return self._encode_ref(planes, num, True, sc_score,
                                        retired=retired,
                                        manage_refs=manage_refs)
            if self.qengine:
                self.qengine.update(stats)
            if stats is not None:
                self._last_stats = stats
            self._acorr_update(ipend, len(unit) * 8)
            pad_unit = b""
            if self.rc:
                pad_unit = self._rc_update("P", len(unit) * 8, num)
        if self.enable_md5:
            from schroedinger_tpu.coding import native as _native
            units.append(bs.make_aux_unit(
                bs.AUX_MD5_CHECKSUM,
                _native.frame_md5(tuple(np.asarray(pl) for pl in recon))))
        units.append(unit)
        if pad_unit:
            units.append(pad_unit)

        if manage_refs:
            if self.prev_ref is not None:
                self._ref_graveyard.append(
                    self.ref_frames.pop(self.prev_ref, None))
            self.prev_ref = self.last_ref
            self.last_ref = num
        self.ref_frames[num] = RefFrame(recon, upsampled=up)
        if num == self.frame_number:
            self.frame_number += 1
        self.stats.record(frame=num, intra=bool(is_intra),
                          bits=len(unit) * 8, sc_score=round(sc_score, 3),
                          **self._quality_metrics(recon, planes),
                          buffer_level=(self.rc.buffer_level if self.rc
                                        else None))
        return self._chain.add(units)

