"""Public push/pull codec API (SchroEncoder/SchroDecoder equivalents).

Mirrors the reference's state-machine API (schroencoder.h:442-476,
schrodecoder.h:179-203) with a Pythonic surface: push frames, pull parse
units; the decoder accepts whole streams or incremental buffers.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.config import EncoderConfig
from schroedinger_tpu.decoder import lowdelay as lod
from schroedinger_tpu.encoder import lowdelay as loe
from schroedinger_tpu.params import Params
from schroedinger_tpu.video_format import VideoFormat
from schroedinger_tpu.wavelets import MAX_DEPTH_S16, Wavelet


def _reduce_fraction(n: int, d: int) -> Tuple[int, int]:
    import math
    g = math.gcd(n, d)
    return n // g, d // g


class Encoder:
    """Dirac/VC-2 encoder. Currently supports the VC-2 low-delay profile;
    Dirac intra and long-GOP profiles land via encoder/intra.py and
    encoder/gop.py."""

    def __init__(self, video_format: VideoFormat, config: Optional[EncoderConfig] = None):
        self.vf = video_format
        self.cfg = config or EncoderConfig()
        self.frame_number = 0
        self._out: List[bytes] = []
        self._chain = bs.OffsetChain()

        if self.cfg.rate_control != "low_delay":
            raise NotImplementedError(
                f"rate control {self.cfg.rate_control!r} not yet implemented")

        depth = min(self.cfg.transform_depth,
                    MAX_DEPTH_S16[Wavelet(self.cfg.intra_wavelet)])
        p = Params(video_format=self.vf, is_lowdelay=True, num_refs=0,
                   wavelet_filter_index=Wavelet(self.cfg.intra_wavelet),
                   transform_depth=depth)
        if self.cfg.horiz_slices and self.cfg.vert_slices:
            p.n_horiz_slices = self.cfg.horiz_slices
            p.n_vert_slices = self.cfg.vert_slices
        else:
            p.n_horiz_slices = p.iwt_chroma_width >> depth
            p.n_vert_slices = p.iwt_chroma_height >> depth
        p.set_default_quant_matrix()

        bitrate = self.cfg.bitrate
        if bitrate == 0:
            bitrate = (self.vf.width * self.vf.height
                       * self.vf.frame_rate_numerator
                       // self.vf.frame_rate_denominator) * 2
        num = bitrate * self.vf.frame_rate_denominator // (
            self.vf.frame_rate_numerator * 8)
        denom = p.n_horiz_slices * p.n_vert_slices
        p.slice_bytes_num, p.slice_bytes_denom = _reduce_fraction(num, denom)
        self.params = p

    def push_frame(self, planes: Tuple[np.ndarray, np.ndarray, np.ndarray]) -> None:
        units = [bs.write_sequence_header(self.vf, profile=0, level=0),
                 loe.encode_picture(planes, self.params, self.frame_number)]
        self._out.append(self._chain.add(units))
        self.frame_number += 1

    def pull(self) -> Optional[bytes]:
        if self._out:
            return self._out.pop(0)
        return None

    def end_of_stream(self) -> bytes:
        return self._chain.add([bs.make_eos_unit()], final_eos=True)

    def encode_stream(self, frames) -> bytes:
        """Pipelined encode: TPU transform/transfer of frame N+1 overlaps the
        native entropy packing of frame N (two host threads, async device)."""
        import concurrent.futures as cf

        try:
            from schroedinger_tpu.encoder.lowdelay import (
                _get_transform_fn, encode_picture_from_slices)
            import jax.numpy as jnp
            transform = _get_transform_fn(self.params)
        except Exception:
            transform = None

        out = bytearray()
        if transform is None:
            for f in frames:
                self.push_frame(f)
                out += self.pull()
            out += self.end_of_stream()
            return bytes(out)

        def fetch(dev_arrays):
            return [np.asarray(a) for a in dev_arrays]

        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            pending = None  # (future of host arrays, frame_number)
            for f in frames:
                import jax.numpy as jnp
                dev = transform(*[jnp.asarray(pl) for pl in f])
                fut = pool.submit(fetch, dev)
                if pending is not None:
                    self._emit(pending, out)
                pending = (fut, self.frame_number)
                self.frame_number += 1
            if pending is not None:
                self._emit(pending, out)
        out += self.end_of_stream()
        return bytes(out)

    def _emit(self, pending, out: bytearray) -> None:
        from schroedinger_tpu.encoder.lowdelay import encode_picture_from_slices
        fut, fnum = pending
        ys, us, vs = fut.result()
        units = [bs.write_sequence_header(self.vf, profile=0, level=0),
                 encode_picture_from_slices(ys, us, vs, self.params, fnum,
                                            is_ref=False)]
        out += self._chain.add(units)


class Decoder:
    """Dirac/VC-2 decoder. Accepts a full stream; low-delay profile."""

    def __init__(self):
        self.vf: Optional[VideoFormat] = None

    def decode_stream(self, stream: bytes):
        frames = []
        for code, payload in bs.split_units(stream):
            if code == bs.SEQUENCE_HEADER:
                self.vf = bs.read_sequence_header(BitReader(payload)).video_format
            elif bs.is_picture(code):
                if not bs.is_lowdelay(code):
                    raise NotImplementedError("only low-delay pictures supported")
                r = BitReader(payload)
                frame_number = r.read_bits(32)
                if bs.is_reference(code):
                    r.read_sint()
                r.sync()
                p = Params(video_format=self.vf, is_lowdelay=True,
                           num_refs=bs.num_refs(code))
                bs.read_transform_parameters(r, p)
                r.sync()
                frames.append(lod.decode_picture(payload[r.bits_read // 8:], p))
        return frames
