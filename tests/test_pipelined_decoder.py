"""Pipelined decoder: must be bit-identical to the per-picture decoder
(and the reference) on every picture type, while deferring output fetches
so host entropy decode overlaps device render (decoder/pipeline.py)."""
import numpy as np

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.decoder.pipeline import PipelinedStreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from tests.test_gop_encoder import make_frames, W, H


def _vf():
    return VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                       chroma_format=ChromaFormat.C420,
                       frame_rate_numerator=25, frame_rate_denominator=1)


def _check_stream(stream, n_frames):
    base = StreamDecoder().decode_stream(stream)
    piped = PipelinedStreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(piped) == len(base) == n_frames
    for g3, b3, r3 in zip(piped, base, ref):
        for g, b, r in zip(g3, b3, r3):
            np.testing.assert_array_equal(g, b)
            np.testing.assert_array_equal(g, r)


def test_pipelined_backref_matches():
    frames = make_frames(7)
    enc = GopEncoder(_vf(), gop_length=4, mv_precision=2,
                     base_qi_intra=14, base_qi_inter=18)
    _check_stream(enc.encode_stream(frames), len(frames))


def test_pipelined_biref_matches():
    frames = make_frames(9)
    enc = GopEncoder(_vf(), gop_length=8, mv_precision=2,
                     gop_structure="biref", bitrate=600_000, fps=25)
    _check_stream(enc.encode_stream(frames), len(frames))


def test_pipelined_md5_verifies():
    frames = make_frames(5)
    enc = GopEncoder(_vf(), gop_length=4, mv_precision=1, enable_md5=True)
    stream = enc.encode_stream(frames)
    dec = PipelinedStreamDecoder()
    dec.decode_stream(stream)
    assert dec.md5_failures == []
    # corrupt one arith payload byte: its picture must register an MD5
    # failure (or a classified error) but the stream keeps decoding
    bad = bytearray(stream)
    bad[len(bad) // 2] ^= 0xFF
    dec2 = PipelinedStreamDecoder()
    out = dec2.decode_stream(bytes(bad))
    assert dec2.md5_failures or dec2.errors or len(out) < len(frames)
