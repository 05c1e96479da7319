"""Decoder error resilience: resync over garbage, tolerate broken pictures,
continue after errors (schroparse.c sync machine, per-picture error flags)."""
import numpy as np

from schroedinger_tpu.api import Decoder, Encoder
from schroedinger_tpu.config import EncoderConfig
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from tests.test_api import make_frames, W, H


def _enc():
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    return Encoder(vf, EncoderConfig(rate_control="constant_quality",
                                     gop_structure="intra_only",
                                     transform_depth=3))


def test_resync_over_garbage_prefix():
    frames = make_frames(2)
    stream = _enc().encode_stream(frames)
    dirty = b"\x00garbage!" * 5 + stream
    out = Decoder().decode_stream(dirty)
    assert len(out) == 2


def test_resync_between_units():
    frames = make_frames(2)
    enc = _enc()
    enc.push_frame(frames[0])
    u1 = enc.pull()
    enc.push_frame(frames[1])
    u2 = enc.pull()
    # broken chain: garbage between pictures forces marker resync
    stream = u1 + b"\xde\xad\xbe\xef" * 3 + u2 + enc.end_of_stream()
    out = Decoder().decode_stream(stream)
    assert len(out) >= 1


def test_truncated_stream_tolerated():
    frames = make_frames(2)
    stream = _enc().encode_stream(frames)
    out = Decoder().decode_stream(stream[: len(stream) * 2 // 3])
    assert len(out) >= 1  # at least the first picture survives
