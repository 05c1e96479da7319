"""End-to-end VC-2 low-delay tests vs the reference oracle.

The oracle encodes with rate-control=low_delay; we parse its stream to get the
exact coding params, re-encode the same frames with our encoder, and require
byte-identical picture payloads. Decode side: our decoder must reproduce the
oracle decoder's output exactly.
"""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.decoder import lowdelay as lod
from schroedinger_tpu.encoder import lowdelay as loe
from schroedinger_tpu.params import Params

W, H = 352, 288


def make_frames(n=2, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        # smooth-ish pattern + noise: realistic coefficient statistics
        yy, xx = np.mgrid[0:H, 0:W]
        y = (128 + 64 * np.sin(xx / 20 + i) * np.cos(yy / 15)
             + rng.normal(0, 8, (H, W))).clip(0, 255).astype(np.uint8)
        u = (128 + 32 * np.cos(xx[::2, ::2] / 25)).clip(0, 255).astype(np.uint8)
        v = (128 + 32 * np.sin(yy[::2, ::2] / 25 + i)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.fixture(scope="module")
def oracle_stream():
    frames = make_frames()
    stream = so.encode(frames, W, H, settings={
        "rate_control": 2,       # low delay
        "bitrate": 30_000_000,
        "transform_depth": 4,
        "intra_wavelet": 1,      # LeGall 5,3
    })
    return frames, stream


def parse_picture_params(stream):
    """Extract video format + per-picture Params + payloads from a stream."""
    units = bs.split_units(stream)
    vf = None
    pics = []
    for code, payload in units:
        if code == bs.SEQUENCE_HEADER:
            vf = bs.read_sequence_header(BitReader(payload)).video_format
        elif bs.is_picture(code):
            r = BitReader(payload)
            frame_number = r.read_bits(32)
            if bs.is_reference(code):
                r.read_sint()  # retired
            r.sync()
            p = Params(video_format=vf, is_lowdelay=bs.is_lowdelay(code),
                       num_refs=bs.num_refs(code))
            bs.read_transform_parameters(r, p)
            r.sync()
            rest = payload[r.bits_read // 8:]
            pics.append((frame_number, p, rest, payload))
    return vf, pics


def test_encoder_byte_exact(oracle_stream):
    frames, stream = oracle_stream
    vf, pics = parse_picture_params(stream)
    assert len(pics) == len(frames)
    for (frame_number, p, payload_rest, ref_payload), planes in zip(pics, frames):
        unit = loe.encode_picture(planes, p, frame_number)
        # compare everything after the 13-byte parse info
        got = unit[13:]
        assert got == ref_payload, (
            f"frame {frame_number}: first mismatch at "
            f"{next(i for i, (a, b) in enumerate(zip(got, ref_payload)) if a != b)}"
            f" of {len(ref_payload)}")


def test_decoder_matches_oracle_decoder(oracle_stream):
    frames, stream = oracle_stream
    vf, pics = parse_picture_params(stream)
    ref_frames = so.decode(stream, W, H)
    assert len(ref_frames) == len(frames)
    for (frame_number, p, payload_rest, _), ref in zip(pics, ref_frames):
        got = lod.decode_picture(payload_rest, p)
        for g, r, name in zip(got, ref, "yuv"):
            np.testing.assert_array_equal(g, r, err_msg=f"frame {frame_number} {name}")


def test_full_stream_roundtrip_through_reference_decoder(oracle_stream):
    """Our own full stream (seq headers + pictures + EOS) must decode in the
    reference decoder to the same planes as our decoder produces."""
    frames, stream = oracle_stream
    vf, pics = parse_picture_params(stream)
    units = []
    for (frame_number, p, _, _), planes in zip(pics, frames):
        units.append(bs.write_sequence_header(vf, profile=0, level=1))
        units.append(loe.encode_picture(planes, p, frame_number))
    units.append(bs.make_eos_unit())
    my_stream = bs.fixup_offsets(units)

    ref_decoded = so.decode(my_stream, W, H)
    assert len(ref_decoded) == len(frames)
    for (frame_number, p, payload_rest, _), ref in zip(pics, ref_decoded):
        got = lod.decode_picture(payload_rest, p)
        for g, r, name in zip(got, ref, "yuv"):
            np.testing.assert_array_equal(g, r, err_msg=f"frame {frame_number} {name}")
