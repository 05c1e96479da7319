"""Dirac intra (main-intra profile, lossless) differential tests vs oracle."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.decoder import intra as di
from schroedinger_tpu.encoder import intra as ei
from schroedinger_tpu.params import Params
from schroedinger_tpu.wavelets import Wavelet

W, H = 96, 80


def make_frames(n=2, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n):
        y = (128 + 50 * np.sin(xx / 9.0 + i) + rng.normal(0, 10, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 20 * np.cos(yy[::2, ::2] / 7.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 20 * np.sin(xx[::2, ::2] / 8.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.fixture(scope="module")
def oracle_stream():
    frames = make_frames()
    stream = so.encode(frames, W, H, settings={
        "force_profile": 3,   # vc2_main (intra, arith)
        "rate_control": 3,    # lossless
    })
    return frames, stream


def parse_pics(stream):
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
                r.read_sint()
            r.sync()
            p = Params(video_format=vf, is_lowdelay=bs.is_lowdelay(code),
                       num_refs=bs.num_refs(code),
                       is_noarith=not bs.using_ac(code))
            bs.read_transform_parameters(r, p)
            r.sync()
            pics.append((code, frame_number, p, payload[r.bits_read // 8:],
                         payload))
    return vf, pics


def test_intra_encoder_byte_exact(oracle_stream):
    frames, stream = oracle_stream
    vf, pics = parse_pics(stream)
    assert len(pics) == len(frames)
    for (code, frame_number, p, rest, ref_payload), planes in zip(pics, frames):
        assert not p.is_lowdelay and not p.is_noarith
        unit = ei.encode_picture(planes, p, frame_number,
                                 quant_indices=None,
                                 is_ref=bs.is_reference(code))
        got = unit[13:]
        assert len(got) == len(ref_payload), (len(got), len(ref_payload))
        assert got == ref_payload, (
            f"frame {frame_number}: mismatch at byte "
            f"{next(i for i, (a, b) in enumerate(zip(got, ref_payload)) if a != b)}")


def test_intra_decoder_matches_oracle(oracle_stream):
    frames, stream = oracle_stream
    vf, pics = parse_pics(stream)
    ref_frames = so.decode(stream, W, H)
    for (code, frame_number, p, rest, _), ref in zip(pics, ref_frames):
        got = di.decode_picture(rest, p)
        for g, r, name in zip(got, ref, "yuv"):
            np.testing.assert_array_equal(g, r, err_msg=f"frame {frame_number} {name}")
        # lossless: decoded output must equal the input exactly
    for (code, frame_number, p, rest, _), planes in zip(pics, frames):
        got = di.decode_picture(rest, p)
        for g, orig, name in zip(got, planes, "yuv"):
            np.testing.assert_array_equal(g, orig,
                                          err_msg=f"lossless {frame_number} {name}")


def test_noarith_intra_roundtrip():
    """VC-2 simple profile (no-arith) encode: our decoder and the reference
    decoder must both reconstruct it identically."""
    from schroedinger_tpu.params import Params as P2
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    from schroedinger_tpu.wavelets import Wavelet
    from schroedinger_tpu.decoder.core import StreamDecoder

    frames = make_frames(1)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    p = P2(video_format=vf, num_refs=0, is_noarith=True, transform_depth=3,
           wavelet_filter_index=Wavelet.LE_GALL_5_3)
    p.set_default_codeblocks()
    # no-arith streams avoid the reference's quant-offset ambiguity
    # (schro_decoder_test_quant_offset_compat) by not using per-codeblock
    # quant offsets at all
    p.codeblock_mode_index = 0
    unit = ei.encode_picture(frames[0], p, 0, quant_indices=8, is_ref=False)
    units = [bs.write_sequence_header(vf, profile=1, level=0), unit,
             bs.make_eos_unit()]
    stream = bs.fixup_offsets(units)

    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == 1 and len(ref) >= 1
    for g, r in zip(mine[0], ref[0]):
        np.testing.assert_array_equal(g, r)
