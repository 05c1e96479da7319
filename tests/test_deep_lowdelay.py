"""10/16-bit (S32) VC-2 low-delay slices.

The reference's deep conventions (carried over here):
- samples are NEVER recentred on the deep path — S16 input plain-widens
  to S32 internal frames (orc_convert_s32_s16, schroorc.orc:479-487);
  only the 8-bit path subtracts 128.
- the DECODER has a correct s32 slice path
  (schro_decoder_decode_slice_slow_s32, schrolowdelay.c:191-260) — that
  is the conformance anchor for our deep encoder: our streams must
  decode in the reference decoder bit-identically to our own decoder.

Two reference-side bugs rule out the other comparisons:
- the reference's deep lowdelay ENCODER quantises its S32 iwt frame
  through int16_t line pointers (quantise_block, schrolowdelay.c:855-871
  has no s32 variant), producing self-consistent garbage (and asserting
  outright at higher bitrates), so encoder byte-parity is meaningless;
- its deep S16 *output* path computes a negative shift
  (schrodecoder.c:2013-2019, bit_depth 10 - 16) and feeds it to
  schro_frame_shift_right — UB that zeroes the output — so comparisons
  run through the U8 output (a well-defined (v+2)>>2 then +128 clamp).
"""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.coding.bitio import BitReader
from schroedinger_tpu.decoder import lowdelay as lod
from schroedinger_tpu.encoder import lowdelay as loe
from schroedinger_tpu.params import Params
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from schroedinger_tpu.wavelets import Wavelet

W, H = 192, 160


def make_frames(bit_depth, n=2, seed=0):
    rng = np.random.default_rng(seed)
    maxv = (1 << bit_depth) - 1
    mid = 1 << (bit_depth - 1)
    amp = mid // 2
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:H, 0:W]
        y = (mid + amp * np.sin(xx / 20 + i) * np.cos(yy / 15)
             + rng.normal(0, maxv / 60, (H, W))).clip(0, maxv)
        u = (mid + amp // 2 * np.cos(xx[::2, ::2] / 25)).clip(0, maxv)
        v = (mid + amp // 2 * np.sin(yy[::2, ::2] / 25 + i)).clip(0, maxv)
        frames.append(tuple(p.astype(np.uint16) for p in (y, u, v)))
    return frames


def deep_vf(bit_depth):
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     luma_offset=0, luma_excursion=(1 << bit_depth) - 1,
                     chroma_offset=1 << (bit_depth - 1),
                     chroma_excursion=(1 << bit_depth) - 1)
    assert vf.bit_depth == bit_depth
    return vf


def deep_params(vf, slice_bytes=640):
    p = Params(video_format=vf, is_lowdelay=True, num_refs=0,
               wavelet_filter_index=Wavelet.LE_GALL_5_3, transform_depth=3)
    p.n_horiz_slices = p.iwt_chroma_width >> p.transform_depth
    p.n_vert_slices = p.iwt_chroma_height >> p.transform_depth
    p.slice_bytes_num = slice_bytes
    p.slice_bytes_denom = 1
    p.set_default_quant_matrix()
    return p


def to_u8_like_reference(plane_u16, bit_depth):
    """The reference decoder's deep->U8 output: rounding shift to 8 bits
    (schro_frame_shift_right) then +128 clamp (orc_offsetconvert_u8_s32)."""
    shift = bit_depth - 8
    v = (plane_u16.astype(np.int64) + ((1 << shift) >> 1)) >> shift
    return np.clip(v + 128, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("bit_depth", [10, 12])
def test_deep_lowdelay_reference_decoder_conformance(bit_depth):
    """Our deep lowdelay stream decodes in the REFERENCE decoder (s32
    slice path) to exactly our decoder's output (via the U8 transform)."""
    frames = make_frames(bit_depth)
    vf = deep_vf(bit_depth)
    p = deep_params(vf)
    units = []
    for i, planes in enumerate(frames):
        units.append(bs.write_sequence_header(vf, profile=0, level=1))
        units.append(loe.encode_picture(planes, p, i))
    units.append(bs.make_eos_unit())
    stream = bs.fixup_offsets(units)

    ref_u8 = so.decode(stream, W, H)
    assert len(ref_u8) == len(frames)

    for n, (planes, ref) in enumerate(zip(frames, ref_u8)):
        unit = [u for u in units if len(u) > 100][n]
        r = BitReader(unit[13:])
        r.read_bits(32)
        r.sync()
        p2 = Params(video_format=vf, is_lowdelay=True, num_refs=0)
        bs.read_transform_parameters(r, p2)
        r.sync()
        got = lod.decode_picture(unit[13 + r.bits_read // 8:], p2)
        assert got[0].dtype == np.uint16
        for g, rf, name in zip(got, ref, "yuv"):
            np.testing.assert_array_equal(
                to_u8_like_reference(g, bit_depth), rf,
                err_msg=f"frame {n} plane {name}")
        # quality sanity at ~2.7 bpp: catches any recentring bug (a
        # wrong offset would shift everything by 1 << (bit_depth - 1))
        err = np.abs(got[0].astype(np.int64) - planes[0].astype(np.int64))
        assert float(err.mean()) < (1 << bit_depth) / 64


def test_deep_intra_lossless_roundtrip_no_recentre():
    """Deep main-intra lossless: encode->decode is exact and the wire
    carries unrecentred (offset-binary) coefficients."""
    from schroedinger_tpu.decoder import intra as di
    from schroedinger_tpu.encoder import intra as ei

    bit_depth = 10
    frames = make_frames(bit_depth, n=1)
    vf = deep_vf(bit_depth)
    p = Params(video_format=vf, num_refs=0, transform_depth=3,
               wavelet_filter_index=Wavelet.HAAR_0)
    p.set_default_codeblocks()
    unit = ei.encode_picture(frames[0], p, 0, quant_indices=None)
    r = BitReader(unit[13:])
    r.read_bits(32)
    r.sync()
    p2 = Params(video_format=vf, num_refs=0)
    bs.read_transform_parameters(r, p2)
    r.sync()
    got = di.decode_picture(unit[13 + r.bits_read // 8:], p2)
    for g, orig, name in zip(got, frames[0], "yuv"):
        np.testing.assert_array_equal(g, orig, err_msg=name)
