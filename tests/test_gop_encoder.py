"""Long-GOP encoder validation: our P-picture streams must decode identically
in the reference decoder and our decoder, with sane quality."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80


def make_frames(n=5, seed=21):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0))
    noise = rng.normal(0, 4, (H, W))
    out = []
    for i in range(n):
        y = np.roll(base, (i * 2, i * 3), axis=(0, 1)) + noise
        u = 128 + 25 * np.cos((xx[::2, ::2] + 4 * i) / 9.0)
        v = 128 + 25 * np.sin((yy[::2, ::2] + 3 * i) / 11.0)
        out.append((y.clip(0, 255).astype(np.uint8),
                    u.clip(0, 255).astype(np.uint8),
                    v.clip(0, 255).astype(np.uint8)))
    return out


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_gop_stream_decodes_in_reference_decoder():
    frames = make_frames()
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16)
    stream = enc.encode_stream(frames)

    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(ref) >= len(frames) - 1
    for n, (g3, r3) in enumerate(zip(mine, ref)):
        for g, r, name in zip(g3, r3, "yuv"):
            np.testing.assert_array_equal(
                g, r, err_msg=f"frame {n} plane {name} (ref decoder disagrees)")

    # quality sanity: every frame should be reasonably close to the input
    for n, (g3, orig) in enumerate(zip(mine, frames)):
        p = psnr(g3[0], orig[0])
        assert p > 30, f"frame {n} luma PSNR {p:.1f} too low"


def test_md5_auxiliary_data():
    frames = make_frames(3)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16, enable_md5=True)
    stream = enc.encode_stream(frames)
    dec = StreamDecoder()
    out = dec.decode_stream(stream)
    assert len(out) == len(frames)
    assert dec.md5_failures == []
    # corrupt one byte of the last picture payload: MD5 must catch it
    bad = bytearray(stream)
    bad[-30] ^= 0x40
    dec2 = StreamDecoder()
    try:
        dec2.decode_stream(bytes(bad))
    except Exception:
        pass
    else:
        assert dec2.md5_failures, "corruption not detected"


@pytest.mark.parametrize("prec", [1, 2, 3])
def test_gop_subpel(prec):
    frames = make_frames(3)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16,
                     mv_precision=prec)
    stream = enc.encode_stream(frames)
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(ref) >= len(frames) - 1
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)
    for n, (g3, orig) in enumerate(zip(mine, frames)):
        p = psnr(g3[0], orig[0])
        assert p > 30, f"frame {n} PSNR {p:.1f}"


def test_scene_change_forces_intra():
    rng = np.random.default_rng(0)
    frames = make_frames(3)
    # scene cut at frame 2: completely different content
    cut = (rng.integers(0, 255, frames[0][0].shape).astype(np.uint8),
           rng.integers(0, 255, frames[0][1].shape).astype(np.uint8),
           rng.integers(0, 255, frames[0][2].shape).astype(np.uint8))
    seq = [frames[0], frames[1], cut]
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16,
                     enable_scene_change=True)
    enc.encode_stream(seq)
    kinds = [f["intra"] for f in enc.stats.frames]
    assert kinds[0] is True
    assert kinds[2] is True, "scene cut frame should be coded intra"


def test_bframes_roundtrip():
    frames = make_frames(7)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16,
                     gop_structure="biref", subgroup_length=3,
                     enable_scene_change=False)
    stream = enc.encode_stream(frames)
    # stream must contain 2-ref pictures
    from schroedinger_tpu import bitstream as bs2
    codes = [c for c, _ in bs2.split_units(stream) if bs2.is_picture(c)]
    assert any(bs2.num_refs(c) == 2 for c in codes), codes

    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == len(frames)
    # the ctypes oracle wrapper can leave reordered frames undrained at EOS
    assert len(ref) >= len(frames) - 3
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)
    for n, (g3, orig) in enumerate(zip(mine, frames)):
        p = psnr(g3[0], orig[0])
        assert p > 30, f"frame {n} PSNR {p:.1f}"


def test_pipelined_encode_stream_matches_serial():
    """GopEncoder.encode_stream (device/host overlap) must produce the
    byte-identical stream to the frame-by-frame path."""
    frames = make_frames(7)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    from schroedinger_tpu import bitstream as bs
    e1 = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16, gop_length=4)
    serial = bytearray()
    for f in frames:
        serial += e1.encode_frame(f)
    serial += e1._chain.add([bs.make_eos_unit()], final_eos=True)
    e2 = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16, gop_length=4)
    piped = e2.encode_stream(frames)
    assert bytes(serial) == bytes(piped)

    ref = so.decode(bytes(piped), W, H)
    assert len(ref) == len(frames)


def test_inter_noarith_roundtrip():
    """VLC (no-arith) residual + MV coding for INTER pictures: the
    reference core supports it for every picture type
    (schroencoder.c:4073+); its settings never select it for long GOPs,
    so this is driven directly.  Both decoders must agree bit-exactly."""
    frames = make_frames(5)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16,
                     gop_length=8, enable_noarith=True,
                     enable_scene_change=False)
    stream = enc.encode_stream(frames)
    from schroedinger_tpu import bitstream as bs2
    codes = [c for c, _ in bs2.split_units(stream) if bs2.is_picture(c)]
    assert any((c & 0x40) and (c & 3) for c in codes), \
        "no noarith inter picture in stream"
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == len(frames)
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)
