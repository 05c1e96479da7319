"""Tworef/BBBP GOP engine: subgroups of B pictures referencing the next
I/P forward (schroengine.c:685-796 handle_gop_tworef, :247-304 code_BBBP).
Streams must decode byte-identically in the reference decoder, across AU
boundaries (open GOP: B's reference the new I), scene cuts, lagged
retirement, and the long-term second reference for 2-ref P pictures."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.bitstream import (is_picture, is_reference, num_refs,
                                        split_units)
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80


def make_frames(n, seed=21, cut_at=None):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        if cut_at is not None and i >= cut_at:
            base = 100 + 80 * np.cos(xx / 4.0 + 1) * np.sin(yy / 9.0)
            y = np.roll(base, (-i, i * 2), axis=(0, 1))
        else:
            base = 128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
            y = np.roll(base, (i * 2, i * 3), axis=(0, 1))
        y = y + rng.normal(0, 3, (H, W))
        u = 128 + 25 * np.cos((xx[::2, ::2] + 4 * i) / 9.0)
        v = 128 + 25 * np.sin((yy[::2, ::2] + 3 * i) / 11.0)
        out.append((y.clip(0, 255).astype(np.uint8),
                    u.clip(0, 255).astype(np.uint8),
                    v.clip(0, 255).astype(np.uint8)))
    return out


def vfmt():
    return VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                       chroma_format=ChromaFormat.C420,
                       frame_rate_numerator=25, frame_rate_denominator=1)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def check_stream(stream, frames, min_psnr=30.0):
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == len(frames)
    assert len(ref) == len(frames)
    for n, (g3, r3) in enumerate(zip(mine, ref)):
        for g, r, name in zip(g3, r3, "yuv"):
            np.testing.assert_array_equal(
                g, r, err_msg=f"frame {n} plane {name} (ref disagrees)")
    for n, (g3, orig) in enumerate(zip(mine, frames)):
        p = psnr(g3[0], orig[0])
        assert p > min_psnr, f"frame {n} luma PSNR {p:.1f} too low"
    return mine


def picture_kinds(stream):
    """Coded-order (picture_number, num_refs, is_ref) from parse codes."""
    kinds = []
    for code, payload in split_units(stream):
        if not is_picture(code):
            continue
        num = int.from_bytes(payload[:4], "big")
        kinds.append((num, num_refs(code), is_reference(code)))
    return kinds


def test_biref_structure_and_oracle_exact():
    frames = make_frames(9)
    enc = GopEncoder(vfmt(), base_qi_intra=12, base_qi_inter=16,
                     gop_structure="biref", subgroup_length=3)
    stream = enc.encode_stream(frames)
    check_stream(stream, frames)
    kinds = picture_kinds(stream)
    nums = [k[0] for k in kinds]
    assert sorted(nums) == list(range(9))
    # coded order: I0, P3, B1, B2, P6, B4, B5, P8, B7
    assert nums == [0, 3, 1, 2, 6, 4, 5, 8, 7]
    by_num = {n: (r, isref) for n, r, isref in kinds}
    assert by_num[0] == (0, True)           # intra ref
    assert by_num[3] == (1, True)           # first P: 1-ref (I0 is ref1
    # candidate only after it survives unexpired past one more subgroup)
    assert by_num[6] == (2, True)           # steady-state 2-ref P
    for b in (1, 2, 4, 5, 7):
        assert by_num[b] == (2, False)      # non-ref 2-ref B


def test_biref_au_boundary_and_scene_cut():
    frames = make_frames(26, cut_at=13)
    enc = GopEncoder(vfmt(), base_qi_intra=12, base_qi_inter=16,
                     gop_length=8, gop_structure="biref", subgroup_length=4,
                     enable_scene_change=True, scene_change_threshold=2.0,
                     mv_precision=2)
    stream = enc.encode_stream(frames)
    check_stream(stream, frames)
    kinds = picture_kinds(stream)
    intras = [n for n, r, _ in kinds if r == 0]
    assert 0 in intras
    assert 8 in intras        # AU at gop_length (open GOP: coded before B's)
    assert 13 in intras       # scene cut
    # open GOP: the AU intra is coded before the B's that precede it in
    # display order, which reference it forward
    nums = [k[0] for k in kinds]
    assert nums.index(8) < nums.index(7)


def test_biref_cbr_and_md5():
    frames = make_frames(16)
    vf = vfmt()
    enc = GopEncoder(vf, gop_length=16, gop_structure="biref",
                     subgroup_length=4, bitrate=400_000, fps=25.0)
    stream = enc.encode_stream(frames)
    mine = check_stream(stream, frames, min_psnr=25.0)
    # TM5 rate control undershoots on easy content (like the reference,
    # which spends ~8KB of this 32KB budget) but must stay under budget
    # and hold stable quality
    target = 400_000 / 8 / 25 * 16
    assert len(stream) < 1.2 * target
    mean = np.mean([psnr(g[0], f[0]) for g, f in zip(mine, frames)])
    assert mean > 32.0

    enc = GopEncoder(vf, base_qi_intra=12, base_qi_inter=16, gop_length=16,
                     gop_structure="biref", subgroup_length=4,
                     enable_md5=True)
    stream = enc.encode_stream(frames)
    dec = StreamDecoder()
    out = dec.decode_stream(stream)
    assert len(out) == 16
    assert dec.md5_failures == []


def test_biref_push_pull_api():
    from schroedinger_tpu.api import Encoder
    from schroedinger_tpu.config import EncoderConfig
    frames = make_frames(7)
    cfg = EncoderConfig(gop_structure="biref")
    cfg.set("quality", 7.0)
    enc = Encoder(vfmt(), cfg)
    out = bytearray()
    for f in frames:
        enc.push_frame(f)
        b = enc.pull()
        if b:
            out += b
    out += enc.end_of_stream()
    check_stream(bytes(out), frames, min_psnr=28.0)


def test_biref_trailing_partial_subgroup():
    # 5 frames, subgroup 4: final drain codes a short P+B tail
    frames = make_frames(5)
    enc = GopEncoder(vfmt(), base_qi_intra=12, base_qi_inter=16,
                     gop_structure="biref", subgroup_length=4)
    stream = enc.encode_stream(frames)
    check_stream(stream, frames)


def test_b_batch_path_equivalence():
    """The vmapped subgroup B-batch (one device program for all Bs of a
    subgroup) must engage for the flagship CBR biref configuration and
    produce a valid stream of comparable rate/quality to the
    per-picture path (bytes differ only through rate-control timing)."""
    import numpy as np
    from oracle import schro_oracle as so
    from schroedinger_tpu.decoder.core import StreamDecoder
    from schroedinger_tpu.encoder import inter as ei_inter

    frames = make_frames(10)
    W, H = frames[0][0].shape[1], frames[0][0].shape[0]

    def enc(batch):
        return GopEncoder(vfmt(), gop_length=8, gop_structure="biref",
                          mv_precision=2, bitrate=500000, fps=25,
                          enable_scene_change=False,
                          enable_b_batch=batch)

    ei_inter._B_BATCH_CACHE.clear()
    st_b = enc(True).encode_stream(frames)
    assert ei_inter._B_BATCH_CACHE, "batched path did not engage"
    st_u = enc(False).encode_stream(frames)

    dec_b = so.decode(st_b, W, H)
    dec_u = so.decode(st_u, W, H)
    assert len(dec_b) >= 9 and len(dec_u) >= 9
    ours_b = StreamDecoder().decode_stream(st_b)
    for a, b in zip(dec_b, ours_b):
        for pa, pb in zip(a, b):
            assert np.array_equal(pa, pb)

    def psnr(dec):
        vals = []
        for g3, o3 in zip(dec, frames):
            mse = np.mean((g3[0].astype(np.float64)
                           - o3[0].astype(np.float64)) ** 2)
            vals.append(99.0 if mse == 0 else
                        10 * np.log10(255.0 ** 2 / mse))
        return float(np.mean(vals))

    pb_, pu_ = psnr(dec_b), psnr(dec_u)
    assert abs(pb_ - pu_) < 0.7, (pb_, pu_)
    assert abs(len(st_b) - len(st_u)) < 0.15 * len(st_u), \
        (len(st_b), len(st_u))
