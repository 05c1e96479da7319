"""Y4M pipe frontend: header parse, lazy round-trip, CLI pipe encode/decode."""
import io
import subprocess
import sys

import numpy as np
import pytest

from schroedinger_tpu import y4m
from schroedinger_tpu.video_format import ChromaFormat


def _mkframes(n, w, h):
    rng = np.random.default_rng(5)
    return [(rng.integers(0, 255, (h, w)).astype(np.uint8),
             rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8),
             rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def test_y4m_roundtrip_420():
    frames = _mkframes(3, 64, 48)
    buf = io.BytesIO()
    from schroedinger_tpu.video_format import VideoFormat
    vf = VideoFormat(width=64, height=48, clean_width=64, clean_height=48,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=30, frame_rate_denominator=1)
    w = y4m.Y4MWriter(buf, vf)
    assert w.write_frames(frames) == 3
    buf.seek(0)
    vf2, it, depth = y4m.read_y4m(buf)
    assert (vf2.width, vf2.height) == (64, 48)
    assert vf2.frame_rate_numerator == 30 and depth == 8
    out = list(it)
    assert len(out) == 3
    for a, b in zip(frames, out):
        for pa, pb in zip(a, b):
            assert np.array_equal(pa, pb)


def test_y4m_header_variants():
    h = y4m.parse_header(b"YUV4MPEG2 W352 H288 F30000:1001 It A4:3 C422\n")
    assert h.chroma == ChromaFormat.C422 and h.interlace == "t"
    vf = h.video_format()
    assert vf.interlaced and vf.top_field_first
    h10 = y4m.parse_header(b"YUV4MPEG2 W64 H48 F25:1 C420p10\n")
    assert h10.bit_depth == 10
    assert h10.video_format().luma_excursion == 876
    with pytest.raises(ValueError):
        y4m.parse_header(b"JUNK\n")
    with pytest.raises(ValueError):
        y4m.parse_header(b"YUV4MPEG2 W64 H48 C411\n")


def test_y4m_truncated_tail_stops_cleanly():
    frames = _mkframes(2, 32, 32)
    buf = io.BytesIO()
    from schroedinger_tpu.video_format import VideoFormat
    vf = VideoFormat(width=32, height=32, clean_width=32, clean_height=32,
                     chroma_format=ChromaFormat.C420)
    w = y4m.Y4MWriter(buf, vf)
    w.write_frames(frames)
    data = buf.getvalue()[:-100]  # cut mid-frame
    out = list(y4m.Y4MReader(io.BytesIO(data)).read_frames())
    assert len(out) == 1


def test_cli_pipe_encode_decode(tmp_path):
    """ffmpeg-pipe style: y4m on stdin -> drc -> y4m out, PSNR sane."""
    w, h = 96, 80
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0))
    frames = []
    for i in range(4):
        frames.append(((np.roll(base, i * 2, axis=1)).clip(0, 255)
                       .astype(np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8),
                       np.full((h // 2, w // 2), 90, np.uint8)))
    buf = io.BytesIO()
    from schroedinger_tpu.video_format import VideoFormat
    vf = VideoFormat(width=w, height=h, clean_width=w, clean_height=h,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    wr = y4m.Y4MWriter(buf, vf)
    wr.write_frames(frames)

    import os
    drc = tmp_path / "out.drc"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "tools/schro_tpu.py", "encode", "-", str(drc),
         "--profile", "longgop", "--qi", "12"],
        input=buf.getvalue(), env=env, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()
    assert drc.read_bytes()[:4] == b"BBCD"

    r2 = subprocess.run(
        [sys.executable, "tools/schro_tpu.py", "decode", str(drc), "-"],
        env=env, capture_output=True, timeout=600)
    assert r2.returncode == 0, r2.stderr.decode()
    vf3, it, _ = y4m.read_y4m(io.BytesIO(r2.stdout))
    out = list(it)
    assert len(out) == 4
    mse = np.mean((out[0][0].astype(np.float64)
                   - frames[0][0].astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 30


def test_cli_set_bridge(tmp_path):
    """--set bridges every registry setting into the encoder (the
    GStreamer-element property equivalent, gstschroenc.c:172-210)."""
    import os
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    r = subprocess.run(
        [sys.executable, "tools/schro_tpu.py", "list-settings"],
        env=env, capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    lines = r.stdout.decode().strip().splitlines()
    assert len(lines) == 71
    assert lines[0].startswith("rate_control")

    w, h = 96, 80
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0))
    frames = [((np.roll(base, i, axis=1)).clip(0, 255).astype(np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8),
               np.full((h // 2, w // 2), 90, np.uint8)) for i in range(3)]
    buf = io.BytesIO()
    from schroedinger_tpu.video_format import VideoFormat
    vf = VideoFormat(width=w, height=h, clean_width=w, clean_height=h,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    wr = y4m.Y4MWriter(buf, vf)
    wr.write_frames(frames)
    drc = tmp_path / "out.drc"
    r = subprocess.run(
        [sys.executable, "tools/schro_tpu.py", "encode", "-", str(drc),
         "--profile", "longgop",
         "--set", "rate_control=constant_bitrate",
         "--set", "bitrate=800000",
         "--set", "enable_md5=true",
         "--set", "mv_precision=2",
         "--set", "magic_keyframe_weight=9"],
        input=buf.getvalue(), env=env, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()
    stream = drc.read_bytes()
    assert stream[:4] == b"BBCD"
    # enable_md5 produced MD5 auxiliary units (payload tag 3)
    from schroedinger_tpu import bitstream as bs
    tags = [payload[0] for code, payload in bs.split_units(stream)
            if code == bs.AUXILIARY_DATA and payload]
    assert 3 in tags

    # unknown setting is a clean CLI error
    r2 = subprocess.run(
        [sys.executable, "tools/schro_tpu.py", "encode", "-", str(drc),
         "--set", "not_a_setting=1"],
        input=buf.getvalue(), env=env, capture_output=True, timeout=120)
    assert r2.returncode != 0
    assert b"unknown setting" in r2.stderr
