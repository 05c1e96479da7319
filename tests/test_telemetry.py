"""Observability subsystem: leveled logging, schro_dump topics, stage
timers, and the decoder telemetry overlay (schrodebug.h:24-75,
schrodecoder.c:107 analogs)."""
import os

import numpy as np

from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.utils import log
from schroedinger_tpu.utils import telemetry as tm
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80


def make_frames(n=4, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
    noise = rng.normal(0, 4, (H, W))
    out = []
    for i in range(n):
        y = np.roll(base, i * 2, axis=1) + noise
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = np.full((H // 2, W // 2), 90, np.uint8)
        out.append((y.clip(0, 255).astype(np.uint8), u, v))
    return out


def _vf():
    return VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                       chroma_format=ChromaFormat.C420,
                       frame_rate_numerator=25, frame_rate_denominator=1)


def test_log_levels_and_handler():
    seen = []
    log.set_log_handler(lambda lvl, tag, msg: seen.append((lvl, tag, msg)))
    old = log.get_level()
    try:
        log.set_level(log.WARNING)
        log.error("t", "boom %d", 1)
        log.warning("t", "warn")
        log.info("t", "hidden")
        log.debug("t", "hidden")
        assert seen == [(log.ERROR, "t", "boom 1"), (log.WARNING, "t", "warn")]
        log.set_level(log.DEBUG)
        log.debug("t", "now visible")
        assert seen[-1] == (log.DEBUG, "t", "now visible")
    finally:
        log.set_log_handler(None)
        log.set_level(old)


def test_dump_topics_write_per_topic_files(tmp_path, monkeypatch):
    monkeypatch.setenv("SCHRO_TPU_DUMP", "picture,lambda_curve")
    monkeypatch.setenv("SCHRO_TPU_DUMP_DIR", str(tmp_path))
    tm.reset_dumps()
    try:
        tm.dump("picture", "frame %d bits %d", 3, 1000)
        tm.dump("lambda_curve", "qi %s", "10 11 12")
        tm.dump("psnr", "should not appear")  # topic not enabled
        pic = (tmp_path / "schro_tpu_dump_picture.log").read_text()
        lam = (tmp_path / "schro_tpu_dump_lambda_curve.log").read_text()
        assert pic == "frame 3 bits 1000\n"
        assert lam == "qi 10 11 12\n"
        assert not (tmp_path / "schro_tpu_dump_psnr.log").exists()
    finally:
        tm.reset_dumps()


def test_framestats_feeds_dump_topics(tmp_path, monkeypatch):
    monkeypatch.setenv("SCHRO_TPU_DUMP", "all")
    monkeypatch.setenv("SCHRO_TPU_DUMP_DIR", str(tmp_path))
    monkeypatch.setenv("SCHRO_TPU_DUMP_PATH",
                       str(tmp_path / "stats.jsonl"))
    tm.reset_dumps()
    try:
        fs = tm.FrameStats()
        fs.record(frame=0, bits=4000, psnr=41.2, sc_score=0.5)
        assert "psnr" in (tmp_path / "schro_tpu_dump_picture.log").read_text()
        assert "41.2" in (tmp_path / "schro_tpu_dump_psnr.log").read_text()
        assert "sc_score" in \
            (tmp_path / "schro_tpu_dump_scene_change.log").read_text()
    finally:
        tm.reset_dumps()


def test_timers_accumulate():
    t = tm.Timers()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    assert t.counts == {"a": 2, "b": 1}
    assert t.totals["a"] >= 0.0 and "a=" in t.report()


def test_encode_populates_stage_timers():
    tm.timers.reset()
    enc = GopEncoder(_vf(), base_qi_intra=12, base_qi_inter=16, gop_length=4)
    enc.encode_stream(make_frames(4))
    assert tm.timers.counts.get("p_transfer", 0) >= 3
    assert tm.timers.counts.get("p_entropy", 0) >= 3


def test_decoder_telemetry_overlay():
    frames = make_frames(4)
    enc = GopEncoder(_vf(), base_qi_intra=12, base_qi_inter=16, gop_length=4)
    stream = enc.encode_stream(frames)

    clean = StreamDecoder(telemetry=False).decode_stream(stream)
    overlaid_dec = StreamDecoder(telemetry=True)
    shown = overlaid_dec.decode_stream(stream)

    assert len(clean) == len(shown) == 4
    # intra picture: no motion, untouched
    assert np.array_equal(clean[0][0], shown[0][0])
    for i in range(1, 4):
        # inter pictures: Y gets the grid/needles, chroma untouched
        assert not np.array_equal(clean[i][0], shown[i][0])
        assert np.array_equal(clean[i][1], shown[i][1])
        assert np.array_equal(clean[i][2], shown[i][2])
        # overlay only annotates; most pixels identical (refs pristine,
        # so the underlying decode cannot have drifted)
        frac_diff = np.mean(clean[i][0] != shown[i][0])
        assert 0 < frac_diff < 0.5
    assert overlaid_dec.errors == []


def test_overlay_keeps_md5_verification_green():
    frames = make_frames(4)
    enc = GopEncoder(_vf(), base_qi_intra=12, base_qi_inter=16,
                     gop_length=4, enable_md5=True)
    stream = enc.encode_stream(frames)
    dec = StreamDecoder(telemetry=True)
    dec.decode_stream(stream)
    assert dec.md5_failures == []
    assert dec.errors == []
