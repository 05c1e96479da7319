"""CBR rate control: streams must hit the requested bitrate within tolerance
and still decode exactly in the reference decoder."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from tests.test_gop_encoder import make_frames, W, H


def test_cbr_hits_bitrate():
    frames = make_frames(8)
    fps = 25
    bitrate = 1_500_000
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=fps, frame_rate_denominator=1)
    enc = GopEncoder(vf, gop_length=8, bitrate=bitrate, fps=fps)
    stream = enc.encode_stream(frames)

    # true CBR holds the stream AT the bitrate: on easy content the TM5
    # quality undershoots and the reservoir-overrun PADDING units make up
    # the difference, exactly like the reference's CBR mode (oracle
    # rate_control=1 spends ~1.56 Mbps here; schroencoder.c:2601-2611)
    achieved = len(stream) * 8 * fps / len(frames)
    ref_stream = so.encode(frames, W, H, settings={
        "rate_control": 1, "bitrate": bitrate, "au_distance": 8,
        "gop_structure": 2})
    ref_achieved = len(ref_stream) * 8 * fps / len(frames)
    assert achieved < 1.2 * bitrate, achieved
    assert achieved > 0.7 * bitrate, achieved
    assert abs(achieved - ref_achieved) < 0.35 * bitrate, (achieved,
                                                           ref_achieved)

    # conformance: reference decoder agrees with ours
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)

    # per-(component, band) arith-correction tables learned something:
    # the EMA must move at least some inter bands away from init 1.0
    # (the arith coder codes sparse bands far below the sint estimate),
    # and every ratio must stay positive and finite
    corr = enc.acorr.inter
    assert np.all(np.isfinite(corr)) and np.all(corr > 0)
    assert np.any(np.abs(corr - 1.0) > 0.02), corr
    assert np.all(np.isfinite(enc.acorr.intra))


def test_arith_correction_ema():
    from schroedinger_tpu.encoder.ratecontrol import ArithCorrection
    ac = ArithCorrection(6)
    est = np.full(6, 1000.0)
    act = np.asarray([500.0, 1000, 2000, 100, 0, 1500])
    ac.update(False, act, est)
    np.testing.assert_allclose(
        ac.inter, [0.95, 1.0, 1.1, 0.91, 0.9, 1.05])
    # guarded: est <= 200 entries never update (schroencoder.c:2558)
    ac2 = ArithCorrection(2)
    ac2.update(True, [999.0, 999.0], [150.0, 201.0])
    np.testing.assert_allclose(ac2.intra[0], 1.0)
    assert ac2.intra[1] != 1.0
    assert np.all(ac2.inter == 1.0)
