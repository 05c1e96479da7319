"""Constant-lambda / constant-error quantiser engines (per-subband RDO from
the fused step's exact 61-way stat tables)."""
import numpy as np
import pytest

from schroedinger_tpu.encoder import ratecontrol as rc


def _synthetic_stats(nb=10, seed=0):
    """Monotone-ish per-base tables: bits fall, error rises with base."""
    rng = np.random.default_rng(seed)
    scale = rng.uniform(0.5, 2.0, nb)
    base = np.arange(61, dtype=np.float64)[:, None]
    bits = 1e6 * scale * np.exp(-base / 12.0)
    err = 1e4 * scale * (np.exp(base / 10.0) - 1.0)
    return bits, err


def test_qi_from_lambda_monotone_in_lambda():
    bits, err = _synthetic_stats()
    prev = rc.qi_from_lambda(bits, err, 1e-9)
    for lam in (1e-6, 1e-3, 1e-1, 1e1):
        cur = rc.qi_from_lambda(bits, err, lam)
        assert (cur <= prev).all()      # larger lambda => finer quant
        prev = cur
    assert (rc.qi_from_lambda(bits, err, 1e-12) >= 55).all()
    assert (rc.qi_from_lambda(bits, err, 1e6) == 0).all()


def test_lambda_for_error_hits_target():
    bits, err = _synthetic_stats()
    target = float(err[30].sum())       # achievable mid-range error
    lam = rc.lambda_for_error(bits, err, target)
    qi = rc.qi_from_lambda(bits, err, lam)
    got = float(err[qi, np.arange(len(qi))].sum())
    assert got <= target * 1.3          # bisection keeps error near target
    assert got >= target * 0.2


def _encode(frames, vf, **settings):
    from schroedinger_tpu.api import Encoder
    from schroedinger_tpu.config import EncoderConfig
    cfg = EncoderConfig()
    for k, v in settings.items():
        cfg.set(k, v)
    return Encoder(vf, cfg).encode_stream(frames)


def _frames(W, H, n=4, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 55 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
            + rng.normal(0, 4, (H, W))).clip(0, 255).astype(np.uint8)
    return [(np.roll(base, (2 * i, 3 * i), (0, 1)),
             np.full((H // 2, W // 2), 100, np.uint8),
             np.full((H // 2, W // 2), 150, np.uint8)) for i in range(n)]


def test_constant_error_end_to_end():
    from oracle import schro_oracle as so
    from schroedinger_tpu.decoder.core import StreamDecoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    W, H = 96, 80
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    frames = _frames(W, H)
    sizes = {}
    for nt in (20.0, 40.0):
        st = _encode(frames, vf, rate_control="constant_noise_threshold",
                     noise_threshold=nt)
        mine = StreamDecoder().decode_stream(st)
        ref = so.decode(st, W, H)
        for g3, r3 in zip(mine, ref):
            for g, r in zip(g3, r3):
                np.testing.assert_array_equal(g, r)
        sizes[nt] = len(st)
    # higher threshold = cleaner target = more bits
    assert sizes[40.0] > sizes[20.0]


def test_constant_lambda_end_to_end():
    from oracle import schro_oracle as so
    from schroedinger_tpu.decoder.core import StreamDecoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    W, H = 96, 80
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    frames = _frames(W, H)
    sizes = {}
    for q in (3.0, 8.0):
        st = _encode(frames, vf, rate_control="constant_lambda", quality=q)
        mine = StreamDecoder().decode_stream(st)
        ref = so.decode(st, W, H)
        for g3, r3 in zip(mine, ref):
            for g, r in zip(g3, r3):
                np.testing.assert_array_equal(g, r)
        sizes[q] = len(st)
    # higher quality = larger lambda (distortion weight) = more bits
    assert sizes[8.0] > sizes[3.0]
