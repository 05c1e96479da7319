"""ssim_frame (schrossim.c analog) sanity + differential vs the oracle.

The oracle uses a forward/backward IIR3 recursive Gaussian
(schrofilter.c:635-689); ours is a FIR Gaussian of the same sigma, so the
comparison carries a small tolerance, not bit-exactness (encoder-side
metric only)."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.ops.metrics import ssim_frame

W, H = 128, 96


def _frame(y):
    u = np.full((H // 2, W // 2), 128, np.uint8)
    v = np.full((H // 2, W // 2), 128, np.uint8)
    return (y.astype(np.uint8), u, v)


def test_ssim_frame_identity_and_monotone():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 255, (H, W)).astype(np.uint8)
    assert float(ssim_frame(y, y)) == pytest.approx(1.0, abs=1e-5)
    y1 = np.clip(y.astype(np.int32)
                 + rng.normal(0, 4, (H, W)).astype(np.int32),
                 0, 255).astype(np.uint8)
    y2 = np.clip(y.astype(np.int32)
                 + rng.normal(0, 16, (H, W)).astype(np.int32),
                 0, 255).astype(np.uint8)
    s1 = float(ssim_frame(y, y1))
    s2 = float(ssim_frame(y, y2))
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_frame_matches_oracle_within_tolerance():
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).clip(0, 255)
    for sd in (3.0, 10.0):
        noisy = np.clip(base + rng.normal(0, sd, (H, W)), 0, 255)
        ours = float(ssim_frame(base.astype(np.uint8),
                                noisy.astype(np.uint8)))
        ref = so.frame_ssim(_frame(base), _frame(noisy))
        assert ours == pytest.approx(ref, abs=0.04), (sd, ours, ref)
