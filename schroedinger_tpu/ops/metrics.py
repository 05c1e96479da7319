"""Quality metrics: PSNR, MSE, MSSIM (schrossim.c analog), MD5 checksums."""
from __future__ import annotations

import hashlib

import numpy as np

import jax
import jax.numpy as jnp


def mse(a, b):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(a, b, peak: float = 255.0):
    m = mse(a, b)
    return jnp.where(m == 0, jnp.inf, 10.0 * jnp.log10(peak * peak / m))


def ssim(a, b, c1: float = (0.01 * 255) ** 2, c2: float = (0.03 * 255) ** 2):
    """Mean SSIM with an 8x8 box window (schrossim.c uses a lowpass pyramid;
    this is the standard windowed form — encoder-side metric only)."""
    x = a.astype(jnp.float32)
    y = b.astype(jnp.float32)

    def box(v):
        h, w = v.shape
        h8, w8 = h // 8 * 8, w // 8 * 8
        return v[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).mean(axis=(1, 3))

    mx = box(x)
    my = box(y)
    mxx = box(x * x)
    myy = box(y * y)
    mxy = box(x * y)
    vx = mxx - mx * mx
    vy = myy - my * my
    cov = mxy - mx * my
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2))
    return jnp.mean(s)


def frame_md5(planes) -> bytes:
    """MD5 over the planar frame data, matching schro_frame_md5: each plane's
    rows concatenated in order Y, U, V (width bytes per row)."""
    m = hashlib.md5()
    for p in planes:
        m.update(np.ascontiguousarray(p, dtype=np.uint8).tobytes())
    return m.digest()
