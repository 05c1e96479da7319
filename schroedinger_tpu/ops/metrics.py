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


def _gauss_kernel(sigma: float):
    import numpy as _np
    r = max(1, int(3.0 * sigma + 0.5))
    x = _np.arange(-r, r + 1, dtype=_np.float32)
    k = _np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum())


def _gauss_lowpass(img, sigma: float):
    """Separable Gaussian lowpass with edge-replicated padding
    (schro_frame_filter_lowpass2 analog, schrofilter.c)."""
    k = _gauss_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                 in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


def ssim_frame(a, b, c1: float = (0.01 * 255) ** 2,
               c2: float = (0.03 * 255) ** 2):
    """Per-pixel mean SSIM over the luma plane via the reference's
    multiply/lowpass formulation (schro_frame_ssim, schrossim.c:65-123):
    mu = Gaussian lowpass (sigma = width/256 * 1.5), variances/covariance
    = lowpass of the hipass products, SSIM averaged over every pixel."""
    x = a.astype(jnp.float32)
    y = b.astype(jnp.float32)
    sigma = (x.shape[1] / 256.0) * 1.5  # SSIM_SIGMA, schrossim.c:61
    mx = _gauss_lowpass(x, sigma)
    my = _gauss_lowpass(y, sigma)
    hx = x - mx
    hy = y - my
    vx = _gauss_lowpass(hx * hx, sigma)
    vy = _gauss_lowpass(hy * hy, sigma)
    cov = _gauss_lowpass(hx * hy, sigma)
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2))
    return jnp.mean(s)


def ssim(a, b, c1: float = (0.01 * 255) ** 2, c2: float = (0.03 * 255) ** 2):
    """Mean SSIM with an 8x8 box window (fast form; ssim_frame is the
    schrossim.c analog used by enable_ssim)."""
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
