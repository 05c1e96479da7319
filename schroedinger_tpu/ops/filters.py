"""Encoder prefilters (schrofilter.c equivalents) and analysis helpers.

Dispatch mirrors the reference's `filtering` setting
(schroencoder.c:2211-2234): none / center-weighted-median (cwmN) /
gaussian (the IIR3 recursive lowpass, schro_frame_filter_lowpass2) /
add-noise / adaptive_gaussian (schro_frame_filter_adaptive_lowpass:
wavelet-histogram slope chooses sigma) / lowpass (3-tap luma smoother,
schro_frame_filter_lowpass).  These are encoder-side quality tools (not
bitstream-conformance-critical); the recursive Gaussian reuses the
metrics module's reference-exact IIR3 passes.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def gaussian_lowpass(plane, sigma: float, chroma_shift: int = 0):
    """The reference's recursive Gaussian (schro_frame_filter_lowpass2,
    schrofilter.c:635-744): forward+reverse IIR3 per row then per column
    with u8 rounding at every write; chroma planes use sigma scaled by
    the subsampling shift (schrofilter.c:785-800)."""
    from schroedinger_tpu.ops.metrics import _lowpass2

    s = float(sigma) / (1 << chroma_shift)
    if s <= 0.0:
        return plane

    def rnd_u8(v):
        return np.clip(np.rint(v), 0.0, 255.0)

    out = _lowpass2(np.asarray(plane, np.float64), s, rnd_u8)
    return np.asarray(out, np.uint8)


def lowpass3(plane, tap: int):
    """schro_frame_filter_lowpass (schrofilter.c:339-430): separable
    3-tap [tap, 256-2*tap, tap] smoother with edge clamp and (x+128)>>8
    rounding — the reference applies it to the LUMA component only."""
    x = plane.astype(jnp.int32)
    t1 = int(tap)
    t2 = 256 - 2 * t1

    def pass1(v, axis):
        n = v.shape[axis]
        lo = jnp.take(v, jnp.clip(jnp.arange(n) - 1, 0, n - 1), axis=axis)
        hi = jnp.take(v, jnp.clip(jnp.arange(n) + 1, 0, n - 1), axis=axis)
        return (lo * t1 + v * t2 + hi * t1 + 128) >> 8

    return pass1(pass1(x, 1), 0).astype(plane.dtype)


_HIST_SHIFT = 3                      # SCHRO_HISTOGRAM_SHIFT
_HIST_SIZE = (16 - _HIST_SHIFT) * (1 << _HIST_SHIFT)


def _ilogx(x):
    """Log-bin index (schrohistogram.c:11-22), vectorized."""
    x = np.abs(np.asarray(x, np.int64))
    i = np.zeros_like(x)
    big = 2 << _HIST_SHIFT
    while (x >= big).any():
        m = x >= big
        x = np.where(m, x >> 1, x)
        i = i + m
    return (x + (i << _HIST_SHIFT)).astype(np.int64)


def _iexpx(i):
    i = np.asarray(i, np.int64)
    small = i < (1 << _HIST_SHIFT)
    v = ((1 << _HIST_SHIFT) | (i & ((1 << _HIST_SHIFT) - 1))) << np.maximum(
        (i >> _HIST_SHIFT) - 1, 0)
    return np.where(small, i, v)


def _ilogx_size(i):
    i = np.asarray(i, np.int64)
    return np.where(i < (1 << _HIST_SHIFT), 1,
                    1 << np.maximum((i >> _HIST_SHIFT) - 1, 0))


def adaptive_lowpass_sigma(y_plane) -> float:
    """schro_frame_filter_adaptive_lowpass (schrofilter.c:946-988): one
    LeGall 5/3 level over the (u8 - 128) luma, log-binned histogram of
    the vertical-highpass coefficients, least-squares slope of
    log(count/binsize) vs sqrt(value), sigma = -1/slope.  (The reference
    histograms the odd interleaved rows' first width/2 samples — half LH
    half HH; we histogram the LH+HH bands, the same population.)"""
    from schroedinger_tpu.ops import wavelet as wv
    from schroedinger_tpu.wavelets import Wavelet

    h, w = y_plane.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    res = (np.asarray(y_plane[:h2, :w2], np.int16) - 128)
    pyr = wv.forward(jnp.asarray(res), 1, Wavelet.LE_GALL_5_3)
    hi = np.concatenate([np.asarray(pyr["levels"][0][k]).ravel()
                         for k in ("lh", "hh")])
    idx = _ilogx(hi)
    bins = np.bincount(idx, minlength=_HIST_SIZE).astype(np.float64)
    i = np.arange(_HIST_SIZE)
    mask = (i > 0) & (bins > 0)
    if mask.sum() < 2:
        return 0.0
    x = np.sqrt(_iexpx(i[mask]).astype(np.float64))
    yv = np.log(bins[mask] / _ilogx_size(i[mask]))
    n = mask.sum()
    slope = ((n * (x * yv).sum() - x.sum() * yv.sum())
             / (n * (x * x).sum() - x.sum() ** 2))
    if slope >= 0:
        return 0.0
    return float(-1.0 / slope)


def center_weighted_median(plane, weight: int = 5):
    """3x3 center-weighted median (cwmN, schrofilter.c).

    The center sample is replicated `weight` times among the 8 neighbors;
    implemented as a sorting network over the 9 samples with the weighted
    median picked by rank.
    """
    x = plane.astype(jnp.int32)
    h, w = x.shape
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
            xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
            taps.append(x[ys[:, None], xs[None, :]])
    stack = jnp.stack(taps, axis=0)  # (9, h, w)
    center = stack[4]
    reps = [stack[i] for i in range(9) if i != 4]
    reps += [center] * weight
    arr = jnp.stack(reps, axis=0)
    srt = jnp.sort(arr, axis=0)
    med = srt[(8 + weight) // 2]
    return med.astype(plane.dtype)


def add_noise(plane, amount: float, key):
    noise = jax.random.normal(key, plane.shape) * amount
    out = plane.astype(jnp.float32) + noise
    return jnp.clip(jnp.round(out), 0, 255).astype(plane.dtype)


def apply_prefilter(planes, filtering: str, filter_value: float, key=None):
    """Dispatch by setting name (config.FILTERINGS; reference dispatch
    schroencoder.c:2211-2234)."""
    if filtering in ("none", 0):
        return planes
    if filtering == "adaptive_gaussian":
        # sigma chosen from the luma's wavelet-coefficient slope; filter
        # engages only when sigma > 1 (schrofilter.c:981-987)
        sigma = adaptive_lowpass_sigma(np.asarray(planes[0]))
        if sigma <= 1.0:
            return planes
        return tuple(gaussian_lowpass(jnp.asarray(p), sigma,
                                      chroma_shift=(0 if i == 0 else 1))
                     for i, p in enumerate(planes))
    out = []
    for i, p in enumerate(planes):
        p = jnp.asarray(p)
        if filtering == "gaussian":
            out.append(gaussian_lowpass(p, filter_value,
                                        chroma_shift=(0 if i == 0 else 1)))
        elif filtering == "lowpass":
            # luma only, like the reference (lowpass3_h_u8 copies chroma)
            out.append(lowpass3(p, int(filter_value)) if i == 0 else p)
        elif filtering == "center_weighted_median":
            out.append(center_weighted_median(p, int(max(1, filter_value))))
        elif filtering == "add_noise":
            if key is None:
                key = jax.random.PRNGKey(0)
            key, sub = jax.random.split(key)
            out.append(add_noise(p, filter_value, sub))
        else:
            out.append(p)
    return tuple(out)
