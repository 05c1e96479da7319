"""Encoder prefilters (schrofilter.c equivalents) and analysis helpers.

Dispatch mirrors the reference's `filtering` setting
(schroencoder.c:2211-2234): none / center-weighted-median / gaussian /
add-noise / adaptive-gaussian / lowpass. These are encoder-side quality
tools (not bitstream-conformance-critical), implemented as jnp ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def gaussian_lowpass(plane, sigma: float):
    """Separable 5-tap approximate Gaussian (schro_frame_filter_lowpass2)."""
    x = plane.astype(jnp.float32)
    t = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0])
    t = t / t.sum()
    amount = jnp.clip(sigma, 0.0, 1.0)

    def conv1(v, axis):
        acc = jnp.zeros_like(v)
        n = v.shape[axis]
        for k in range(5):
            idx = jnp.clip(jnp.arange(n) + (k - 2), 0, n - 1)
            acc = acc + jnp.take(v, idx, axis=axis) * t[k]
        return acc

    blurred = conv1(conv1(x, 0), 1)
    out = x + amount * (blurred - x)
    return jnp.clip(jnp.round(out), 0, 255).astype(plane.dtype)


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
    """Dispatch by setting name (config.FILTERINGS)."""
    if filtering in ("none", 0):
        return planes
    out = []
    for p in planes:
        if filtering in ("gaussian", "adaptive_gaussian", "lowpass"):
            out.append(gaussian_lowpass(p, filter_value / 10.0))
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
