"""Tile sharding within a frame: wavelet transforms with halo exchange.

Frames are sharded by rows across a mesh axis. Horizontal lifting is local
(rows are complete); every vertical lifting TAP exchanges its support
(<= 4 rows) with neighbor devices via jax.lax.ppermute, so the sharded
transform is bit-identical to the single-device one: a tap on the global
array `x[clamp(i+off)]` becomes local rows plus the neighbor's edge rows,
with the global edge clamping to the true first/last row.

This is the codec's "sequence parallel" axis (SURVEY §2.3.5): wavelet halo
<= 4 samples/level, OBMC halo <= block length, upsample halo 8 taps.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from schroedinger_tpu.ops import wavelet as wv
from schroedinger_tpu.wavelets import HAS_SHIFT, Wavelet


def make_halo_tap(axis_name: str):
    """Halo-aware tap: semantics of wv._shift_edge over the GLOBAL array for
    a row-sharded (axis -2) local tile; falls back to local clamping along
    other axes."""

    def shift1(x, direction: int):
        """Global clamped shift by +-1 row across the sharded axis."""
        n_dev = jax.lax.psum(1, axis_name)
        idx = jax.lax.axis_index(axis_name)
        if direction > 0:
            edge = x[..., :1, :]                       # my first row
            perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            recv = jax.lax.ppermute(edge, axis_name, perm)  # next dev's first
            tail = jnp.where(idx == n_dev - 1, x[..., -1:, :], recv)
            return jnp.concatenate([x[..., 1:, :], tail], axis=-2)
        else:
            edge = x[..., -1:, :]
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            recv = jax.lax.ppermute(edge, axis_name, perm)
            head = jnp.where(idx == 0, x[..., :1, :], recv)
            return jnp.concatenate([head, x[..., :-1, :]], axis=-2)

    def tap(x, off: int, axis: int):
        if off == 0:
            return x
        if axis % x.ndim != x.ndim - 2:
            return wv._shift_edge(x, off, axis)
        # composition of clamped single shifts equals the clamped k-shift
        step = 1 if off > 0 else -1
        for _ in range(abs(off)):
            x = shift1(x, step)
        return x

    return tap


def fwd_level_sharded(x, wavelet: Wavelet, axis_name: str):
    """One 2-D analysis level on a row-sharded tile; bit-identical to
    wv.fwd_level on the gathered array (tile height must be even >= 2)."""
    wavelet = Wavelet(wavelet)
    tap = make_halo_tap(axis_name)
    if HAS_SHIFT[wavelet]:
        x = x + x
    e, o = wv._split(x, -1)
    lo_, hi_ = wv._lift_fwd(e, o, wavelet, -1)
    out = []
    for half in (lo_, hi_):
        ev, od = wv._split(half, -2)
        ev, od = wv._lift_fwd(ev, od, wavelet, -2, tap=tap)
        out.append((ev, od))
    (ll, lh), (hl, hh) = out
    return ll, hl, lh, hh


def inv_level_sharded(ll, hl, lh, hh, wavelet: Wavelet, axis_name: str):
    wavelet = Wavelet(wavelet)
    tap = make_halo_tap(axis_name)
    halves = []
    for ev, od in ((ll, lh), (hl, hh)):
        ev, od = wv._lift_inv(ev, od, wavelet, -2, tap=tap)
        halves.append(wv._interleave(ev, od, -2))
    lo_, hi_ = halves
    e, o = wv._lift_inv(lo_, hi_, wavelet, -1)
    x = wv._interleave(e, o, -1)
    if HAS_SHIFT[wavelet]:
        x = (x + jnp.asarray(1, x.dtype)) >> 1
    return x


def make_sharded_forward(mesh: Mesh, depth: int, wavelet: Wavelet,
                         axis: str = "tile"):
    """jit(fn(frame)): frame row-sharded over `axis` -> pyramid, every band
    row-sharded. Requires tile height at the deepest level >= 2 per device."""

    def body(x):
        levels = []
        cur = x
        for _ in range(depth):
            ll, hl, lh, hh = fwd_level_sharded(cur, wavelet, axis)
            levels.append({"hl": hl, "lh": lh, "hh": hh})
            cur = ll
        return {"ll": cur, "levels": levels}

    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None), check_rep=False)
    return jax.jit(fn)


def make_sharded_inverse(mesh: Mesh, depth: int, wavelet: Wavelet,
                         axis: str = "tile"):
    def body(pyr):
        cur = pyr["ll"]
        for lev in reversed(pyr["levels"]):
            cur = inv_level_sharded(cur, lev["hl"], lev["lh"], lev["hh"],
                                    wavelet, axis)
        return cur

    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None), check_rep=False)
    return jax.jit(fn)
