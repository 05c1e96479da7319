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


# ---------------------------------------------------------------------------
# Tile-sharded half-pel upsample and OBMC render (SURVEY §2.3.5: the
# upsample's 8-tap vertical support is a 3/4-row halo; OBMC reads the
# *reference* planes, which are replicated across the tile axis like any
# codec's reference frames, while the rendered output rows are sharded).
# ---------------------------------------------------------------------------

def _row_halo(x, lo: int, hi: int, axis_name: str):
    """Extend a row-sharded tile with `lo` rows from the previous device
    and `hi` rows from the next, replicating the global edge rows at the
    global boundaries (the upsample filter's clamp semantics)."""
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    if lo:
        edge = x[-lo:, :]
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        recv = jax.lax.ppermute(edge, axis_name, perm)  # prev dev's tail
        first = jnp.repeat(x[:1, :], lo, axis=0)
        parts.append(jnp.where(idx == 0, first, recv))
    parts.append(x)
    if hi:
        edge = x[:hi, :]
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        recv = jax.lax.ppermute(edge, axis_name, perm)  # next dev's head
        last = jnp.repeat(x[-1:, :], hi, axis=0)
        parts.append(jnp.where(idx == n_dev - 1, last, recv))
    return jnp.concatenate(parts, axis=0)


def make_sharded_upsample(mesh: Mesh, axis: str = "tile"):
    """jit(fn(plane)): row-sharded u8 plane -> row-sharded (2h, 2w)
    interleaved half-pel plane, bit-identical to
    obmc.make_halfpel(obmc.upsample_plane(plane)).  The vertical 8-tap
    filter (taps at -3..+4 rows) exchanges a 3/4-row halo; the horizontal
    passes and the reference's last-row/col overrides are local (the
    overrides apply only on the globally-last device)."""
    from schroedinger_tpu.ops import obmc

    def body(x):
        n_dev = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)
        h, w = x.shape   # local tile
        ext = _row_halo(x, 3, 4, axis)
        h2e = obmc._conv8_edge(ext, 0)
        h2 = h2e[3:3 + h, :]
        # global last row override: h2[-1] = x[-1] on the last device
        h2 = jnp.where((idx == n_dev - 1)
                       & (jnp.arange(h) == h - 1)[:, None], x, h2)
        h0 = x
        h1 = obmc._conv8_edge(x, 1)
        h1 = h1.at[:, w - 1].set(x[:, w - 1])
        h3 = obmc._conv8_edge(h2, 1)
        h3 = h3.at[:, w - 1].set(h2[:, w - 1])
        h3 = jnp.where((idx == n_dev - 1)
                       & (jnp.arange(h) == h - 1)[:, None], h1, h3)
        return obmc.make_halfpel((h0, h1, h2, h3))

    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None), check_rep=False)
    return jax.jit(fn)


def make_sharded_obmc_render(mesh: Mesh, p, num_refs: int,
                             axis: str = "tile"):
    """jit(fn(mv_fields, up1[, up2])): OBMC luma render with the OUTPUT
    rows sharded over `axis`.  The half-pel reference planes and the
    (tiny) MV fields are replicated — reference frames are the canonical
    replicated state of a codec — and each device renders its own band of
    output rows via the per-pixel renderer's global-coordinate row offset
    (ops/obmc.py render_component row0).  Bit-identical to the unsharded
    render."""
    from schroedinger_tpu.ops import obmc

    vf = p.video_format
    out_w, out_h = vf.picture_luma_size()
    n_dev = mesh.devices.size
    assert out_h % n_dev == 0, "luma height must split evenly"
    band = out_h // n_dev

    def body(mv, up1, up2):
        idx = jax.lax.axis_index(axis)
        pred = obmc.render_component(
            mv["dx1"], mv["dy1"], mv["dx2"], mv["dy2"], mv["pred_mode"],
            mv["dc0"], up1, (up2 if num_refs == 2 else None), None,
            p.xblen_luma, p.yblen_luma, p.xbsep_luma, p.ybsep_luma,
            p.mv_precision, p.picture_weight_1, p.picture_weight_2,
            p.picture_weight_bits, band, out_w, row0=idx * band)
        return pred.astype(jnp.int16)

    specs_in = ({k: P() for k in ("dx1", "dy1", "dx2", "dy2",
                                  "pred_mode", "dc0")},
                P(None, None), P(None, None))
    fn = shard_map(body, mesh=mesh, in_specs=specs_in,
                   out_specs=P(axis, None), check_rep=False)
    return jax.jit(fn)
