"""Micro-benchmark: per-pixel gather vs batched dynamic-slice patch fetch.

nohup python tools/bench_gather.py > /tmp/bench_gather.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1080, 1920
UP_H, UP_W = 2 * H, 2 * W
NBY, NBX = 68, 120        # 16x16 blocks
PATCH = 56                # rounded 2*24+1


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    up = jnp.asarray(rng.integers(0, 255, (UP_H, UP_W), dtype=np.uint8))
    # per-block random offsets (half-pel), bounded
    oy = jnp.asarray(rng.integers(0, UP_H - PATCH, (NBY, NBX), np.int32))
    ox = jnp.asarray(rng.integers(0, UP_W - PATCH, (NBY, NBX), np.int32))

    # A: per-pixel gather (current formulation, one of 4 bilinear taps)
    @jax.jit
    def perpixel(up, oy, ox):
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        dy_pix = jnp.repeat(jnp.repeat(oy, 16, 0), 16, 1)[:H, :W]
        dx_pix = jnp.repeat(jnp.repeat(ox, 16, 0), 16, 1)[:H, :W]
        py = jnp.clip(ys[:, None] + dy_pix, 0, UP_H - 1)
        px = jnp.clip(xs[None, :] + dx_pix, 0, UP_W - 1)
        return up[py, px].astype(jnp.int32).sum()

    timeit("per-pixel gather (1 tap)", perpixel, up, oy, ox)

    # B: batched dynamic-slice patches
    @jax.jit
    def patches(up, oy, ox):
        def slc(o):
            return jax.lax.dynamic_slice(up, (o[0], o[1]), (PATCH, PATCH))
        o = jnp.stack([oy.ravel(), ox.ravel()], axis=-1)
        ps = jax.vmap(slc)(o)
        return ps.astype(jnp.int32).sum()

    timeit("vmap dynamic_slice 56x56", patches, up, oy, ox)

    # C: patches with lane-aligned width 128
    @jax.jit
    def patches128(up, oy, ox):
        def slc(o):
            return jax.lax.dynamic_slice(up, (o[0], o[1]), (PATCH, 128))
        o = jnp.stack([oy.ravel(), ox.ravel()], axis=-1)
        ps = jax.vmap(slc)(o)
        return ps.astype(jnp.int32).sum()

    timeit("vmap dynamic_slice 56x128", patches128, up, oy, ox)

    # D: row-band approach: dynamic row slice only, then column roll via
    #    take_along_axis on last axis within band (per-block col offset)
    @jax.jit
    def rowband(up, oy, ox):
        # per block-row: one gather of rows (contiguous cols!)
        def one_row(oy_r, ox_r):
            # oy_r (NBX,), take rows per block... approximate: use row of
            # first block for the whole band (just measuring access cost)
            band = jax.lax.dynamic_slice(up, (oy_r[0], 0), (PATCH, UP_W))
            # per-block column slices from the band
            def cslc(o):
                return jax.lax.dynamic_slice(band, (0, o), (PATCH, PATCH))
            return jax.vmap(cslc)(ox_r)
        ps = jax.vmap(one_row)(oy, ox)
        return ps.astype(jnp.int32).sum()

    timeit("rowband slice + col slices", rowband, up, oy, ox)

    # E: full per-pixel 4-tap bilinear gather (what render actually does)
    @jax.jit
    def perpixel4(up, oy, ox):
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        dy_pix = jnp.repeat(jnp.repeat(oy, 16, 0), 16, 1)[:H, :W]
        dx_pix = jnp.repeat(jnp.repeat(ox, 16, 0), 16, 1)[:H, :W]
        py = jnp.clip(ys[:, None] + dy_pix, 0, UP_H - 2)
        px = jnp.clip(xs[None, :] + dx_pix, 0, UP_W - 2)
        acc = jnp.zeros((H, W), jnp.int32)
        for dy in (0, 1):
            for dx in (0, 1):
                acc = acc + up[py + dy, px + dx].astype(jnp.int32)
        return acc.sum()

    timeit("per-pixel gather (4 taps)", perpixel4, up, oy, ox)


if __name__ == "__main__":
    main()
