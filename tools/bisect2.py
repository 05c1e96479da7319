"""Finer bisection: which sub-op costs 114ms?

nohup python tools/bisect2.py > /tmp/bisect2.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1088, 1920
YB, XB = 68, 120
BS = 16
UP_H, UP_W = 2160, 3840


def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    up = jnp.asarray(rng.integers(0, 255, (UP_H, UP_W), dtype=np.uint8))
    up32 = up.astype(jnp.int32)
    dy = jnp.asarray(rng.integers(-8, 8, (YB, XB), np.int32))
    dx = jnp.asarray(rng.integers(-8, 8, (YB, XB), np.int32))
    c32 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.int32))
    ys = jnp.arange(H)
    xs = jnp.arange(W)

    def idx(dy, dx):
        dy_pix = jnp.repeat(jnp.repeat(dy * 4, BS, 0), BS, 1)
        dx_pix = jnp.repeat(jnp.repeat(dx * 4, BS, 0), BS, 1)
        py = ((ys[:, None] << 2) + dy_pix) << 1
        px = ((xs[None, :] << 2) + dx_pix) << 1
        hy = jnp.clip(py >> 2, 0, UP_H - 2)
        hx = jnp.clip(px >> 2, 0, UP_W - 2)
        return hy, hx, py & 3, px & 3

    @jax.jit
    def g1_u8(up, dy, dx):
        hy, hx, ry, rx = idx(dy, dx)
        return up[hy, hx].astype(jnp.int32).sum()

    timeit("1 gather u8, total sum", g1_u8, up, dy, dx)

    @jax.jit
    def g1_i32(up32, dy, dx):
        hy, hx, ry, rx = idx(dy, dx)
        return up32[hy, hx].sum()

    timeit("1 gather i32, total sum", g1_i32, up32, dy, dx)

    @jax.jit
    def g1_u8_blocksum(up, dy, dx):
        hy, hx, ry, rx = idx(dy, dx)
        s = up[hy, hx].astype(jnp.int32)
        return s.reshape(YB, BS, XB, BS).sum((1, 3))

    timeit("1 gather u8 + blocksum", g1_u8_blocksum, up, dy, dx)

    @jax.jit
    def blocksum_only(c32):
        return c32.reshape(YB, BS, XB, BS).sum((1, 3))

    timeit("blocksum only", blocksum_only, c32)

    @jax.jit
    def g4_u8(up, dy, dx):
        hy, hx, ry, rx = idx(dy, dx)
        p00 = up[hy, hx].astype(jnp.int32)
        p01 = up[hy, jnp.clip(hx + 1, 0, UP_W - 2)].astype(jnp.int32)
        p10 = up[jnp.clip(hy + 1, 0, UP_H - 2), hx].astype(jnp.int32)
        p11 = up[jnp.clip(hy + 1, 0, UP_H - 2),
                 jnp.clip(hx + 1, 0, UP_W - 2)].astype(jnp.int32)
        v = ((4 - ry) * (4 - rx) * p00 + (4 - ry) * rx * p01
             + ry * (4 - rx) * p10 + ry * rx * p11)
        return ((v + 8) >> 4).sum()

    timeit("4 gathers + bilinear, total sum", g4_u8, up, dy, dx)

    # same but constant offsets via pre-shifted planes (no extra index arrays)
    @jax.jit
    def g4_roll(up, dy, dx):
        hy, hx, ry, rx = idx(dy, dx)
        ups = [up,
               jnp.roll(up, -1, axis=1),
               jnp.roll(up, -1, axis=0),
               jnp.roll(jnp.roll(up, -1, axis=0), -1, axis=1)]
        p00 = ups[0][hy, hx].astype(jnp.int32)
        p01 = ups[1][hy, hx].astype(jnp.int32)
        p10 = ups[2][hy, hx].astype(jnp.int32)
        p11 = ups[3][hy, hx].astype(jnp.int32)
        v = ((4 - ry) * (4 - rx) * p00 + (4 - ry) * rx * p01
             + ry * (4 - rx) * p10 + ry * rx * p11)
        return ((v + 8) >> 4).sum()

    timeit("4 rolled-plane gathers + bilinear", g4_roll, up, dy, dx)

    # exact copy of bench_gather E for sanity (same process)
    oy = jnp.asarray(rng.integers(0, UP_H - 56, (YB, XB), np.int32))
    ox = jnp.asarray(rng.integers(0, UP_W - 56, (YB, XB), np.int32))

    @jax.jit
    def perpixel4(up, oy, ox):
        ys0 = jnp.arange(1080)
        xs0 = jnp.arange(1920)
        dy_pix = jnp.repeat(jnp.repeat(oy, 16, 0), 16, 1)[:1080, :1920]
        dx_pix = jnp.repeat(jnp.repeat(ox, 16, 0), 16, 1)[:1080, :1920]
        py = jnp.clip(ys0[:, None] + dy_pix, 0, UP_H - 2)
        px = jnp.clip(xs0[None, :] + dx_pix, 0, UP_W - 2)
        acc = jnp.zeros((1080, 1920), jnp.int32)
        for a in (0, 1):
            for b in (0, 1):
                acc = acc + up[py + a, px + b].astype(jnp.int32)
        return acc.sum()

    timeit("bench_gather E copy", perpixel4, up, oy, ox)


if __name__ == "__main__":
    main()
