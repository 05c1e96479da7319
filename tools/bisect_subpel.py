"""Bisect what is slow inside subpel refine / OBMC render.

nohup python tools/bisect_subpel.py > /tmp/bisect_subpel.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from schroedinger_tpu.ops.obmc import _fetch_pixels

H, W = 1080, 1920
PAD_H, PAD_W = 1088, 1920
YB, XB = 68, 120
BS = 16


def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    up = jnp.asarray(rng.integers(0, 255, (2 * H, 2 * W), dtype=np.uint8))
    dy = jnp.asarray(rng.integers(-8, 8, (YB, XB), np.int32))
    dx = jnp.asarray(rng.integers(-8, 8, (YB, XB), np.int32))

    ys = jnp.arange(PAD_H)
    xs = jnp.arange(PAD_W)

    # 1: one fetch at prec 2 with per-block MV
    @jax.jit
    def one_fetch(cur, up, dy, dx):
        c = jnp.pad(cur, ((0, PAD_H - H), (0, PAD_W - W)),
                    mode="edge").astype(jnp.int32)
        dy_pix = jnp.repeat(jnp.repeat(dy * 4, BS, 0), BS, 1)
        dx_pix = jnp.repeat(jnp.repeat(dx * 4, BS, 0), BS, 1)
        py = (ys[:, None] << 2) + dy_pix
        px = (xs[None, :] << 2) + dx_pix
        samp = _fetch_pixels(up, 2, px, py)
        return jnp.abs(c - samp).reshape(YB, BS, XB, BS).sum((1, 3))

    timeit("1 fetch prec2 + blocksum", one_fetch, cur, up, dy, dx)

    # 2: 9 fetches, python loop
    @jax.jit
    def nine_fetch(cur, up, dy, dx):
        c = jnp.pad(cur, ((0, PAD_H - H), (0, PAD_W - W)),
                    mode="edge").astype(jnp.int32)
        dy_pix = jnp.repeat(jnp.repeat(dy * 4, BS, 0), BS, 1)
        dx_pix = jnp.repeat(jnp.repeat(dx * 4, BS, 0), BS, 1)
        sads = []
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                py = (ys[:, None] << 2) + dy_pix + oy
                px = (xs[None, :] << 2) + dx_pix + ox
                samp = _fetch_pixels(up, 2, px, py)
                sads.append(jnp.abs(c - samp).reshape(YB, BS, XB, BS)
                            .sum((1, 3)))
        s = jnp.stack(sads)
        return jnp.argmin(s, axis=0)

    timeit("9 fetches unrolled", nine_fetch, cur, up, dy, dx)

    # 3: 9 fetches via lax.scan (as the real code does)
    cands = jnp.asarray([(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)],
                        jnp.int32)

    @jax.jit
    def nine_scan(cur, up, dy, dx):
        c = jnp.pad(cur, ((0, PAD_H - H), (0, PAD_W - W)),
                    mode="edge").astype(jnp.int32)
        dy_pix = jnp.repeat(jnp.repeat(dy * 4, BS, 0), BS, 1)
        dx_pix = jnp.repeat(jnp.repeat(dx * 4, BS, 0), BS, 1)

        def sad_at(_, d):
            py = (ys[:, None] << 2) + dy_pix + d[0]
            px = (xs[None, :] << 2) + dx_pix + d[1]
            samp = _fetch_pixels(up, 2, px, py)
            return None, jnp.abs(c - samp).reshape(YB, BS, XB, BS).sum((1, 3))

        _, sads = jax.lax.scan(sad_at, None, cands)
        return jnp.argmin(sads, axis=0)

    timeit("9 fetches lax.scan", nine_scan, cur, up, dy, dx)

    # 4: the real subpel body
    from schroedinger_tpu.encoder import me as me_mod
    sub = jax.jit(me_mod.make_subpel_body(H, W, BS, BS, XB, YB, 2))
    timeit("real subpel body", sub, cur, up, dy, dx)

    # 5: real subpel with precision 1
    sub1 = jax.jit(me_mod.make_subpel_body(H, W, BS, BS, XB, YB, 1))
    timeit("real subpel prec1", sub1, cur, up, dy, dx)


if __name__ == "__main__":
    main()
