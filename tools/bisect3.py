"""Dispatch-overhead-aware micro-bench: trivial op baseline, gather
alternatives, MXU blocksum. n=10 each.

nohup python tools/bisect3.py > /tmp/bisect3.log 2>&1 &
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
PATCH = 56


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    up = jnp.asarray(rng.integers(0, 255, (UP_H, UP_W), dtype=np.uint8))
    c32 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.int32))
    dy = jnp.asarray(rng.integers(-8, 8, (YB, XB), np.int32))
    dx = jnp.asarray(rng.integers(-8, 8, (YB, XB), np.int32))

    @jax.jit
    def trivial(x):
        return x + 1

    timeit("trivial x+1 (2M i32) [dispatch floor]", trivial, c32)

    @jax.jit
    def trivial_sum(x):
        return (x + 1).sum()

    timeit("trivial sum", trivial_sum, c32)

    # chained 10x trivial to see per-op cost inside one dispatch
    @jax.jit
    def chain10(x):
        for _ in range(10):
            x = x * 3 + 1
        return x

    timeit("chain of 10 elementwise", chain10, c32)

    # gather, measured against the floor
    ys = jnp.arange(H)
    xs = jnp.arange(W)

    @jax.jit
    def g1(up, dy, dx):
        dy_pix = jnp.repeat(jnp.repeat(dy, BS, 0), BS, 1)
        dx_pix = jnp.repeat(jnp.repeat(dx, BS, 0), BS, 1)
        hy = jnp.clip(2 * ys[:, None] + dy_pix, 0, UP_H - 2)
        hx = jnp.clip(2 * xs[None, :] + dx_pix, 0, UP_W - 2)
        return up[hy, hx]

    timeit("1 per-pixel gather (no sum)", g1, up, dy, dx)

    @jax.jit
    def g4(up, dy, dx):
        dy_pix = jnp.repeat(jnp.repeat(dy, BS, 0), BS, 1)
        dx_pix = jnp.repeat(jnp.repeat(dx, BS, 0), BS, 1)
        hy = jnp.clip(2 * ys[:, None] + dy_pix, 0, UP_H - 2)
        hx = jnp.clip(2 * xs[None, :] + dx_pix, 0, UP_W - 2)
        a = up[hy, hx].astype(jnp.int32)
        b = up[hy, hx + 1].astype(jnp.int32)
        c = up[hy + 1, hx].astype(jnp.int32)
        d = up[hy + 1, hx + 1].astype(jnp.int32)
        return (a + b + c + d + 2) >> 2

    timeit("4 per-pixel gathers + avg", g4, up, dy, dx)

    # patches via vmap dynamic_slice
    oy = jnp.clip(2 * jnp.arange(0, H, BS)[:, None] + dy * 0, 0,
                  UP_H - PATCH)

    @jax.jit
    def patches(up, dy, dx):
        by = (jnp.arange(YB) * BS * 2)[:, None] + dy * 0
        bx = (jnp.arange(XB) * BS * 2)[None, :] + dx * 0
        o = jnp.stack([jnp.clip(by + dy, 0, UP_H - PATCH).ravel(),
                       jnp.clip(bx + dx, 0, UP_W - PATCH).ravel()], axis=-1)

        def slc(oo):
            return jax.lax.dynamic_slice(up, (oo[0], oo[1]), (PATCH, PATCH))

        return jax.vmap(slc)(o)

    timeit("vmap dyn-slice 8160x56x56 (no sum)", patches, up, dy, dx)

    @jax.jit
    def patches_bilin_sad(up, dy, dx, c32):
        by = (jnp.arange(YB) * BS * 2)[:, None] + dy * 0
        bx = (jnp.arange(XB) * BS * 2)[None, :] + dx * 0
        o = jnp.stack([jnp.clip(by + dy, 0, UP_H - PATCH).ravel(),
                       jnp.clip(bx + dx, 0, UP_W - PATCH).ravel()], axis=-1)

        def slc(oo):
            return jax.lax.dynamic_slice(up, (oo[0], oo[1]), (PATCH, PATCH))

        ps = jax.vmap(slc)(o)                      # (8160, 56, 56)
        p = ps.astype(jnp.int32)
        bil = (p[:, 0:32:2, 0:32:2] + p[:, 0:32:2, 1:33:2]
               + p[:, 1:33:2, 0:32:2] + p[:, 1:33:2, 1:33:2] + 2) >> 2
        cur = c32.reshape(YB, BS, XB, BS).transpose(0, 2, 1, 3).reshape(
            YB * XB, BS, BS)
        return jnp.abs(bil - cur).sum((1, 2)).reshape(YB, XB)

    timeit("patches + bilinear + SAD", patches_bilin_sad, up, dy, dx, c32)

    # blocksum alternatives
    @jax.jit
    def blocksum_reshape(x):
        return x.reshape(YB, BS, XB, BS).sum((1, 3))

    timeit("blocksum reshape", blocksum_reshape, c32)

    px_mat = jnp.zeros((W, XB), jnp.float32)
    px_mat = px_mat.at[jnp.arange(W), jnp.arange(W) // BS].set(1.0)

    @jax.jit
    def blocksum_mxu(x):
        r = x.reshape(YB, BS, W).sum(1).astype(jnp.float32)   # (YB, W)
        return jnp.dot(r, px_mat,
                       preferred_element_type=jnp.float32).astype(jnp.int32)

    timeit("blocksum rowfold+MXU", blocksum_mxu, c32)

    @jax.jit
    def blocksum_2step(x):
        r = x.reshape(YB, BS, W).sum(1)          # (YB, W) sublane fold
        r2 = r.reshape(YB, XB, BS).sum(2)        # lane-split fold
        return r2

    timeit("blocksum 2-step reshape", blocksum_2step, c32)

    # verify agreement
    a = np.asarray(blocksum_reshape(c32))
    b = np.asarray(blocksum_mxu(c32))
    c = np.asarray(blocksum_2step(c32))
    print("agree mxu:", np.array_equal(a, b), "2step:", np.array_equal(a, c),
          flush=True)


if __name__ == "__main__":
    main()
