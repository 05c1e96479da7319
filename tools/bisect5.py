"""Amortized (chained) timing of gather-replacement candidates.

Each candidate runs CHAIN times inside one jitted program with a data
dependency between iterations, so per-op cost = total / CHAIN and the
~25ms tunnel sync floor amortizes away.

nohup python tools/bisect5.py > /tmp/bisect5.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

YB, XB = 68, 120
BS = 16
NB = YB * XB
UP_H, UP_W = 2336, 4000   # padded upsampled plane
PH, PW = 56, 56           # patch size (2*24+2 rounded up to 8)
CHAIN = 10


def timeit(name, fn, *args, n=3, chain=CHAIN):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt/chain*1000:.2f} ms/op  ({dt*1000:.1f} ms total)",
          flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    up = jnp.asarray(rng.integers(0, 255, (UP_H, UP_W), dtype=np.uint8))
    oy0 = jnp.asarray(rng.integers(0, UP_H - PH, (NB,), np.int32))
    ox0 = jnp.asarray(rng.integers(0, UP_W - PW, (NB,), np.int32))
    c32 = jnp.asarray(
        rng.integers(0, 255, (YB * BS, XB * BS), dtype=np.int32))

    # A: chained vmap dynamic_slice patch extraction
    @jax.jit
    def chained_patches(up, oy, ox):
        acc = jnp.zeros((NB, PH, PW), jnp.int32)
        for k in range(CHAIN):
            o = jnp.stack([(oy + k) % (UP_H - PH), ox], axis=-1)

            def slc(oo):
                return jax.lax.dynamic_slice(up, (oo[0], oo[1]), (PH, PW))

            ps = jax.vmap(slc)(o)
            acc = acc + ps.astype(jnp.int32)
        return acc

    timeit("vmap dyn-slice 8160x56x56", chained_patches, up, oy0, ox0)

    # B: chained per-pixel gather (the thing we're replacing)
    dy = jnp.asarray(rng.integers(-16, 16, (YB, XB), np.int32))
    dx = jnp.asarray(rng.integers(-16, 16, (YB, XB), np.int32))
    H, W = YB * BS, XB * BS
    ys = jnp.arange(H)
    xs = jnp.arange(W)

    @jax.jit
    def chained_gather(up, dy, dx):
        acc = jnp.zeros((H, W), jnp.int32)
        for k in range(CHAIN):
            dy_pix = jnp.repeat(jnp.repeat(dy + k, BS, 0), BS, 1)
            dx_pix = jnp.repeat(jnp.repeat(dx, BS, 0), BS, 1)
            py = jnp.clip(2 * ys[:, None] + dy_pix, 0, UP_H - 2)
            px = jnp.clip(2 * xs[None, :] + dx_pix, 0, UP_W - 2)
            acc = acc + up[py, px].astype(jnp.int32)
        return acc

    timeit("per-pixel gather 2M", chained_gather, up, dy, dx)

    # C: chained blocksum (reshape form)
    @jax.jit
    def chained_bsum(x):
        acc = jnp.zeros((YB, XB), jnp.int32)
        for k in range(CHAIN):
            acc = acc + (x + k).reshape(YB, BS, XB, BS).sum((1, 3))
        return acc

    timeit("blocksum reshape", chained_bsum, c32)

    # D: chained patch blocksum (nb, 16, 16) -> (nb,)
    p16 = jnp.asarray(rng.integers(0, 255, (NB, BS, BS), dtype=np.int32))

    @jax.jit
    def chained_psum(p):
        acc = jnp.zeros((NB,), jnp.int32)
        for k in range(CHAIN):
            acc = acc + (p + k).sum((1, 2))
        return acc

    timeit("patch blocksum (8160,16,16)", chained_psum, p16)

    # E: chained phase recompose (pad/transpose/reshape/roll)
    contrib = jnp.asarray(rng.integers(0, 255, (34, 60, 24, 24), np.int32))

    @jax.jit
    def chained_recompose(c):
        acc = jnp.zeros((34 * 32, 60 * 32), jnp.int32)
        for k in range(CHAIN):
            t = jnp.pad(c + k, ((0, 0), (0, 0), (0, 8), (0, 8)))
            canvas = t.transpose(0, 2, 1, 3).reshape(34 * 32, 60 * 32)
            acc = acc + jnp.roll(canvas, (k % 4, 4), (0, 1))
        return acc

    timeit("phase recompose 34x60x24x24", chained_recompose, contrib)

    # F: chained strided tap extraction p[:, 0::2, 0::2] from (8160,56,56)
    p56 = jnp.asarray(rng.integers(0, 255, (NB, PH, PW), dtype=np.uint8))

    @jax.jit
    def chained_taps(p):
        acc = jnp.zeros((NB, 24, 24), jnp.int32)
        for k in range(CHAIN):
            q = (p + k).astype(jnp.int32)
            p00 = q[:, 0:48:2, 0:48:2]
            p01 = q[:, 0:48:2, 1:49:2]
            p10 = q[:, 1:49:2, 0:48:2]
            p11 = q[:, 1:49:2, 1:49:2]
            acc = acc + ((p00 + p01 + p10 + p11 + 2) >> 2)[:, :24, :24]
        return acc

    timeit("4-tap strided bilinear from patches", chained_taps, p56)

    # G: repeat (dense block-field upsample)
    f = jnp.asarray(rng.integers(0, 255, (YB, XB), np.int32))

    @jax.jit
    def chained_repeat(f):
        acc = jnp.zeros((H, W), jnp.int32)
        for k in range(CHAIN):
            acc = acc + jnp.repeat(jnp.repeat(f + k, BS, 0), BS, 1)
        return acc

    timeit("jnp.repeat field->pixels", chained_repeat, f)


if __name__ == "__main__":
    main()
