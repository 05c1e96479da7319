"""Time the Pallas patch-refine kernel vs the jnp gather formulation at
1080p geometry.  nohup python tools/profile_pallas_me.py > log 2>&1 &"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from schroedinger_tpu.encoder import me as me_mod
from schroedinger_tpu.ops import pallas_me


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    nby, nbx, bs = 68, 120, 16
    rad = 2
    bound = me_mod.ME_BOUND_PEL
    margin = bound + 2 * 8 + 16
    pad_h, pad_w = nby * bs, nbx * bs
    rng = np.random.default_rng(0)
    cur = rng.integers(0, 255, (pad_h, pad_w)).astype(np.uint8)
    ref = rng.integers(0, 255, (pad_h, pad_w)).astype(np.uint8)
    mvr = bound - rad
    mv_y = rng.integers(-mvr, mvr, (nby, nbx)).astype(np.int32)
    mv_x = rng.integers(-mvr, mvr, (nby, nbx)).astype(np.int32)

    cb = me_mod._to_blocks(jnp.asarray(cur, jnp.int32), nby, bs, nbx, bs)
    P = me_mod._pad_ref(jnp.asarray(ref), margin)
    cb = jax.device_put(cb)
    P = jax.device_put(P)
    mvy = jax.device_put(jnp.asarray(mv_y))
    mvx = jax.device_put(jnp.asarray(mv_x))

    jref = jax.jit(lambda c, p, a, b: me_mod._patch_refine(
        c, p, a, b, nby, nbx, bs, bs, rad, margin))
    ey, ex, es = timeit("jnp patch_refine (r=2, 1080p)", jref, cb, P,
                        mvy, mvx)

    pk = pallas_me.make_patch_refine(nby, nbx, bs, bs, rad, bound, margin,
                                     P.shape[0], P.shape[1])
    pkj = jax.jit(pk)
    t0 = time.perf_counter()
    gy, gx, gs = pkj(cb, P, mvy, mvx)
    jax.block_until_ready((gy, gx, gs))
    print(f"pallas compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    timeit("pallas patch_refine (r=2, 1080p)", pkj, cb, P, mvy, mvx)

    ok = (np.array_equal(np.asarray(gs), np.asarray(es))
          and np.array_equal(np.asarray(gy), np.asarray(ey))
          and np.array_equal(np.asarray(gx), np.asarray(ex)))
    print("bit-exact vs jnp:", ok, flush=True)


if __name__ == "__main__":
    main()
