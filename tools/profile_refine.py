"""Head-to-head: make_patch_refine kernel vs jnp _patch_refine gather,
fine-level 1080p geometry, varied inputs, honest per-call fetch.
nohup python tools/profile_refine.py > /tmp/profile_refine.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from schroedinger_tpu.encoder import me as me_mod
from schroedinger_tpu.ops import pallas_me

nby, nbx, bs, rad = 68, 120, 16, 2
bound = 124
margin = bound + 2 * 8 + 16
N = 8


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    Hp = nby * bs + 2 * margin
    Wp = nbx * bs + 2 * margin
    P = jnp.asarray(rng.integers(0, 255, (Hp, Wp)), jnp.int32)
    curs = [jnp.asarray(rng.integers(0, 255, (nby * nbx, bs, bs)),
                        jnp.int32) for _ in range(N)]
    mvs = [(jnp.asarray(rng.integers(-120, 120, (nby, nbx)), jnp.int32),
            jnp.asarray(rng.integers(-120, 120, (nby, nbx)), jnp.int32))
           for _ in range(N)]

    jref = jax.jit(lambda c, p, a, b: me_mod._patch_refine(
        c, p, a, b, nby, nbx, bs, bs, rad, margin))
    pk = jax.jit(pallas_me.make_patch_refine(nby, nbx, bs, bs, rad, bound,
                                             margin, Hp, Wp))

    for name, fn in (("pallas", pk), ("jnp-gather", jref)):
        out = fn(curs[0], P, *mvs[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        acc = 0
        for c, (my, mx) in zip(curs, mvs):
            dy, dx, sad = fn(c, P, my, mx)
            acc += int(np.asarray(sad.sum()))
        dt = (time.perf_counter() - t0) / N
        print(f"{name}: {dt*1000:.2f} ms/call (acc={acc})", flush=True)


if __name__ == "__main__":
    main()
