"""Stage-by-stage timing of make_me_body internals at 1080p."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from schroedinger_tpu.encoder import me as me_mod

H, W = 1080, 1920
bs = 16
ynb, xnb = 68, 120
pad_h, pad_w = ynb * bs, xnb * bs
B = me_mod.ME_BOUND_PEL
margin = B + 2 * 8 + 16


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
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.uint8))
    ref = jnp.asarray(np.roll(np.asarray(cur), 3, axis=1))

    def pyramid(c, r, levels):
        c = jnp.pad(c, ((0, pad_h - H), (0, pad_w - W)), mode="edge")
        r = jnp.pad(r, ((0, pad_h - H), (0, pad_w - W)), mode="edge")
        pc, pr = [c], [r]
        for _ in range(levels - 1):
            pc.append(me_mod.downsample2(pc[-1]))
            pr.append(me_mod.downsample2(pr[-1]))
        return pc, pr

    timeit("pyramid build x5", jax.jit(lambda c, r: pyramid(c, r, 5)),
           cur, ref)

    # per-level refine in isolation (mirrors the me body's level loop)
    pc, pr = pyramid(cur, ref, 5)
    for lev in (4, 3, 2, 1, 0):
        c, r = pc[lev], pr[lev]
        bs_y = max(4, bs >> lev) if lev else bs
        h, w = c.shape
        h = h // bs_y * bs_y
        w = w // bs_y * bs_y
        nby, nbx = h // bs_y, w // bs_y
        rad = 8 if lev == 4 else 2

        def level(c, r, lev=lev, bs_y=bs_y, h=h, w=w, nby=nby, nbx=nbx,
                  rad=rad):
            cb = me_mod._to_blocks(c[:h, :w].astype(jnp.int32),
                                   nby, bs_y, nbx, bs_y)
            P = me_mod._pad_ref(r[:h, :w], margin)
            zero = jnp.zeros((nby, nbx), jnp.int32)
            return me_mod._patch_refine(cb, P, zero, zero, nby, nbx,
                                        bs_y, bs_y, rad, margin)

        timeit(f"level {lev} (bs={bs_y} rad={rad} {nby}x{nbx})",
               jax.jit(level), c, r)

    # the full body for comparison
    body = jax.jit(me_mod.make_me_body(H, W, bs, bs, xnb, ynb, levels=5,
                                       candidates=False))
    timeit("full me body (cands off)", body, cur, ref)
    body2 = jax.jit(me_mod.make_me_body(H, W, bs, bs, xnb, ynb, levels=5))
    timeit("full me body (cands on)", body2, cur, ref)


if __name__ == "__main__":
    main()
