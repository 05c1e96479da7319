"""Bisect make_me_body: time progressively larger prefixes of the body."""
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


def make_prefix(n_levels_done):
    """Body prefix: pyramid + the first n_levels_done level refinements
    (starting from the coarsest, lev 4)."""
    def fn(cur, ref):
        cur = jnp.pad(cur, ((0, pad_h - H), (0, pad_w - W)), mode="edge")
        ref = jnp.pad(ref, ((0, pad_h - H), (0, pad_w - W)), mode="edge")
        pyr_c, pyr_r = [cur], [ref]
        for _ in range(4):
            pyr_c.append(me_mod.downsample2(pyr_c[-1]))
            pyr_r.append(me_mod.downsample2(pyr_r[-1]))
        mv = None
        sad = pyr_c[4].astype(jnp.int32)  # placeholder output
        done = 0
        for lev in range(4, -1, -1):
            if done >= n_levels_done:
                break
            done += 1
            c, r = pyr_c[lev], pyr_r[lev]
            bs_y = max(4, bs >> lev) if lev else bs
            h, w = c.shape
            h = h // bs_y * bs_y
            w = w // bs_y * bs_y
            nby, nbx = h // bs_y, w // bs_y
            cb = me_mod._to_blocks(c[:h, :w].astype(jnp.int32), nby, bs_y,
                                   nbx, bs_y)
            P = me_mod._pad_ref(r[:h, :w], margin)
            if mv is None:
                zero = jnp.zeros((nby, nbx), jnp.int32)
                my, mx, sad = me_mod._patch_refine(cb, P, zero, zero,
                                                   nby, nbx, bs_y, bs_y,
                                                   8, margin)
            else:
                hint = mv * 2
                hy, hx = hint.shape[0], hint.shape[1]
                ys = jnp.clip((jnp.arange(nby) * hy) // nby, 0, hy - 1)
                xs = jnp.clip((jnp.arange(nbx) * hx) // nbx, 0, hx - 1)
                hint = jnp.clip(hint[ys[:, None], xs[None, :]], -B, B)
                my, mx, sad = me_mod._patch_refine(cb, P, hint[..., 0],
                                                   hint[..., 1], nby, nbx,
                                                   bs_y, bs_y, 2, margin)
            mv = jnp.stack([my, mx], axis=-1)
        if mv is None:
            return sad.sum()
        return mv[..., 0].sum() + sad.sum()
    return fn


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.uint8))
    ref = jnp.asarray(np.roll(np.asarray(cur), 3, axis=1))
    for k in range(6):
        timeit(f"pyramid + {k} levels", jax.jit(make_prefix(k)), cur, ref)


if __name__ == "__main__":
    main()
