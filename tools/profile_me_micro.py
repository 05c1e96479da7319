"""Micro-benchmarks of ME building blocks: downsample, pad, to_blocks."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from schroedinger_tpu.encoder import me as me_mod

H, W = 1088, 1920
margin = 156


def timeit(name, fn, *args, n=20):
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
    x = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.uint8))

    timeit("downsample2 (strided)", jax.jit(me_mod.downsample2), x)

    def ds_reshape(a):
        c = a.astype(jnp.int32)
        s = c.reshape(H // 2, 2, W // 2, 2).sum((1, 3))
        return ((s + 2) >> 2).astype(jnp.uint8)
    timeit("downsample2 (reshape-sum)", jax.jit(ds_reshape), x)

    def ds_pool(a):
        s = jax.lax.reduce_window(a.astype(jnp.int32), 0, jax.lax.add,
                                  (2, 2), (2, 2), "VALID")
        return ((s + 2) >> 2).astype(jnp.uint8)
    timeit("downsample2 (reduce_window)", jax.jit(ds_pool), x)

    def ds_dot(a):
        f = a.astype(jnp.float32)
        dr = jnp.zeros((H, H // 2), jnp.float32).at[
            jnp.arange(H), jnp.arange(H) // 2].set(1.0)
        dc = jnp.zeros((W, W // 2), jnp.float32).at[
            jnp.arange(W), jnp.arange(W) // 2].set(1.0)
        s = dr.T @ f @ dc
        return ((s + 2) // 4).astype(jnp.uint8)
    timeit("downsample2 (f32 matmul)", jax.jit(ds_dot), x)

    timeit("pad_ref edge (margin 156)",
           jax.jit(lambda a: me_mod._pad_ref(a, margin)), x)

    def pad_concat(a):
        top = jnp.broadcast_to(a[:1], (margin, W))
        bot = jnp.broadcast_to(a[-1:], (margin, W))
        v = jnp.concatenate([top, a, bot], 0)
        left = jnp.broadcast_to(v[:, :1], (H + 2 * margin, margin))
        right = jnp.broadcast_to(v[:, -1:], (H + 2 * margin, margin))
        return jnp.concatenate([left, v, right], 1)
    timeit("pad_ref concat-broadcast", jax.jit(pad_concat), x)

    timeit("to_blocks 16x16",
           jax.jit(lambda a: me_mod._to_blocks(a.astype(jnp.int32),
                                               68, 16, 120, 16)), x)

    # extraction (the vmapped dynamic_slice) at full res
    P = me_mod._pad_ref(x, margin)
    mv = jnp.zeros((68, 120), jnp.int32)
    timeit("extract_ref_patches r=2",
           jax.jit(lambda p, a, b: me_mod._extract_ref_patches(
               p, a, b, 68, 120, 16, 16, 2, margin)), P, mv, mv)

    cb = me_mod._to_blocks(x[:1088, :1920].astype(jnp.int32), 68, 16, 120, 16)
    timeit("patch_refine r=2 (prebuilt inputs)",
           jax.jit(lambda c, p, a, b: me_mod._patch_refine(
               c, p, a, b, 68, 120, 16, 16, 2, margin)), cb, P, mv, mv)


if __name__ == "__main__":
    main()
