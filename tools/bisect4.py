"""Test Pallas viability on axon + MXU one-hot selection performance.

nohup python tools/bisect4.py > /tmp/bisect4.log 2>&1 &
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
UP_H, UP_W = 2176, 3840


def timeit(name, fn, *args, n=10):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    c32 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.int32))
    up = jnp.asarray(rng.integers(0, 255, (UP_H, UP_W), dtype=np.uint8))
    dy = jnp.asarray(rng.integers(-16, 16, (YB, XB), np.int32))

    # blocksum via pure matmul (both axes on MXU)
    py = (jnp.arange(YB)[:, None] ==
          (jnp.arange(H)[None, :] // BS)).astype(jnp.bfloat16)  # (68, 1088)
    px = ((jnp.arange(W)[:, None] // BS) ==
          jnp.arange(XB)[None, :]).astype(jnp.bfloat16)         # (1920, 120)

    @jax.jit
    def blocksum_mm(x):
        xf = x.astype(jnp.bfloat16)
        r = jnp.dot(py, xf, preferred_element_type=jnp.float32)
        return jnp.dot(r.astype(jnp.bfloat16), px,
                       preferred_element_type=jnp.float32)

    timeit("blocksum double-matmul bf16", blocksum_mm, c32)

    @jax.jit
    def blocksum_mm_f32(x):
        xf = x.astype(jnp.float32)
        r = jnp.dot(py.astype(jnp.float32), xf,
                    preferred_element_type=jnp.float32)
        return jnp.dot(r, px.astype(jnp.float32),
                       preferred_element_type=jnp.float32)

    timeit("blocksum double-matmul f32", blocksum_mm_f32, c32)

    # reduce_window blocksum
    @jax.jit
    def blocksum_rw(x):
        return jax.lax.reduce_window(x, 0, jax.lax.add, (BS, BS), (BS, BS),
                                     "VALID")

    a = timeit("blocksum reduce_window", blocksum_rw, c32)

    b = timeit("blocksum matmul again", blocksum_mm, c32)
    if a is not None and b is not None:
        print("agree:", np.array_equal(np.asarray(a),
                                       np.asarray(b).astype(np.int64)),
              flush=True)

    # row-band one-hot select on MXU: per block-row select 48 rows from a
    # static 176-row band  (the render row-gather replacement)
    band = jnp.asarray(rng.integers(0, 255, (YB, 176, UP_W // 2),
                                    dtype=np.uint8))
    roff = jnp.asarray(rng.integers(0, 128, (YB,), np.int32))

    @jax.jit
    def rowsel(band, roff):
        oh = (jnp.arange(48)[None, :, None] + roff[:, None, None]
              == jnp.arange(176)[None, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("jtr,jrx->jtx", oh, band.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    timeit("batched row one-hot select (68x48x176 @ 176x1920)", rowsel,
           band, roff)

    # Pallas trivial test
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k_double(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2

        @jax.jit
        def pallas_double(x):
            return pl.pallas_call(
                k_double,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        timeit("pallas trivial x*2", pallas_double, c32)

        # pallas blocksum: grid over row bands, reduce in VMEM
        def k_bsum(x_ref, o_ref):
            x = x_ref[:]                      # (BS, W) int32
            r = jnp.sum(x, axis=0)            # (W,)
            o_ref[:] = jnp.sum(r.reshape(XB, BS), axis=1).reshape(1, XB)

        @jax.jit
        def pallas_bsum(x):
            return pl.pallas_call(
                k_bsum,
                out_shape=jax.ShapeDtypeStruct((YB, XB), jnp.int32),
                grid=(YB,),
                in_specs=[pl.BlockSpec((BS, W), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, XB), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM),
            )(x)

        r = timeit("pallas blocksum", pallas_bsum, c32)
        if r is not None:
            ref = np.asarray(c32).reshape(YB, BS, XB, BS).sum((1, 3))
            print("pallas blocksum agree:",
                  np.array_equal(np.asarray(r), ref), flush=True)

        # pallas dynamic row slice from a VMEM band (render inner pattern)
        def k_dynsl(off_ref, band_ref, o_ref):
            j = 0
            acc = jnp.zeros((48, 128), jnp.int32)

            def body(i, acc):
                off = off_ref[i]
                patch = band_ref[pl.ds(off, 48), pl.ds(i * 16, 128)]
                return acc + patch.astype(jnp.int32)

            acc = jax.lax.fori_loop(0, XB, body, acc)
            o_ref[:] = acc

        @jax.jit
        def pallas_dynsl(off, band1):
            return pl.pallas_call(
                k_dynsl,
                out_shape=jax.ShapeDtypeStruct((48, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(off, band1)

        off = jnp.asarray(rng.integers(0, 128, (XB,), np.int32))
        band1 = jnp.asarray(rng.integers(0, 255, (176, UP_W), np.int8),
                            dtype=jnp.int8)
        timeit("pallas 120 dyn slices from VMEM band", pallas_dynsl,
               off, band1)
    except Exception as e:
        print("pallas import/setup failed:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
