"""Isolate pallas patch-refine cost: DMA count vs roll vs SAD compute.

Variants (fine-level 1080p geometry, varied inputs, honest fetches):
  full    — the real kernel
  noroll  — skip the lane roll (wrong results; times DMA + SAD)
  onedma  — one DMA per program instead of per block (wrong; times SAD)
  nosad   — DMAs + rolls, single candidate (times data movement)
nohup python tools/profile_pk_parts.py > /tmp/pk_parts.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nby, nbx, bs, rad = 68, 128, 16, 2
bound = 124
margin = bound + 2 * 8 + 16
N = 6


def build(variant):
    K = 2 * rad + 1
    ph = bs + 2 * rad
    pw = bs + 2 * rad
    PH = (ph + 7 + 7) // 8 * 8
    WW = (pw + 127 + 127) // 128 * 128
    CHUNK = 64
    nchunks = -(-nbx // CHUNK)
    nbx_pad = nchunks * CHUNK
    Hp = nby * bs + 2 * margin
    Wp = nbx * bs + 2 * margin
    max_wy = (nby - 1) * bs + margin - rad + bound
    max_wx = (nbx_pad - 1) * bs + margin - rad + bound
    Hp_pad = (max(Hp, max_wy + PH) + 7) // 8 * 8
    Wp_pad = (max(Wp, max_wx + WW) + 127) // 128 * 128
    row_base = margin - rad

    def kernel(mvy_ref, mvx_ref, mvy_v, mvx_v, cur_ref, p_hbm,
               dy_ref, dx_ref, sad_ref, strip1, strip2, psem):
        g = pl.program_id(0)
        i = g // nchunks
        c = g % nchunks

        def window(k):
            bx = c * CHUNK + k
            mvy = mvy_ref[i, bx]
            mvx = mvx_ref[i, bx]
            wy = i * bs + row_base + mvy
            wx = bx * bs + row_base + mvx
            wy_al = pl.multiple_of((wy // 8) * 8, 8)
            wx_al = pl.multiple_of((wx // 128) * 128, 128)
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(wy_al, PH), pl.ds(wx_al, WW)],
                strip1.at[k], psem)

        if variant == "onedma":
            cp = window(0)
            cp.start()
            cp.wait()
        else:
            jax.lax.fori_loop(0, CHUNK,
                              lambda k, _: (window(k).start(), 0)[1], 0)

            def finish(k, _):
                window(k).wait()
                if variant != "noroll":
                    bx = c * CHUNK + k
                    mvx = mvx_ref[i, bx]
                    s_off = (bx * bs + row_base + mvx) % 128
                    rolled = pltpu.roll(strip1[k], (WW - s_off) % WW,
                                        axis=1)
                    strip2[k] = rolled[:, :128]
                return _

            jax.lax.fori_loop(0, CHUNK, finish, 0)

        src = strip1 if variant in ("noroll", "onedma") else strip2
        cur_t = cur_ref[0, 0]
        mvy_col = mvy_v[0, 0]
        mvx_col = mvx_v[0, 0]
        rem = (i * bs + row_base + mvy_col) % 8
        big = jnp.int32(2 ** 30)
        best_sad = jnp.full((CHUNK, 1), big, jnp.int32)
        best_a = jnp.zeros((CHUNK, 1), jnp.int32)
        best_b = jnp.zeros((CHUNK, 1), jnp.int32)
        nc = 1 if variant == "nosad" else K + 7
        for r in range(nc):
            a_eff = r - rem
            valid = jnp.logical_and(a_eff >= 0, a_eff < K)
            for b in range(1 if variant == "nosad" else K):
                v = src[:, r:r + bs, b:b + bs]
                t = jnp.sum(jnp.abs(cur_t - v), axis=2, dtype=jnp.int32)
                s = jnp.sum(t, axis=1, keepdims=True)
                take = jnp.logical_and(valid, s < best_sad)
                best_sad = jnp.where(take, s, best_sad)
                best_a = jnp.where(take, a_eff, best_a)
                best_b = jnp.where(take, b, best_b)
        dy_ref[0, 0] = mvy_col + best_a - rad
        dx_ref[0, 0] = mvx_col + best_b - rad
        sad_ref[0, 0] = best_sad

    imap3 = lambda g: (g // nchunks, g % nchunks, 0, 0)       # noqa: E731
    imap4 = lambda g: (g // nchunks, g % nchunks, 0, 0, 0)    # noqa: E731
    colspec = pl.BlockSpec((1, 1, CHUNK, 1), imap3,
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(nby * nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  colspec, colspec,
                  pl.BlockSpec((1, 1, CHUNK, bs, bs), imap4,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[colspec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nby, nchunks, CHUNK, 1),
                                        jnp.int32)] * 3,
        scratch_shapes=[pltpu.VMEM((CHUNK, PH, WW), jnp.int32),
                        pltpu.VMEM((CHUNK, PH, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA])

    def fn(cur4, P32, mvy, mvx):
        mvy4 = mvy.reshape(nby, nchunks, CHUNK, 1)
        mvx4 = mvx.reshape(nby, nchunks, CHUNK, 1)
        cur5 = cur4.reshape(nby, nchunks, CHUNK, bs, bs)
        return call(mvy, mvx, mvy4, mvx4, cur5, P32)

    return jax.jit(fn), Hp_pad, Wp_pad, Hp, Wp


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    curs = [jnp.asarray(rng.integers(0, 255, (nby, nbx, bs, bs)),
                        jnp.int32) for _ in range(N)]
    mvs = [(jnp.asarray(rng.integers(-120, 120, (nby, nbx)), jnp.int32),
            jnp.asarray(rng.integers(-120, 120, (nby, nbx)), jnp.int32))
           for _ in range(N)]
    for variant in ("full", "noroll", "onedma", "nosad"):
        fn, Hp_pad, Wp_pad, Hp, Wp = build(variant)
        P32 = jnp.asarray(rng.integers(0, 255, (Hp_pad, Wp_pad)), jnp.int32)
        out = fn(curs[0], P32, *mvs[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        acc = 0
        for c, (my, mx) in zip(curs, mvs):
            _, _, sad = fn(c, P32, my, mx)
            acc += int(np.asarray(sad.sum()))
        dt = (time.perf_counter() - t0) / N
        print(f"{variant}: {dt*1000:.2f} ms/call (acc={acc})", flush=True)


if __name__ == "__main__":
    main()
