"""ME profile at 1080p: pallas on/off, pyramid depth, candidate stage.

(Consolidates the round-2 profile_me_* one-off scripts into one tool.)
nohup python tools/profile_me.py > /tmp/profile_me.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

W, H = 1920, 1080
XNB, YNB, BS = 120, 68, 16


def timeit(name, fn, *args, n=5):
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
    y = np.asarray(rng.integers(0, 255, (H, W)), np.uint8)
    ref = np.roll(y, 7, axis=1)
    yd = jax.device_put(jnp.asarray(y))
    rd = jax.device_put(jnp.asarray(ref))

    for pallas in ("1", "0"):
        os.environ["SCHRO_TPU_PALLAS_ME"] = pallas
        import importlib
        from schroedinger_tpu.encoder import me as me_mod
        me_mod = importlib.reload(me_mod)
        for levels in (5, 3):
            for cands in (True, False):
                fn = jax.jit(me_mod.make_me_body(
                    H, W, BS, BS, XNB, YNB, levels=levels,
                    candidates=cands))
                t0 = time.perf_counter()
                out = fn(yd, rd)
                jax.block_until_ready(out)
                dt0 = time.perf_counter() - t0
                timeit(f"pallas={pallas} levels={levels} cands={cands} "
                       f"(compile {dt0:.0f}s)", fn, yd, rd)


if __name__ == "__main__":
    main()
