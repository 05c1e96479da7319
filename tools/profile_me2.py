"""Cache-proof ME timing: distinct inputs per call, scalar fetched each
iteration so remote result caching or lazy execution can't fake speed.
nohup python tools/profile_me2.py > /tmp/profile_me2.log 2>&1 &
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
N = 8


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    curs = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (H, W)), jnp.uint8)) for _ in range(N)]
    ref = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (H, W)), jnp.uint8))

    for pallas in ("1", "0"):
        os.environ["SCHRO_TPU_PALLAS_ME"] = pallas
        import importlib
        from schroedinger_tpu.encoder import me as me_mod
        me_mod = importlib.reload(me_mod)
        fn = jax.jit(me_mod.make_me_body(H, W, BS, BS, XNB, YNB, levels=3))
        out = fn(curs[0], ref)
        jax.block_until_ready(out)
        _ = int(np.asarray(out[2]).sum())
        t0 = time.perf_counter()
        acc = 0
        for c in curs:
            dy, dx, sad = fn(c, ref)
            acc += int(np.asarray(sad.sum()))
        dt = (time.perf_counter() - t0) / N
        print(f"pallas={pallas}: {dt*1000:.2f} ms/call (varied inputs, "
              f"fetched; acc={acc})", flush=True)


if __name__ == "__main__":
    main()
