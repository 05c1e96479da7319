"""Compiled-mode (real TPU) validation of the Pallas patch-refine kernel.

Runs the FULL hierarchical ME at 1080p block geometry (every per-level
kernel instantiation, including the (17, 30)-grid coarse level that broke
round 2's Mosaic lowering) twice — Pallas path vs jnp gather path — and
asserts bit-exactness.  Usage (CLAUDE.md: background TPU scripts):

    nohup python tools/check_pallas_tpu.py > /tmp/pallas_check.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(enabled):
    os.environ["SCHRO_TPU_PALLAS_ME"] = "1" if enabled else "0"
    import importlib
    from schroedinger_tpu.encoder import me as me_mod
    importlib.reload(me_mod)

    H, W = 1080, 1920
    xnb, ynb = 120, 68           # 1080p, 16x16 separation
    fn = me_mod.make_me_fn(H, W, 16, 16, xnb, ynb, levels=5)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    cur = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)).clip(
        0, 255).astype(np.uint8)
    ref = np.roll(cur, 7, axis=1)
    cur = jax.device_put(jnp.asarray(cur))
    ref = jax.device_put(jnp.asarray(ref))
    t0 = time.perf_counter()
    out = fn(cur, ref)
    jax.block_until_ready(out)
    print(f"pallas={enabled}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = fn(cur, ref)
        jax.block_until_ready(out)
    print(f"pallas={enabled}: {(time.perf_counter()-t0)/n*1000:.2f} ms/call",
          flush=True)
    return tuple(np.asarray(o) for o in out)


def main():
    print("devices:", jax.devices(), flush=True)
    a = run(True)
    b = run(False)
    ok = all(np.array_equal(x, y) for x, y in zip(a, b))
    print("bit-exact pallas vs jnp (compiled, 1080p all levels):", ok,
          flush=True)
    if not ok:
        for i, (x, y) in enumerate(zip(a, b)):
            print(f"  out[{i}] mismatches: {(x != y).sum()} / {x.size}")
        sys.exit(1)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
