"""Isolate the fused P-step / ME cost deltas (1080p, one chip).

nohup python tools/profile_me.py > /tmp/profile_me.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.encoder import me as me_mod
from schroedinger_tpu.encoder import inter as ei

W, H = 1920, 1080


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    g = GopEncoder(VideoFormat(width=W, height=H, clean_width=W,
                               clean_height=H,
                               chroma_format=ChromaFormat.C420,
                               frame_rate_numerator=25,
                               frame_rate_denominator=1),
                   gop_length=100, mv_precision=2)
    p = g._params(1)
    y = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    ref_y = jnp.asarray(np.roll(np.asarray(y), 3, axis=1))
    xnb, ynb = p.x_num_blocks, p.y_num_blocks

    for levels, cands in ((3, False), (5, False), (5, True)):
        fn = jax.jit(me_mod.make_me_body(H, W, p.xbsep_luma, p.ybsep_luma,
                                         xnb, ynb, levels=levels,
                                         candidates=cands))
        timeit(f"me levels={levels} candidates={cands}", fn, y, ref_y)

    # fused P-step, current configuration (me_levels=5)
    u = jnp.asarray(rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8))
    from schroedinger_tpu.decoder.core import RefFrame
    rf = RefFrame((np.asarray(y), np.asarray(u), np.asarray(v)))
    ups = rf.get_upsampled()
    jax.block_until_ready(ups)
    qi_bands = jnp.asarray(np.full(10, 16, np.int32))
    packed = jnp.concatenate([y.ravel(), u.ravel(), v.ravel()])
    for lv in (3, 5):
        stepfn, _sh, _lay = ei._get_p_step(p, me_levels=lv)
        timeit(f"FUSED pstep me_levels={lv}", stepfn, packed, ref_y,
               ups[0], ups[1], ups[2], qi_bands)


if __name__ == "__main__":
    main()
