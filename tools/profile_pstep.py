"""Break down the fused P-step device time by component (1080p).

nohup python tools/profile_pstep.py > /tmp/profile_pstep.log 2>&1 &
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
from schroedinger_tpu.ops import obmc

W, H = 1920, 1080


def timeit(name, fn, *args, n=3):
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
    u = jnp.asarray(rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8))
    ref_y = jnp.asarray(np.roll(np.asarray(y), 3, axis=1))

    xnb, ynb = p.x_num_blocks, p.y_num_blocks
    me_fn = jax.jit(me_mod.make_me_body(H, W, p.xbsep_luma, p.ybsep_luma,
                                        xnb, ynb))
    dy, dx, _sad = timeit("me (hier full-pel)", me_fn, y, ref_y)

    # upsampled planes for subpel + render
    from schroedinger_tpu.decoder.core import RefFrame
    rf = RefFrame((np.asarray(y), np.asarray(u), np.asarray(v)))
    ups = rf.get_upsampled()
    jax.block_until_ready(ups)

    sub_fn = jax.jit(me_mod.make_subpel_body(H, W, p.xbsep_luma,
                                             p.ybsep_luma, xnb, ynb, 2))
    dy2, dx2, _s2 = timeit("subpel refine (prec2)", sub_fn, y, ups[0],
                           dy, dx)

    ms_fn = jax.jit(lambda c: ei._dc_stats(c, p.ybsep_luma,
                                           p.xbsep_luma, ynb, xnb))
    timeit("dc_stats", ms_fn, y)

    render_body = obmc.make_render_body(p, 1)
    zero = jnp.zeros((ynb, xnb), jnp.int32)
    fields = {"pred_mode": jnp.ones((ynb, xnb), jnp.int32),
              "using_global": zero,
              "dx1": dx2.astype(jnp.int32), "dy1": dy2.astype(jnp.int32),
              "dx2": zero, "dy2": zero, "dc0": zero, "dc1": zero,
              "dc2": zero,
              "split": jnp.full((ynb, xnb), 2, jnp.int32)}
    render_fn = jax.jit(lambda f, u_: render_body(f, u_, None))
    preds = timeit("obmc render", render_fn, fields, tuple(ups))

    # residual transform + quant + recon (the _get_p_pipeline parts)
    tfn, rcfn, qrfn, shapes3 = ei._get_p_pipeline(p, want_recon=True)
    flats = timeit("fwd IWT x3", tfn, y, u, v, *preds)
    qi_bands = jnp.asarray(np.full(10, 16, np.int32))
    timeit("quant+recon(IIWT)", qrfn, *flats, *preds, qi_bands)
    timeit("rc_bits 61-way", rcfn, *flats)

    # full fused step for comparison
    stepfn, _shapes, _lay = ei._get_p_step(p)
    packed = jnp.concatenate([y.ravel(), u.ravel(), v.ravel()])
    timeit("FUSED pstep", stepfn, packed, ref_y, ups[0], ups[1], ups[2],
           qi_bands)


if __name__ == "__main__":
    main()
