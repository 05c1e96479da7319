"""Replay the faulting 1-ref `front` program on captured inputs.

Usage (after a SCHRO_TPU_DUMP_STAGE=front:/tmp/front_args.npz run):

    SCHRO_TPU_FRONT_TRUNC=k python tools/repro_front.py /tmp/front_args.npz

k = 1 (ME only), 2 (+subpel/dc), 3 (+RD split), 4 (+render), 0 (full).
Each invocation is one fresh process/backend so a worker fault in one
truncation level doesn't poison the next.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/front_args.npz"
    trunc = os.environ.get("SCHRO_TPU_FRONT_TRUNC", "0")
    data = np.load(path)
    args = [data[f"a{i}"] for i in range(len(data.files))]
    print(f"loaded {len(args)} args: {[a.shape for a in args]}", flush=True)

    import jax
    import jax.numpy as jnp

    import bench
    from schroedinger_tpu.encoder import inter as ei_inter
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    vf = VideoFormat(width=bench.W, height=bench.H,
                     clean_width=bench.W, clean_height=bench.H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    g = GopEncoder(vf, gop_length=24, mv_precision=2,
                   bitrate=8000000, fps=25, gop_structure="biref")
    p = g._params(1)
    qargs = g._quant_args("P", p)
    kw = g._step_variant_kw(True, qargs)
    print(f"variant kw: {kw}", flush=True)
    stepfn, shapes3, layout = ei_inter._get_p_step(p, **kw)
    front_j = jax.jit(layout["front"])
    jargs = [jnp.asarray(a) for a in args]
    t0 = time.perf_counter()
    outs = front_j(jargs[0], *jargs[1:])
    # block_until_ready does not round-trip the axon tunnel; fetch every
    # output leaf so completion (or the fault) is actually observed
    leaves = [np.asarray(jax.device_get(o))
              for o in jax.tree_util.tree_leaves(outs)]
    print(f"TRUNC={trunc} OK in {time.perf_counter() - t0:.1f}s; "
          f"sums {[float(np.float64(l.astype(np.float64).sum())) for l in leaves[:4]]}",
          flush=True)


if __name__ == "__main__":
    main()
