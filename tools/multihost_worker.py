"""jax.distributed worker for the multi-host GOP-sharding dryrun.

Spawned N times by __graft_entry__.dryrun_multichip (and usable
standalone):

    python tools/multihost_worker.py <coordinator> <n_proc> <pid> <out>

Each process initializes jax.distributed on the CPU backend, encodes its
GOP-aligned chunk of a deterministic clip with the FLAGSHIP configuration
(tworef/BBBP engine + TM5 CBR, per-chunk reservoir: exact=False), gathers
every chunk's payload over the allgather path, and writes the merged
stream — which must be byte-identical across processes and to the
single-process sharded encode.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_frames(n=8, W=64, H=64):
    rng = np.random.default_rng(0)
    base = (128 + 60 * np.sin(np.arange(W) / 7.0)[None, :]
            * np.cos(np.arange(H) / 5.0)[:, None])
    out = []
    for i in range(n):
        y = (np.roll(base, 2 * i, axis=1)
             + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        out.append((y, u, v))
    return out


def make_encoder():
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    vf = VideoFormat(width=64, height=64, clean_width=64, clean_height=64,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    return GopEncoder(vf, gop_length=4, gop_structure="biref",
                      subgroup_length=2, bitrate=400000, fps=25,
                      enable_scene_change=False)


def main():
    coordinator, n_proc, pid, outpath = (sys.argv[1], int(sys.argv[2]),
                                         int(sys.argv[3]), sys.argv[4])
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_proc, process_id=pid)
    from schroedinger_tpu.parallel import gops

    merged = gops.encode_gops_multihost(make_frames(), make_encoder,
                                        exact=False)
    with open(outpath, "wb") as f:
        f.write(merged)
    print(f"proc {pid}/{n_proc}: merged {len(merged)} bytes", flush=True)


if __name__ == "__main__":
    main()
