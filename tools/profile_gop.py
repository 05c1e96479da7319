"""Profile the long-GOP 1080p encode: per-stage wall time breakdown.

Stages measured separately (serial, no pipelining) so we see where the
2.4 s/frame goes:
  - dispatch+block of the fused P-step (TPU compute)
  - device_get of quantised flats + MV fields (tunnel transfer)
  - host entropy coding (_write_p_unit: C++ motion + subband arith)
Run on TPU:  nohup python tools/profile_gop.py > /tmp/profile_gop.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from schroedinger_tpu.params import subband_count
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.encoder import inter as ei
from schroedinger_tpu.decoder.core import RefFrame

W, H = 1920, 1080
N = 6

def make_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base_y = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0))
    frames = []
    for i in range(n):
        # translate by i to give ME real motion
        y = (np.roll(base_y, i * 2, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 24 * np.cos(xx[::2, ::2] / 31.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 24 * np.sin(yy[::2, ::2] / 29.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    print("devices:", jax.devices(), flush=True)
    frames = make_frames(N)
    g = GopEncoder(VideoFormat(width=W, height=H, clean_width=W,
                               clean_height=H,
                               chroma_format=ChromaFormat.C420,
                               frame_rate_numerator=25,
                               frame_rate_denominator=1),
                   gop_length=100, mv_precision=2)
    p = g._params(1)

    # intra frame 0 to seed the reference
    t0 = time.perf_counter()
    g._encode_ref(frames[0], 0, True, 0.0)
    print(f"intra(incl compile): {time.perf_counter()-t0:.3f}s", flush=True)

    ref = g.ref_frames[g.last_ref]
    # warm up: full P-step compile
    t0 = time.perf_counter()
    pend = ei.start_inter_picture(frames[1], p, ref, base_qi=20)
    jax.block_until_ready(pend["outs"])
    print(f"pstep compile+run: {time.perf_counter()-t0:.3f}s", flush=True)
    unit, _ = ei.finish_inter_picture(pend, 1, 0)

    for it in range(3):
        t0 = time.perf_counter()
        pend = ei.start_inter_picture(frames[2 + it], p, ref, base_qi=20)
        jax.block_until_ready(pend["outs"][0])
        t1 = time.perf_counter()
        unit, _st = ei.finish_inter_picture(pend, 2 + it, 0)
        t4 = time.perf_counter()
        wbytes = pend["outs"][0].nbytes
        print(f"iter{it}: tpu={t1-t0:.3f}s  finish(xfer+entropy)={t4-t1:.3f}s "
              f"(wire {wbytes/1e6:.1f}MB) unit={len(unit)}B", flush=True)

    # also time the upsample (RefFrame.get_upsampled) since P-step needs it
    rf = RefFrame(tuple(pend["recon"]))
    t0 = time.perf_counter()
    ups = rf.get_upsampled()
    jax.block_until_ready(ups)
    print(f"upsample ref: {time.perf_counter()-t0:.3f}s", flush=True)

    # end-to-end steady state via encode_stream (pipelined)
    g2 = GopEncoder(VideoFormat(width=W, height=H, clean_width=W,
                                clean_height=H,
                                chroma_format=ChromaFormat.C420,
                                frame_rate_numerator=25,
                                frame_rate_denominator=1),
                    gop_length=100, mv_precision=2)
    g2.encode_stream(frames[:2])  # warm
    t0 = time.perf_counter()
    out = g2.encode_stream(frames)
    dt = time.perf_counter() - t0
    print(f"encode_stream: {N/dt:.3f} fps ({dt/N*1000:.0f} ms/frame), "
          f"{len(out)} bytes", flush=True)


if __name__ == "__main__":
    main()
