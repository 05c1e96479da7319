"""Single-chip 4K long-GOP CBR encode timing (BASELINE config 4's
per-chip cost; results recorded in PROFILE.md).

nohup python tools/bench_4k.py > /tmp/bench_4k.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 3840, 2160
N = int(os.environ.get("BENCH_FRAMES", "12"))
BITRATE = 24_000_000


def make_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base_y = 128 + 64 * np.sin(xx / 53.0) * np.cos(yy / 31.0)
    frames = []
    for i in range(n):
        y = (np.roll(base_y, i * 3, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 24 * np.cos(xx[::2, ::2] / 41.0)).astype(np.uint8)
        v = (128 + 24 * np.sin(yy[::2, ::2] / 37.0)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    import jax
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    print("devices:", jax.devices(), flush=True)
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    frames = make_frames(N)

    def enc():
        return GopEncoder(vf, gop_length=24, mv_precision=2,
                          bitrate=BITRATE, fps=25)

    t0 = time.perf_counter()
    enc().encode_stream(frames[:2])
    print(f"warmup (incl compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    g = enc()
    t0 = time.perf_counter()
    out = g.encode_stream(frames)
    dt = time.perf_counter() - t0
    print(f"4K long-GOP CBR@{BITRATE}: {N/dt:.3f} fps "
          f"({dt/N*1000:.0f} ms/frame), {len(out)} bytes", flush=True)

    try:
        from oracle import schro_oracle as so
        os.environ.setdefault("SCHRO_THREADS", "1")
        t0 = time.perf_counter()
        ref = so.encode(frames, W, H,
                        settings={"gop_structure": 2, "queue_depth": 1,
                                  "rate_control": 1, "bitrate": BITRATE,
                                  "au_distance": 24})
        dt = time.perf_counter() - t0
        print(f"oracle 4K CBR (1 core): {N/dt:.3f} fps, {len(ref)} bytes",
              flush=True)
    except Exception as e:
        print("oracle failed:", repr(e), flush=True)


if __name__ == "__main__":
    main()
