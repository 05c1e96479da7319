"""Benchmark: 1080p25 Dirac long-GOP encode, frames/s vs reference.

This is the BASELINE.md north-star config ("Dirac long-GOP 1080p25,
hier-BM + OBMC, CBR/constant-quality": >=3x reference single-core
frames/s per chip).  Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline"}
vs_baseline = our steady-state frames/s divided by the reference encoder's
single-core frames/s (oracle build, same content, long-GOP backref
structure, SCHRO_THREADS=1) measured on this machine.

Side diagnostics (stream sizes, low-delay fps) go to stderr only.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H = 1920, 1080
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base_y = 128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    frames = []
    for i in range(n):
        # horizontal pan + noise: gives ME real work, like a camera move
        y = (np.roll(base_y, i * 2, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 24 * np.cos(xx[::2, ::2] / 31.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 24 * np.sin(yy[::2, ::2] / 29.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def bench_ours(frames):
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)

    def enc():
        return GopEncoder(vf, gop_length=100, mv_precision=2)

    t0 = time.perf_counter()
    enc().encode_stream(frames[:2])   # compile warm-up (intra + P step)
    log(f"warmup (incl compile): {time.perf_counter() - t0:.1f}s")
    g = enc()
    t0 = time.perf_counter()
    out = g.encode_stream(frames)
    dt = time.perf_counter() - t0
    log(f"ours long-GOP: {len(frames)/dt:.3f} fps "
        f"({dt/len(frames)*1000:.0f} ms/frame), {len(out)} bytes")
    return len(frames) / dt


def bench_oracle(frames):
    from oracle import schro_oracle as so
    t0 = time.perf_counter()
    out = so.encode(frames, W, H,
                    settings={"gop_structure": 2, "queue_depth": 1})
    dt = time.perf_counter() - t0
    log(f"oracle long-GOP (1 core): {len(frames)/dt:.3f} fps, "
        f"{len(out)} bytes")
    return len(frames) / dt


def main():
    frames = make_frames(N_FRAMES)
    ours = bench_ours(frames)
    try:
        ref = bench_oracle(frames)
    except Exception as e:
        log(f"oracle failed: {e!r}")
        ref = float("nan")
    print(json.dumps({
        "metric": "longgop_1080p_encode",
        "value": round(ours, 3),
        "unit": "frames/s",
        "vs_baseline": round(ours / ref, 3) if ref == ref else None,
    }))


if __name__ == "__main__":
    main()
