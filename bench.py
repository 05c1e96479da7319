"""Benchmark: 1080p VC-2 low-delay intra encode, frames/s vs reference.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = our frames/s divided by the reference encoder's single-core
frames/s measured on this machine (oracle build, same config).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H = 1920, 1080
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "4"))
BITRATE = 200_000_000


def make_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base_y = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0))
    frames = []
    for i in range(n):
        y = (base_y + rng.normal(0, 6, (H, W)) + i).clip(0, 255).astype(np.uint8)
        u = (128 + 24 * np.cos(xx[::2, ::2] / 31.0 + i)).clip(0, 255).astype(np.uint8)
        v = (128 + 24 * np.sin(yy[::2, ::2] / 29.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def bench_ours(frames):
    from schroedinger_tpu.api import Encoder
    from schroedinger_tpu.config import EncoderConfig
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    best = 0.0
    for path in ("direct", "table"):
        enc = Encoder(vf, EncoderConfig(rate_control="low_delay",
                                        bitrate=BITRATE,
                                        transform_depth=4, intra_wavelet=1))
        enc.ld_path = path
        enc.encode_stream(frames[:1])  # warm up compile
        t0 = time.perf_counter()
        enc.encode_stream(frames)
        dt = time.perf_counter() - t0
        best = max(best, len(frames) / dt)
    return best


def bench_oracle(frames):
    from oracle import schro_oracle as so
    t0 = time.perf_counter()
    so.encode(frames, W, H, settings={
        "rate_control": 2, "bitrate": BITRATE,
        "transform_depth": 4, "intra_wavelet": 1})
    dt = time.perf_counter() - t0
    return len(frames) / dt


def main():
    frames = make_frames(N_FRAMES)
    ours = bench_ours(frames)
    try:
        ref = bench_oracle(frames)
    except Exception:
        ref = float("nan")
    print(json.dumps({
        "metric": "lowdelay_1080p_encode",
        "value": round(ours, 3),
        "unit": "frames/s",
        "vs_baseline": round(ours / ref, 3) if ref == ref else None,
    }))


if __name__ == "__main__":
    main()
