"""Minimal repro: 1080p biref encode on the real chip, verbose staging.

    nohup python tools/repro_biref.py > /tmp/repro.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("REPRO_FRAMES", "8"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import bench
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    frames = bench.make_frames(N)
    vf = VideoFormat(width=bench.W, height=bench.H,
                     clean_width=bench.W, clean_height=bench.H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    def mk():
        return GopEncoder(vf, gop_length=24, mv_precision=2,
                          bitrate=8000000, fps=25, gop_structure="biref")

    if os.environ.get("REPRO_WARMUP"):
        t0 = time.perf_counter()
        mk().encode_stream(frames[:2])
        log(f"warmup instance done: {time.perf_counter() - t0:.1f}s")
    g = mk()
    out = bytearray()
    for i, f in enumerate(frames):
        t0 = time.perf_counter()
        out += g.encode_frame(f)
        log(f"frame {i}: {time.perf_counter() - t0:.1f}s, {len(out)} bytes")
    out += g.flush()
    log(f"done: {len(out)} bytes")
    from oracle import schro_oracle as so
    dec = so.decode(bytes(out), bench.W, bench.H)
    log(f"oracle decoded {len(dec)} frames OK")


if __name__ == "__main__":
    main()
