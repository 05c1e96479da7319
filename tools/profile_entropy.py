"""Measure the host-entropy share of a PIPELINED 1080p CBR encode.

VERDICT r1 item 5: "Profile the host C++ share of a pipelined 1080p CBR
encode; if >20% of wall time, implement the lane-parallel arith coder".
This runs the real pipelined path (GopEncoder.encode_stream, CBR) and
reports, from the always-on stage timers:

  - wall/frame (steady state, excluding warmup GOP)
  - p_entropy: host C++ arith coding (_write_p_unit) wall
  - p_transfer: device->host wire fetch wall
  - entropy share of wall = sum(p_entropy) / steady wall

Because entropy runs on the host WHILE the next frames' fused steps are
in flight on device, entropy share < 100% of its own wall can still be
fully hidden; the decisive comparison is steady fps with entropy coding
vs steady fps with entropy skipped (--no-entropy control run).

Run on TPU:
  nohup python tools/profile_entropy.py > /tmp/profile_entropy.log 2>&1 &
Results go into PROFILE.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 1920, 1080
N = int(os.environ.get("PROF_FRAMES", "30"))
BITRATE = 8_000_000


def make_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base_y = 128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    frames = []
    for i in range(n):
        y = (np.roll(base_y, i * 2, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + 24 * np.cos(xx[::2, ::2] / 31.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 24 * np.sin(yy[::2, ::2] / 29.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def run(skip_entropy: bool):
    from schroedinger_tpu.encoder import inter as ei
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.utils.telemetry import timers
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    if skip_entropy:
        # control run: identical transfers/unpacking, entropy replaced by
        # a fixed-size dummy unit (isolates the C++ coder's wall share)
        real = ei._write_p_unit

        def stub(*_a, **_kw):
            import numpy as _np
            return (b"BBCD" + bytes([0x0D]) + b"\x00" * 8 + b"\x00" * 2000,
                    _np.zeros(30))
        ei._write_p_unit = stub
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    frames = make_frames(N)
    enc = GopEncoder(vf, gop_length=N + 1, mv_precision=2,
                     bitrate=BITRATE, fps=25)
    enc.encode_stream(frames[:3])  # warmup/compile
    enc2 = GopEncoder(vf, gop_length=N + 1, mv_precision=2,
                      bitrate=BITRATE, fps=25)
    timers.reset()
    t0 = time.perf_counter()
    out = enc2.encode_stream(frames)
    wall = time.perf_counter() - t0
    if skip_entropy:
        ei._write_p_unit = real
    return wall, dict(timers.totals), dict(timers.counts), len(out)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    wall, tot, cnt, nbytes = run(skip_entropy=False)
    print(f"\n=== WITH entropy: {N} frames in {wall:.2f}s "
          f"({N / wall:.3f} fps, {wall / N * 1000:.0f} ms/frame), "
          f"{nbytes} bytes")
    for k in sorted(tot):
        print(f"  {k}: {tot[k]:.2f}s total, {tot[k]/max(cnt[k],1)*1000:.0f} "
              f"ms/frame x{cnt[k]}")
    ent = tot.get("p_entropy", 0.0)
    print(f"  entropy share of wall: {100.0 * ent / wall:.1f}%")

    wall0, tot0, cnt0, _ = run(skip_entropy=True)
    print(f"\n=== WITHOUT entropy (stub): {N} frames in {wall0:.2f}s "
          f"({N / wall0:.3f} fps)")
    hidden = (wall - wall0) / wall
    print(f"  exposed entropy cost: {wall - wall0:.2f}s = "
          f"{100.0 * hidden:.1f}% of wall")
    print(f"\nsummary: entropy_wall={ent:.2f}s share={100*ent/wall:.1f}% "
          f"exposed={100*hidden:.1f}%")


if __name__ == "__main__":
    main()
