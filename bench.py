"""Benchmark: 1080p25 Dirac long-GOP CBR encode at matched bitrate.

BASELINE.md north-star config 3 ("Dirac long-GOP 1080p25, hier-BM + OBMC,
GOP=24, CBR": >=3x reference single-core frames/s per chip AT FIXED PSNR).
Both encoders run CBR at the same bitrate with the same GOP structure
(backref, GOP 24) on the same content; the JSON line reports our
steady-state frames/s, the fps ratio, and the decoded PSNR of both
streams so the speedup is a fixed-quality claim (the reference's own
methodology, misc/benchenc:27-30, pinned to one core via SCHRO_THREADS=1).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", ...diagnostics}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SCHRO_THREADS", "1")   # oracle single core

W, H = 1920, 1080
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "50"))
BITRATE = int(os.environ.get("BENCH_BITRATE", "8000000"))
GOP = 24
FPS = 25


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


def mean_psnr(decoded, frames):
    vals = []
    for g3, o3 in zip(decoded, frames):
        mse = np.mean((g3[0].astype(np.float64) - o3[0].astype(np.float64))
                      ** 2)
        vals.append(99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse))
    return float(np.mean(vals))


def bench_ours(frames, bitrate=BITRATE, warmup=True, tag="ours"):
    from schroedinger_tpu.encoder.gop import GopEncoder
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=FPS, frame_rate_denominator=1)

    def enc():
        return GopEncoder(vf, gop_length=GOP, mv_precision=2,
                          bitrate=bitrate, fps=FPS)

    if warmup:
        t0 = time.perf_counter()
        enc().encode_stream(frames[:2])   # compile warm-up (intra + P step)
        log(f"warmup (incl compile): {time.perf_counter() - t0:.1f}s")
    g = enc()
    t0 = time.perf_counter()
    out = g.encode_stream(frames)
    dt = time.perf_counter() - t0
    log(f"{tag} long-GOP CBR@{bitrate}: {len(frames)/dt:.3f} fps "
        f"({dt/len(frames)*1000:.0f} ms/frame), {len(out)} bytes")
    return len(frames) / dt, out


def bench_oracle(frames):
    from oracle import schro_oracle as so
    t0 = time.perf_counter()
    # rate_control 1 = the reference's actual CBR mode (TM5 + reservoir
    # padding), the same mode ours runs — both sides hold the SAME spend,
    # so the PSNR comparison is at equal rate by construction
    out = so.encode(frames, W, H,
                    settings={"gop_structure": 2, "queue_depth": 1,
                              "rate_control": 1, "bitrate": BITRATE,
                              "au_distance": GOP})
    dt = time.perf_counter() - t0
    log(f"oracle long-GOP CBR (1 core): {len(frames)/dt:.3f} fps, "
        f"{len(out)} bytes")
    return len(frames) / dt, out


def main():
    frames = make_frames(N_FRAMES)
    ours_fps, ours_stream = bench_ours(frames)
    try:
        ref_fps, ref_stream = bench_oracle(frames)
    except Exception as e:
        log(f"oracle failed: {e!r}")
        ref_fps, ref_stream = float("nan"), b""

    psnr_ours = psnr_ref = psnr_matched = None
    bytes_matched = 0
    try:
        from oracle import schro_oracle as so
        psnr_ours = round(mean_psnr(so.decode(ours_stream, W, H), frames), 2)
        if ref_stream:
            psnr_ref = round(mean_psnr(so.decode(ref_stream, W, H),
                                       frames), 2)
        log(f"PSNR ours {psnr_ours} dB / oracle {psnr_ref} dB; "
            f"bytes ours {len(ours_stream)} / oracle {len(ref_stream)}")
        if ref_stream and len(ours_stream) > 1.15 * len(ref_stream):
            # equal-bytes quality check: re-run ours CBR at the oracle's
            # achieved bitrate so the PSNR comparison is at matched spend
            matched_rate = int(len(ref_stream) * 8 * FPS / N_FRAMES)
            _, matched = bench_ours(frames, bitrate=matched_rate,
                                    warmup=False, tag="ours-matched")
            bytes_matched = len(matched)
            psnr_matched = round(mean_psnr(so.decode(matched, W, H),
                                           frames), 2)
            log(f"equal-bytes: ours {psnr_matched} dB @{bytes_matched}B "
                f"vs oracle {psnr_ref} dB @{len(ref_stream)}B")
    except Exception as e:
        log(f"psnr check failed: {e!r}")

    print(json.dumps({
        "metric": "longgop_1080p_cbr_encode",
        "value": round(ours_fps, 3),
        "unit": "frames/s",
        "vs_baseline": (round(ours_fps / ref_fps, 3)
                        if ref_fps == ref_fps else None),
        "psnr_ours_db": psnr_ours,
        "psnr_ref_db": psnr_ref,
        "psnr_ours_at_ref_bytes_db": psnr_matched,
        "bytes_ours": len(ours_stream),
        "bytes_ref": len(ref_stream),
        "bytes_ours_matched": bytes_matched,
        "bitrate": BITRATE,
        "n_frames": N_FRAMES,
    }))


if __name__ == "__main__":
    main()
