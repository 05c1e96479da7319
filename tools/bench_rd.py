"""Rate-distortion sweep: ours vs oracle at 4/8/16 Mbps, BD-rate figure.

Runs the bench content (1080p25 pan+noise, 50 frames) through both
encoders in true CBR at each bitrate, decodes with the reference decoder,
and reports per-point (bytes, PSNR) plus the Bjontegaard delta-rate
(piecewise-cubic log-rate interpolation, the standard BD-rate method) of
ours vs the oracle.  Negative BD-rate = we need fewer bits for the same
quality.  Results go to PROFILE.md.

  nohup env SCHRO_THREADS=1 python tools/bench_rd.py \
      > /tmp/bench_rd.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SCHRO_THREADS", "1")

import bench  # noqa: E402  (reuses content + encoder drivers)

BITRATES = [int(b) for b in os.environ.get(
    "RD_BITRATES", "1000000,2000000,4000000,8000000").split(",")]
N = int(os.environ.get("RD_FRAMES", "32"))
# pan+noise content saturates at its noise-floor PSNR at ANY rate >=1
# Mbps (measured r5: 35.4 dB from 0.32MB to 4.9MB) and cannot produce a
# rate-distortion CURVE; the zoom+rotation clip has real detail whose
# quality moves with rate, so BD-rate is computed on it
CONTENT = os.environ.get("RD_CONTENT", "zoomrot")


def bd_rate(rate_ref, psnr_ref, rate_test, psnr_test):
    """Bjontegaard delta-rate (%): avg log-rate gap over the overlapping
    PSNR interval, cubic polyfit in (psnr -> log rate)."""
    lr_ref = np.log(np.asarray(rate_ref, np.float64))
    lr_test = np.log(np.asarray(rate_test, np.float64))
    p_ref = np.asarray(psnr_ref, np.float64)
    p_test = np.asarray(psnr_test, np.float64)
    deg = min(3, len(p_ref) - 1)
    c_ref = np.polyfit(p_ref, lr_ref, deg)
    c_test = np.polyfit(p_test, lr_test, deg)
    lo = max(p_ref.min(), p_test.min())
    hi = min(p_ref.max(), p_test.max())
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 200)
    avg = np.mean(np.polyval(c_test, xs) - np.polyval(c_ref, xs))
    return float((np.exp(avg) - 1.0) * 100.0)


def main():
    frames = (bench.make_frames_zoomrot(N, noise=1.0)
              if CONTENT == "zoomrot"
              else bench.make_frames(N))
    rows = []
    warm = True
    for br in BITRATES:
        fps_o, st_o = bench.bench_ours(frames, bitrate=br, warmup=warm,
                                       tag=f"ours@{br}")
        warm = False
        fps_r, st_r = bench.bench_oracle(frames, bitrate=br,
                                         tag=f"oracle@{br}")
        from oracle import schro_oracle as so
        p_o = bench.mean_psnr(so.decode(st_o, bench.W, bench.H), frames)
        p_r = bench.mean_psnr(so.decode(st_r, bench.W, bench.H), frames)
        rows.append({"bitrate": br,
                     "bytes_ours": len(st_o), "psnr_ours": round(p_o, 3),
                     "bytes_ref": len(st_r), "psnr_ref": round(p_r, 3),
                     "fps_ours": round(fps_o, 3),
                     "fps_ref": round(fps_r, 3)})
        print(json.dumps(rows[-1]), flush=True)

    bd = bd_rate([r["bytes_ref"] for r in rows],
                 [r["psnr_ref"] for r in rows],
                 [r["bytes_ours"] for r in rows],
                 [r["psnr_ours"] for r in rows])
    print(json.dumps({"metric": "bd_rate_vs_oracle_pct",
                      "value": round(bd, 2),
                      "note": "negative = ours needs fewer bits at equal "
                              "PSNR", "points": rows}))


if __name__ == "__main__":
    main()
