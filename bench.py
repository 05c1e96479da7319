"""Benchmark: 1080p25 Dirac long-GOP CBR encode at matched bitrate.

BASELINE.md north-star config 3 ("Dirac long-GOP 1080p25, hier-BM + OBMC,
GOP=24, CBR": >=3x reference single-core frames/s per chip AT FIXED PSNR).
Both encoders run CBR at the same bitrate with the same GOP structure
(backref, GOP 24) on the same content; the JSON line reports our
steady-state frames/s, the fps ratio, and the decoded PSNR of both
streams so the speedup is a fixed-quality claim (the reference's own
methodology, misc/benchenc:27-30, pinned to one core via SCHRO_THREADS=1).

Legs (all in the one JSON line):
  - headline: pan+noise clip encode, ours vs oracle (value/vs_baseline)
  - equal-bytes PSNR: whenever the byte spend differs by >2% in either
    direction, ours re-runs CBR at the oracle's achieved rate so
    psnr_ours_at_ref_bytes_db is a true matched-spend comparison
  - content sweep: zoom+rotation (breaks translational ME) and scene-cut
    (exercises GOP cut under CBR) clips, fps+PSNR both sides
  - decode: our StreamDecoder vs oracle single-core decoding the SAME
    stream (the reference ships decode benches, misc/benchdec:1-30)

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
N_FRAMES_EXTRA = int(os.environ.get("BENCH_FRAMES_EXTRA", "32"))
BITRATE = int(os.environ.get("BENCH_BITRATE", "8000000"))
GOP = 24
FPS = 25
SKIP_EXTRA = os.environ.get("BENCH_SKIP_EXTRA", "") not in ("", "0")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _chroma(xx, yy):
    u = (128 + 24 * np.cos(xx[::2, ::2] / 31.0)).clip(0, 255).astype(np.uint8)
    v = (128 + 24 * np.sin(yy[::2, ::2] / 29.0)).clip(0, 255).astype(np.uint8)
    return u, v


def make_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base_y = 128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    u, v = _chroma(xx, yy)
    frames = []
    for i in range(n):
        # horizontal pan + noise: gives ME real work, like a camera move
        y = (np.roll(base_y, i * 2, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def make_frames_zoomrot(n):
    """Slow zoom + rotation about the frame centre: translational block ME
    cannot follow this globally, so the RD split / mode decision and OBMC
    do the quality work (the content class where encoders differ)."""
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:H, 0:W]
    u, v = _chroma(xx, yy)
    cy, cx = H / 2.0, W / 2.0
    frames = []
    for i in range(n):
        ang = 0.004 * i                      # ~0.23 deg/frame
        scale = 1.0 + 0.002 * i              # 0.2%/frame zoom
        ca, sa = np.cos(ang) / scale, np.sin(ang) / scale
        sx = ca * (xx - cx) - sa * (yy - cy) + cx
        sy = sa * (xx - cx) + ca * (yy - cy) + cy
        y = (128 + 52 * np.sin(sx / 17.0) * np.cos(sy / 13.0)
             + 28 * np.sin((sx + 2 * sy) / 53.0)
             + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def make_frames_scenecut(n, cut_every=11):
    """Pan content with hard scene cuts every `cut_every` frames (off the
    GOP grid), exercising scene-change detection + CBR reallocation."""
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:H, 0:W]
    u, v = _chroma(xx, yy)
    scenes = [128 + 64 * np.sin(xx / p) * np.cos(yy / q)
              for (p, q) in ((37.0, 23.0), (11.0, 47.0), (71.0, 13.0))]
    frames = []
    for i in range(n):
        base = scenes[(i // cut_every) % len(scenes)]
        y = (np.roll(base, i * 3, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
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
        # tworef/BBBP engine — the reference's own default (adaptive ->
        # tworef, schroencoder.c:599-604); the oracle side runs the same
        return GopEncoder(vf, gop_length=GOP, mv_precision=2,
                          bitrate=bitrate, fps=FPS,
                          gop_structure="biref")

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


def bench_oracle(frames, bitrate=BITRATE, tag="oracle"):
    from oracle import schro_oracle as so
    t0 = time.perf_counter()
    # rate_control 1 = the reference's actual CBR mode (TM5 + reservoir
    # padding), the same mode ours runs — both sides hold the SAME spend,
    # so the PSNR comparison is at equal rate by construction.
    # gop_structure 0 = adaptive -> the reference's default tworef/BBBP
    # engine (schroencoder.c:599-604), the strongest configuration of the
    # reference and the structural twin of our biref engine.
    out = so.encode(frames, W, H,
                    settings={"gop_structure": 0,
                              "rate_control": 1, "bitrate": bitrate,
                              "au_distance": GOP})
    dt = time.perf_counter() - t0
    log(f"{tag} long-GOP CBR (1 core): {len(frames)/dt:.3f} fps, "
        f"{len(out)} bytes")
    return len(frames) / dt, out


def bench_decode(stream, n_frames):
    """Decode the SAME stream with our StreamDecoder (TPU) and the oracle
    (single core); returns (ours_fps, oracle_fps)."""
    from schroedinger_tpu.decoder.pipeline import PipelinedStreamDecoder
    from oracle import schro_oracle as so
    t0 = time.perf_counter()
    PipelinedStreamDecoder().decode_stream(stream)   # compile warmup
    log(f"decode warmup (incl compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = PipelinedStreamDecoder().decode_stream(stream)
    dt_ours = time.perf_counter() - t0
    assert len(out) == n_frames, (len(out), n_frames)
    t0 = time.perf_counter()
    so.decode(stream, W, H)
    dt_ref = time.perf_counter() - t0
    log(f"decode: ours {n_frames/dt_ours:.3f} fps, "
        f"oracle {n_frames/dt_ref:.3f} fps")
    return n_frames / dt_ours, n_frames / dt_ref


def content_leg(name, frames, diags):
    """Encode a content class both sides at BITRATE; record fps + PSNR."""
    from oracle import schro_oracle as so
    try:
        fps_o, st_o = bench_ours(frames, warmup=False, tag=f"ours-{name}")
        fps_r, st_r = bench_oracle(frames, tag=f"oracle-{name}")
        diags[f"{name}_fps_ours"] = round(fps_o, 3)
        diags[f"{name}_fps_ref"] = round(fps_r, 3)
        diags[f"{name}_vs"] = round(fps_o / fps_r, 3)
        diags[f"{name}_psnr_ours_db"] = round(
            mean_psnr(so.decode(st_o, W, H), frames), 2)
        diags[f"{name}_psnr_ref_db"] = round(
            mean_psnr(so.decode(st_r, W, H), frames), 2)
        diags[f"{name}_bytes_ours"] = len(st_o)
        diags[f"{name}_bytes_ref"] = len(st_r)
    except Exception as e:
        log(f"{name} leg failed: {e!r}")
        diags[f"{name}_error"] = repr(e)


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
        if ref_stream and abs(len(ours_stream) - len(ref_stream)) \
                > 0.02 * len(ref_stream):
            # equal-bytes quality check, BOTH directions (under- or
            # over-spend >2%): re-run ours CBR at the oracle's achieved
            # rate so the PSNR comparison is at matched spend
            matched_rate = int(len(ref_stream) * 8 * FPS / N_FRAMES)
            _, matched = bench_ours(frames, bitrate=matched_rate,
                                    warmup=False, tag="ours-matched")
            bytes_matched = len(matched)
            psnr_matched = round(mean_psnr(so.decode(matched, W, H),
                                           frames), 2)
            log(f"equal-bytes: ours {psnr_matched} dB @{bytes_matched}B "
                f"vs oracle {psnr_ref} dB @{len(ref_stream)}B")
        else:
            psnr_matched = psnr_ours
            bytes_matched = len(ours_stream)
    except Exception as e:
        log(f"psnr check failed: {e!r}")

    diags = {}
    if not SKIP_EXTRA:
        content_leg("zoomrot", make_frames_zoomrot(N_FRAMES_EXTRA), diags)
        content_leg("scenecut", make_frames_scenecut(N_FRAMES_EXTRA), diags)
        try:
            dec_ours, dec_ref = bench_decode(ours_stream, N_FRAMES)
            diags["decode_fps_ours"] = round(dec_ours, 3)
            diags["decode_fps_ref"] = round(dec_ref, 3)
            diags["decode_vs"] = round(dec_ours / dec_ref, 3)
        except Exception as e:
            log(f"decode leg failed: {e!r}")
            diags["decode_error"] = repr(e)

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
        **diags,
    }))


if __name__ == "__main__":
    main()
