"""Breadth datapoints: interlaced SD field coding + 10-bit 4:2:2 intra.

VERDICT r3 item 10: the reference's tested deep/interlaced configs
(RELEASE:36-39) need evidence beyond unit-test sizes.  This measures:

  1. 720x576i25 (SD PAL) long-GOP interlaced encode: fps + decoder
     conformance (ours vs the reference decoder, bit-exact).
  2. 1280x720 10-bit 4:2:2 main-intra encode (the reference's tested
     deep config): fps + our own decoder round trip (the compiled
     oracle rejects >8-bit streams, SURVEY RELEASE:36-39 — deep decode
     conformance is covered by the byte-exact unit tests).

  nohup env SCHRO_THREADS=1 python tools/bench_breadth.py \
      > /tmp/bench_breadth.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SCHRO_THREADS", "1")

N = int(os.environ.get("BREADTH_FRAMES", "24"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def interlaced_sd():
    from schroedinger_tpu.api import Decoder, Encoder
    from schroedinger_tpu.config import EncoderConfig
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    from oracle import schro_oracle as so
    W, H = 720, 576
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 64 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
    frames = []
    for i in range(N):
        y = (np.roll(base, 2 * i, axis=1) + rng.normal(0, 4, (H, W))
             ).clip(0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append((y, u, v))
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=25, frame_rate_denominator=1)
    def mkcfg():
        return EncoderConfig(rate_control="constant_bitrate",
                             bitrate=4_000_000, interlaced_coding=True,
                             mv_precision=2)

    def mkvf():
        return VideoFormat(width=W, height=H, clean_width=W,
                           clean_height=H, chroma_format=ChromaFormat.C420,
                           frame_rate_numerator=25, frame_rate_denominator=1)

    Encoder(mkvf(), mkcfg()).encode_stream(frames[:2])   # compile warmup
    vf = mkvf()
    enc = Encoder(vf, mkcfg())
    t0 = time.perf_counter()
    stream = enc.encode_stream(frames)
    fps = N / (time.perf_counter() - t0)
    log(f"interlaced SD: {fps:.2f} fps, {len(stream)} bytes")
    ref = so.decode(stream, W, H)           # field pictures
    mine_frames = Decoder().decode_stream(stream)   # woven frames
    from schroedinger_tpu import frontends as ff
    ok = len(mine_frames) == N
    for i, fr in enumerate(mine_frames):
        f1, f2 = ff.split_fields(fr, tff=True)
        for m3, r3 in zip((f1, f2), (ref[2 * i], ref[2 * i + 1])):
            for m, r in zip(m3, r3):
                ok = ok and np.array_equal(m, r)
    return {"interlaced_sd_fps": round(fps, 3),
            "interlaced_sd_bytes": len(stream),
            "interlaced_sd_conformance": "bit-exact vs reference decoder"
            if ok else "MISMATCH"}


def deep_422_intra():
    from schroedinger_tpu.encoder import intra as ei
    from schroedinger_tpu.decoder.core import StreamDecoder
    from schroedinger_tpu import bitstream as bs
    from schroedinger_tpu.params import Params, subband_count
    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    from schroedinger_tpu.wavelets import Wavelet
    W, H = 1280, 720
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 512 + 256 * np.sin(xx / 19.0) * np.cos(yy / 13.0)
    frames = []
    for i in range(max(N // 2, 8)):
        y = (np.roll(base, i, axis=1) + rng.normal(0, 8, (H, W))
             ).clip(0, 1013).astype(np.uint16)
        u = np.full((H, W // 2), 512, np.uint16)
        v = np.full((H, W // 2), 512, np.uint16)
        frames.append((y, u, v))
    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C422,
                     luma_offset=64, luma_excursion=876,
                     chroma_offset=512, chroma_excursion=896)
    assert vf.bit_depth == 10, vf.bit_depth
    p = Params(video_format=vf, num_refs=0, transform_depth=3,
               wavelet_filter_index=Wavelet.DESLAURIERS_DUBUC_9_7)
    p.set_default_codeblocks()
    p.set_default_quant_matrix()
    nb = subband_count(p.transform_depth)
    qis = {(c, i): np.full((1, 1), 12, np.int32)
           for c in range(3) for i in range(nb)}
    chain = bs.OffsetChain()
    # warmup (compile)
    ei.encode_picture(frames[0], p, 0, quant_indices=qis, is_ref=False)
    t0 = time.perf_counter()
    units = []
    for i, f in enumerate(frames):
        units.append(chain.add(
            [bs.write_sequence_header(vf, profile=2, level=0),
             ei.encode_picture(f, p, i, quant_indices=qis, is_ref=False)]))
    fps = len(frames) / (time.perf_counter() - t0)
    stream = b"".join(units) + chain.add([bs.make_eos_unit()],
                                         final_eos=True)
    log(f"deep 10-bit 4:2:2 intra 720p: {fps:.2f} fps, "
        f"{len(stream)} bytes")
    out = StreamDecoder().decode_stream(stream)
    ok = len(out) == len(frames)
    err = 0.0
    for g3, o3 in zip(out, frames):
        err = max(err, float(np.abs(g3[0].astype(np.int64)
                                    - o3[0].astype(np.int64)).max()))
    return {"deep422_intra_fps": round(fps, 3),
            "deep422_intra_bytes": len(stream),
            "deep422_intra_frames_ok": ok,
            "deep422_intra_max_err": err}


def main():
    out = {}
    out.update(interlaced_sd())
    out.update(deep_422_intra())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
