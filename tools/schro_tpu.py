#!/usr/bin/env python3
"""schro_tpu — encode/decode CLI for the TPU-native Dirac/VC-2 codec.

  encode:  python tools/schro_tpu.py encode in.yuv out.drc --size WxH
           [--profile lowdelay|longgop] [--bitrate N] [--frames N]
  decode:  python tools/schro_tpu.py decode in.drc out.yuv --size WxH

YUV I/O is planar 4:2:0 8-bit (I420).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_yuv(path, w, h, max_frames=None):
    fsize = w * h * 3 // 2
    data = open(path, "rb").read()
    n = len(data) // fsize
    if max_frames:
        n = min(n, max_frames)
    frames = []
    for i in range(n):
        buf = np.frombuffer(data, np.uint8, fsize, i * fsize)
        y = buf[:w * h].reshape(h, w)
        u = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
        v = buf[w * h + w * h // 4:].reshape(h // 2, w // 2)
        frames.append((y, u, v))
    return frames


def write_yuv(path, frames):
    with open(path, "wb") as f:
        for (y, u, v) in frames:
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["encode", "decode"])
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("--size", required=True, help="WxH")
    ap.add_argument("--profile", default="lowdelay",
                    choices=["lowdelay", "longgop"])
    ap.add_argument("--bitrate", type=int, default=0)
    ap.add_argument("--qi", type=int, default=16, help="base quant (longgop)")
    ap.add_argument("--gop", type=int, default=24)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--fps", type=int, default=25)
    args = ap.parse_args()
    w, h = (int(t) for t in args.size.split("x"))

    from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
    vf = VideoFormat(width=w, height=h, clean_width=w, clean_height=h,
                     chroma_format=ChromaFormat.C420,
                     frame_rate_numerator=args.fps, frame_rate_denominator=1)

    if args.cmd == "encode":
        frames = read_yuv(args.infile, w, h, args.frames)
        if args.profile == "lowdelay":
            from schroedinger_tpu.api import Encoder
            from schroedinger_tpu.config import EncoderConfig
            enc = Encoder(vf, EncoderConfig(rate_control="low_delay",
                                            bitrate=args.bitrate,
                                            transform_depth=4,
                                            intra_wavelet=1))
            stream = enc.encode_stream(frames)
        else:
            from schroedinger_tpu.encoder.gop import GopEncoder
            enc = GopEncoder(vf, gop_length=args.gop,
                             base_qi_intra=args.qi, base_qi_inter=args.qi + 4)
            stream = enc.encode_stream(frames)
        open(args.outfile, "wb").write(stream)
        print(f"encoded {len(frames)} frames -> {len(stream)} bytes")
    else:
        from schroedinger_tpu.decoder.core import StreamDecoder
        frames = StreamDecoder().decode_stream(open(args.infile, "rb").read())
        write_yuv(args.outfile, frames)
        print(f"decoded {len(frames)} frames")


if __name__ == "__main__":
    main()
