"""ctypes wrapper around the reference schroedinger library (oracle build).

This module is ONLY used in tests, as a bit-exact differential-testing oracle.
The production framework (schroedinger_tpu/) never imports it.

Oracle is the reference compiled with DISABLE_ORC (pure C fallback paths) and
ENABLE_MOTION_REF (scalar motion renderer); see oracle/Makefile.
"""
import ctypes as C
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libschro_oracle.so")

# Frame formats (schroframe.h:22-44)
FRAME_U8_444 = 0x00
FRAME_U8_422 = 0x01
FRAME_U8_420 = 0x03
FRAME_S16_444 = 0x04
FRAME_S16_422 = 0x05
FRAME_S16_420 = 0x07
FRAME_S32_444 = 0x08
FRAME_S32_422 = 0x09
FRAME_S32_420 = 0x0B

# States (schroencoder.h:22-27)
STATE_NEED_FRAME = 0
STATE_HAVE_BUFFER = 1
STATE_AGAIN = 2
STATE_END_OF_STREAM = 3


class SchroFrameData(C.Structure):
    _fields_ = [
        ("format", C.c_int),
        ("data", C.c_void_p),
        ("stride", C.c_int),
        ("width", C.c_int),
        ("height", C.c_int),
        ("length", C.c_int),
        ("h_shift", C.c_int),
        ("v_shift", C.c_int),
    ]


class SchroFrame(C.Structure):
    _fields_ = [
        ("refcount", C.c_int),
        ("free", C.c_void_p),
        ("domain", C.c_void_p),
        ("regions", C.c_void_p * 3),
        ("priv", C.c_void_p),
        ("format", C.c_int),
        ("width", C.c_int),
        ("height", C.c_int),
        ("components", SchroFrameData * 3),
        ("is_virtual", C.c_int),
        ("cached_lines", (C.c_int * 32) * 3),
        ("virt_frame1", C.c_void_p),
        ("virt_frame2", C.c_void_p),
        ("render_line", C.c_void_p),
        ("virt_priv", C.c_void_p),
        ("virt_priv2", C.c_void_p),
        ("extension", C.c_int),
        ("cache_offset", C.c_int * 3),
        ("is_upsampled", C.c_int),
        ("upsample_done", C.c_int),
    ]


class SchroBuffer(C.Structure):
    _fields_ = [
        ("data", C.POINTER(C.c_ubyte)),
        ("length", C.c_uint),
        ("ref_count", C.c_int),
        ("parent", C.c_void_p),
        ("free", C.c_void_p),
        ("priv", C.c_void_p),
        ("tag", C.c_void_p),
    ]


class SchroVideoFormat(C.Structure):
    _fields_ = [
        ("index", C.c_int),
        ("width", C.c_int),
        ("height", C.c_int),
        ("chroma_format", C.c_int),
        ("interlaced", C.c_int),
        ("top_field_first", C.c_int),
        ("frame_rate_numerator", C.c_int),
        ("frame_rate_denominator", C.c_int),
        ("aspect_ratio_numerator", C.c_int),
        ("aspect_ratio_denominator", C.c_int),
        ("clean_width", C.c_int),
        ("clean_height", C.c_int),
        ("left_offset", C.c_int),
        ("top_offset", C.c_int),
        ("luma_offset", C.c_int),
        ("luma_excursion", C.c_int),
        ("chroma_offset", C.c_int),
        ("chroma_excursion", C.c_int),
        ("colour_primaries", C.c_int),
        ("colour_matrix", C.c_int),
        ("transfer_function", C.c_int),
        ("interlaced_coding", C.c_int),
        ("unused0", C.c_int),
        ("unused1", C.c_int),
        ("unused2", C.c_int),
    ]


_lib = None


def lib():
    global _lib
    if _lib is not None:
        return _lib
    os.environ.setdefault("SCHRO_MOTION_REF", "1")
    os.environ.setdefault("SCHRO_THREADS", "1")
    L = C.CDLL(_LIB_PATH)
    L.schro_init.restype = None
    L.schro_encoder_new.restype = C.c_void_p
    L.schro_encoder_get_video_format.restype = C.POINTER(SchroVideoFormat)
    L.schro_encoder_get_video_format.argtypes = [C.c_void_p]
    L.schro_encoder_set_video_format.argtypes = [C.c_void_p, C.POINTER(SchroVideoFormat)]
    L.schro_encoder_start.argtypes = [C.c_void_p]
    L.schro_encoder_push_frame.argtypes = [C.c_void_p, C.POINTER(SchroFrame)]
    L.schro_encoder_end_of_stream.argtypes = [C.c_void_p]
    L.schro_encoder_wait.argtypes = [C.c_void_p]
    L.schro_encoder_wait.restype = C.c_int
    L.schro_encoder_pull.argtypes = [C.c_void_p, C.POINTER(C.c_int)]
    L.schro_encoder_pull.restype = C.POINTER(SchroBuffer)
    L.schro_encoder_setting_set_double.argtypes = [C.c_void_p, C.c_char_p, C.c_double]
    L.schro_encoder_free.argtypes = [C.c_void_p]
    L.schro_frame_new_and_alloc.restype = C.POINTER(SchroFrame)
    L.schro_frame_new_and_alloc.argtypes = [C.c_void_p, C.c_int, C.c_int, C.c_int]
    L.schro_frame_unref.argtypes = [C.POINTER(SchroFrame)]
    L.schro_frame_ref.argtypes = [C.POINTER(SchroFrame)]
    L.schro_frame_ref.restype = C.POINTER(SchroFrame)
    L.schro_buffer_unref.argtypes = [C.POINTER(SchroBuffer)]
    L.schro_decoder_new.restype = C.c_void_p
    L.schro_decoder_autoparse_push.argtypes = [C.c_void_p, C.POINTER(SchroBuffer)]
    L.schro_decoder_autoparse_wait.argtypes = [C.c_void_p]
    L.schro_decoder_autoparse_wait.restype = C.c_int
    L.schro_decoder_pull.argtypes = [C.c_void_p]
    L.schro_decoder_pull.restype = C.POINTER(SchroFrame)
    L.schro_decoder_add_output_picture.argtypes = [C.c_void_p, C.POINTER(SchroFrame)]
    L.schro_decoder_set_picture_order.argtypes = [C.c_void_p, C.c_int]
    L.schro_decoder_autoparse_push_end_of_sequence.argtypes = [C.c_void_p]
    L.schro_decoder_free.argtypes = [C.c_void_p]
    L.schro_buffer_new_with_data.restype = C.POINTER(SchroBuffer)
    L.schro_buffer_new_with_data.argtypes = [C.c_void_p, C.c_int]
    L.schro_buffer_new_and_alloc.restype = C.POINTER(SchroBuffer)
    L.schro_buffer_new_and_alloc.argtypes = [C.c_int]
    L.schro_wavelet_transform_2d.argtypes = [C.POINTER(SchroFrameData), C.c_int, C.c_void_p]
    L.schro_wavelet_inverse_transform_2d.argtypes = [
        C.POINTER(SchroFrameData), C.POINTER(SchroFrameData), C.c_int, C.c_void_p]
    L.schro_quantise.argtypes = [C.c_int, C.c_int, C.c_int]
    L.schro_quantise.restype = C.c_int
    L.schro_dequantise.argtypes = [C.c_int, C.c_int, C.c_int]
    L.schro_dequantise.restype = C.c_int
    L.schro_init()
    _lib = L
    return _lib


def _fd_from_numpy(arr, fmt):
    """Build a SchroFrameData pointing at a C-contiguous numpy array."""
    assert arr.flags["C_CONTIGUOUS"]
    fd = SchroFrameData()
    fd.format = fmt
    fd.data = arr.ctypes.data_as(C.c_void_p)
    fd.stride = arr.strides[0]
    fd.width = arr.shape[1]
    fd.height = arr.shape[0]
    fd.length = arr.nbytes
    fd.h_shift = 0
    fd.v_shift = 0
    return fd


def wavelet_fwd(arr, filter_idx):
    """2-D forward IWT in place semantics; returns transformed copy.

    arr: int16 or int32 2-D numpy array, dims already padded to multiple of 2.
    Result is in the reference's interleaved in-place layout.
    """
    L = lib()
    a = np.array(arr, copy=True)
    fmt = FRAME_S16_444 if a.dtype == np.int16 else FRAME_S32_444
    fd = _fd_from_numpy(a, fmt)
    tmp = np.zeros(a.shape[1] + 32, dtype=np.int64)  # generous tmp
    L.schro_wavelet_transform_2d(C.byref(fd), filter_idx, tmp.ctypes.data_as(C.c_void_p))
    return a


def wavelet_inv(arr, filter_idx):
    # The reference is always called in place (dest aliases src:
    # schrodecoder.c:1842, schroencoder.c:2678); some wavelets rely on it.
    L = lib()
    buf = np.array(arr, copy=True)
    fmt = FRAME_S16_444 if buf.dtype == np.int16 else FRAME_S32_444
    fd_src = _fd_from_numpy(buf, fmt)
    fd_dest = _fd_from_numpy(buf, fmt)
    tmp = np.zeros(buf.shape[1] + 32, dtype=np.int64)
    L.schro_wavelet_inverse_transform_2d(
        C.byref(fd_dest), C.byref(fd_src), filter_idx, tmp.ctypes.data_as(C.c_void_p))
    return buf


def frame_ssim(planes_a, planes_b):
    """schro_frame_ssim over two (y,u,v) uint8 4:2:0 frames (schrossim.c)."""
    L = lib()
    L.schro_frame_ssim.restype = C.c_double
    L.schro_frame_ssim.argtypes = [C.POINTER(SchroFrame),
                                   C.POINTER(SchroFrame)]
    h, w = planes_a[0].shape
    fa = L.schro_frame_new_and_alloc(None, FRAME_U8_420, w, h)
    fb = L.schro_frame_new_and_alloc(None, FRAME_U8_420, w, h)
    try:
        _fill_frame(fa, *planes_a)
        _fill_frame(fb, *planes_b)
        return float(L.schro_frame_ssim(fa, fb))
    finally:
        L.schro_frame_unref(fa)
        L.schro_frame_unref(fb)


def quantise(value, quant_factor, quant_offset):
    return lib().schro_quantise(value, quant_factor, quant_offset)


def dequantise(value, quant_factor, quant_offset):
    return lib().schro_dequantise(value, quant_factor, quant_offset)


def _fill_frame(fp, y, u, v):
    for i, plane in enumerate((y, u, v)):
        comp = fp.contents.components[i]
        h, w = plane.shape
        assert comp.width == w and comp.height == h, (comp.width, comp.height, w, h)
        buf = (C.c_ubyte * (comp.stride * h)).from_address(comp.data)
        dst = np.frombuffer(buf, dtype=np.uint8).reshape(h, comp.stride)
        dst[:, :w] = plane
    return fp


def _read_frame(fp):
    planes = []
    for i in range(3):
        comp = fp.contents.components[i]
        h, w = comp.height, comp.width
        buf = (C.c_ubyte * (comp.stride * h)).from_address(comp.data)
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, comp.stride)[:, :w].copy()
        planes.append(arr)
    return planes


def _fill_frame16(fp, y, u, v):
    for i, plane in enumerate((y, u, v)):
        comp = fp.contents.components[i]
        h, w = plane.shape
        assert comp.width == w and comp.height == h, \
            (comp.width, comp.height, w, h)
        buf = (C.c_ubyte * (comp.stride * h)).from_address(comp.data)
        dst = np.frombuffer(buf, dtype=np.int16).reshape(h, comp.stride // 2)
        dst[:, :w] = plane
    return fp


def _read_frame16(fp):
    planes = []
    for i in range(3):
        comp = fp.contents.components[i]
        h, w = comp.height, comp.width
        buf = (C.c_ubyte * (comp.stride * h)).from_address(comp.data)
        arr = (np.frombuffer(buf, dtype=np.int16)
               .reshape(h, comp.stride // 2)[:, :w].copy())
        planes.append(arr)
    return planes


def _deep_signal_range(vf, bit_depth):
    """Full-range 10/12/16-bit signal params (schrovideoformat.h:47-76:
    bit depth is derived from luma_excursion)."""
    vf.contents.luma_offset = 0
    vf.contents.luma_excursion = (1 << bit_depth) - 1
    vf.contents.chroma_offset = 1 << (bit_depth - 1)
    vf.contents.chroma_excursion = (1 << bit_depth) - 1


def encode16(frames, width, height, bit_depth, settings=None, chroma=420):
    """Encode deep (10/16-bit) YUV frames (int16 offset-binary planes).

    The reference converts S16 input to its S32 internal frames with a
    plain widen (orc_convert_s32_s16 — NO offset; only the 8-bit path
    recentres by 128, schroorc.orc:543-549 vs :483-487)."""
    L = lib()
    enc = L.schro_encoder_new()
    vf = L.schro_encoder_get_video_format(enc)
    vf.contents.width = width
    vf.contents.height = height
    vf.contents.clean_width = width
    vf.contents.clean_height = height
    vf.contents.chroma_format = {444: 0, 422: 1, 420: 2}[chroma]
    _deep_signal_range(vf, bit_depth)
    L.schro_encoder_set_video_format(enc, vf)
    for k, val in (settings or {}).items():
        L.schro_encoder_setting_set_double(enc, k.encode(), float(val))
    L.schro_encoder_start(enc)

    fmt = {444: FRAME_S16_444, 422: FRAME_S16_422, 420: FRAME_S16_420}[chroma]
    out = bytearray()
    n = C.c_int(0)
    it = iter(frames)
    pushed_eos = False
    while True:
        st = L.schro_encoder_wait(enc)
        if st == STATE_NEED_FRAME:
            try:
                y, u, v = next(it)
                fp = L.schro_frame_new_and_alloc(None, fmt, width, height)
                _fill_frame16(fp, np.asarray(y, np.int16),
                              np.asarray(u, np.int16),
                              np.asarray(v, np.int16))
                L.schro_encoder_push_frame(enc, fp)
            except StopIteration:
                if not pushed_eos:
                    L.schro_encoder_end_of_stream(enc)
                    pushed_eos = True
        elif st == STATE_HAVE_BUFFER:
            buf = L.schro_encoder_pull(enc, C.byref(n))
            out += bytes(bytearray(buf.contents.data[i]
                                   for i in range(buf.contents.length)))
            L.schro_buffer_unref(buf)
        elif st == STATE_END_OF_STREAM:
            break
    L.schro_encoder_free(enc)
    return bytes(out)


def decode16(stream, width, height, chroma=420):
    """Decode a deep Dirac stream to int16 planes (plain S32->S16 narrow,
    no offset — matching the reference's output conversion)."""
    L = lib()
    dec = L.schro_decoder_new()
    L.schro_decoder_set_picture_order(dec, 0)
    fmt = {444: FRAME_S16_444, 422: FRAME_S16_422, 420: FRAME_S16_420}[chroma]
    data = C.create_string_buffer(stream, len(stream))
    buf = L.schro_buffer_new_with_data(C.cast(data, C.c_void_p), len(stream))
    L.schro_decoder_autoparse_push(dec, buf)
    pushed_eos = False
    frames = []
    while True:
        st = L.schro_decoder_autoparse_wait(dec)
        if st == 5:  # NEED_FRAME
            fp = L.schro_frame_new_and_alloc(None, fmt, width, height)
            L.schro_decoder_add_output_picture(dec, fp)
        elif st == 0:  # OK
            fp = L.schro_decoder_pull(dec)
            if fp and fp.contents.components[0].data:
                frames.append(_read_frame16(fp))
                L.schro_frame_unref(fp)
            elif fp:
                L.schro_frame_unref(fp)
        elif st == 2:  # EOS
            while True:
                fp = L.schro_decoder_pull(dec)
                if not fp:
                    break
                if fp.contents.components[0].data:
                    frames.append(_read_frame16(fp))
                L.schro_frame_unref(fp)
            break
        elif st == 1:
            raise RuntimeError("oracle decoder error")
        elif st == 4:
            if not pushed_eos:
                L.schro_decoder_autoparse_push_end_of_sequence(dec)
                pushed_eos = True
            else:
                break
        elif st == 3:
            pass
    L.schro_decoder_free(dec)
    return frames


def encode(frames, width, height, settings=None, chroma=420):
    """Encode uint8 YUV planar frames; returns the full Dirac stream as bytes.

    frames: list of (y, u, v) numpy uint8 arrays.
    settings: dict of encoder setting name -> value (doubles).
    """
    L = lib()
    enc = L.schro_encoder_new()
    vf = L.schro_encoder_get_video_format(enc)
    vf.contents.width = width
    vf.contents.height = height
    vf.contents.clean_width = width
    vf.contents.clean_height = height
    vf.contents.chroma_format = {444: 0, 422: 1, 420: 2}[chroma]
    L.schro_encoder_set_video_format(enc, vf)
    for k, val in (settings or {}).items():
        L.schro_encoder_setting_set_double(enc, k.encode(), float(val))
    L.schro_encoder_start(enc)

    fmt = {444: FRAME_U8_444, 422: FRAME_U8_422, 420: FRAME_U8_420}[chroma]
    out = bytearray()
    n = C.c_int(0)
    it = iter(frames)
    pushed_eos = False
    while True:
        st = L.schro_encoder_wait(enc)
        if st == STATE_NEED_FRAME:
            try:
                y, u, v = next(it)
                fp = L.schro_frame_new_and_alloc(None, fmt, width, height)
                _fill_frame(fp, y, u, v)
                L.schro_encoder_push_frame(enc, fp)
            except StopIteration:
                if not pushed_eos:
                    L.schro_encoder_end_of_stream(enc)
                    pushed_eos = True
        elif st == STATE_HAVE_BUFFER:
            buf = L.schro_encoder_pull(enc, C.byref(n))
            out += bytes(bytearray(buf.contents.data[i] for i in range(buf.contents.length)))
            L.schro_buffer_unref(buf)
        elif st == STATE_END_OF_STREAM:
            break
        else:  # AGAIN
            pass
    L.schro_encoder_free(enc)
    return bytes(out)


def decode(stream, width, height, chroma=420):
    """Decode a Dirac stream; returns list of (y,u,v) uint8 planes."""
    L = lib()
    dec = L.schro_decoder_new()
    L.schro_decoder_set_picture_order(dec, 0)
    fmt = {444: FRAME_U8_444, 422: FRAME_U8_422, 420: FRAME_U8_420}[chroma]
    cw = width if chroma == 444 else (width + 1) // 2
    ch = height if chroma == 420 else height
    if chroma == 420:
        ch = (height + 1) // 2

    data = C.create_string_buffer(stream, len(stream))
    buf = L.schro_buffer_new_with_data(C.cast(data, C.c_void_p), len(stream))
    L.schro_decoder_autoparse_push(dec, buf)
    pushed_eos = False

    # schrodecoder.h:163-171: OK=0 ERROR=1 EOS=2 FIRST_ACCESS_UNIT=3
    # NEED_BITS=4 NEED_FRAME=5 WAIT=6 STALLED=7
    frames = []
    while True:
        st = L.schro_decoder_autoparse_wait(dec)
        if st == 5:  # NEED_FRAME
            fp = L.schro_frame_new_and_alloc(None, fmt, width, height)
            L.schro_decoder_add_output_picture(dec, fp)
        elif st == 0:  # OK: picture ready
            fp = L.schro_decoder_pull(dec)
            if fp and fp.contents.components[0].data:
                frames.append(_read_frame(fp))
                L.schro_frame_unref(fp)
            elif fp:
                L.schro_frame_unref(fp)
        elif st == 2:  # EOS
            # drain any frames still sitting in the reorder buffer
            while True:
                fp = L.schro_decoder_pull(dec)
                if not fp:
                    break
                if fp.contents.components[0].data:
                    frames.append(_read_frame(fp))
                L.schro_frame_unref(fp)
            break
        elif st == 1:  # ERROR
            raise RuntimeError("oracle decoder error")
        elif st == 4:  # NEED_BITS: all data consumed -> signal EOS once
            if not pushed_eos:
                L.schro_decoder_autoparse_push_end_of_sequence(dec)
                pushed_eos = True
            else:
                break
        elif st == 3:  # FIRST_ACCESS_UNIT
            pass
    L.schro_decoder_free(dec)
    return frames


# ---------------------------------------------------------------------------
# Arithmetic coder oracle access

def arith_encode(bits_and_ctx, bufsize=1 << 20):
    """bits_and_ctx: list of ('b', ctx, bit) / ('u', cc, vc, v) /
    ('s', cc, vc, sc, v). Returns encoded bytes."""
    L = lib()
    L.schro_arith_new.restype = C.c_void_p
    L.schro_arith_encode_init.argtypes = [C.c_void_p, C.POINTER(SchroBuffer)]
    L.schro_arith_encode_bit.argtypes = [C.c_void_p, C.c_int, C.c_int]
    L.schro_arith_encode_uint.argtypes = [C.c_void_p, C.c_int, C.c_int, C.c_int]
    L.schro_arith_encode_sint.argtypes = [C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int]
    L.schro_arith_flush.argtypes = [C.c_void_p]
    L.schro_arith_free.argtypes = [C.c_void_p]
    buf = L.schro_buffer_new_and_alloc(bufsize)
    a = L.schro_arith_new()
    L.schro_arith_encode_init(a, buf)
    for op in bits_and_ctx:
        if op[0] == 'b':
            L.schro_arith_encode_bit(a, op[1], op[2])
        elif op[0] == 'u':
            L.schro_arith_encode_uint(a, op[1], op[2], op[3])
        else:
            L.schro_arith_encode_sint(a, op[1], op[2], op[3], op[4])
    L.schro_arith_flush(a)
    # offset field: first pointer-size after buffer+dataptr
    class _ArithHead(C.Structure):
        _fields_ = [("buffer", C.c_void_p), ("dataptr", C.c_void_p),
                    ("offset", C.c_size_t)]
    head = C.cast(a, C.POINTER(_ArithHead)).contents
    n = head.offset
    out = bytes(bytearray(buf.contents.data[i] for i in range(n)))
    L.schro_arith_free(a)
    L.schro_buffer_unref(buf)
    return out


def arith_decode(data, ops):
    """ops: list of ('b', ctx) / ('u', cc, vc) / ('s', cc, vc, sc).
    Returns decoded values."""
    L = lib()
    L.schro_arith_new.restype = C.c_void_p
    L.schro_arith_decode_init.argtypes = [C.c_void_p, C.POINTER(SchroBuffer)]
    L.schro_arith_decode_bit.argtypes = [C.c_void_p, C.c_uint]
    L.schro_arith_decode_bit.restype = C.c_int
    L.schro_arith_decode_uint.argtypes = [C.c_void_p, C.c_uint, C.c_uint]
    L.schro_arith_decode_uint.restype = C.c_int
    L.schro_arith_decode_sint.argtypes = [C.c_void_p, C.c_uint, C.c_uint, C.c_uint]
    L.schro_arith_decode_sint.restype = C.c_int
    L.schro_arith_free.argtypes = [C.c_void_p]
    arr = C.create_string_buffer(data, len(data))
    buf = L.schro_buffer_new_with_data(C.cast(arr, C.c_void_p), len(data))
    a = L.schro_arith_new()
    L.schro_arith_decode_init(a, buf)
    out = []
    for op in ops:
        if op[0] == 'b':
            out.append(L.schro_arith_decode_bit(a, op[1]))
        elif op[0] == 'u':
            out.append(L.schro_arith_decode_uint(a, op[1], op[2]))
        else:
            out.append(L.schro_arith_decode_sint(a, op[1], op[2], op[3]))
    L.schro_arith_free(a)
    L.schro_buffer_unref(buf)
    return out
