"""10/16-bit (S32) intra support: lossless round trips."""
import numpy as np
import pytest

from schroedinger_tpu.decoder import intra as di
from schroedinger_tpu.encoder import intra as ei
from schroedinger_tpu.bitstream import BitReader
from schroedinger_tpu import bitstream as bs
from schroedinger_tpu.params import Params
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat
from schroedinger_tpu.wavelets import Wavelet

W, H = 64, 48


@pytest.mark.parametrize("bit_depth,excursion", [(10, 876 * 4 // 4), (12, 3504),
                                                 (16, 65535)])
def test_deep_intra_lossless_roundtrip(bit_depth, excursion):
    if bit_depth == 10:
        excursion = 1013  # 10-bit range marker (< 1024)
    rng = np.random.default_rng(bit_depth)
    maxv = (1 << bit_depth) - 1
    y = rng.integers(0, maxv, (H, W)).astype(np.uint16)
    u = rng.integers(0, maxv, (H // 2, W // 2)).astype(np.uint16)
    v = rng.integers(0, maxv, (H // 2, W // 2)).astype(np.uint16)

    vf = VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                     chroma_format=ChromaFormat.C420,
                     luma_offset=0, luma_excursion=excursion,
                     chroma_offset=1 << (bit_depth - 1),
                     chroma_excursion=excursion)
    assert vf.bit_depth == bit_depth
    p = Params(video_format=vf, num_refs=0, transform_depth=3,
               wavelet_filter_index=Wavelet.HAAR_0)
    p.set_default_codeblocks()

    unit = ei.encode_picture((y, u, v), p, 0, quant_indices=None, is_ref=False)
    r = BitReader(unit[13:])
    r.read_bits(32)
    r.sync()
    p2 = Params(video_format=vf, num_refs=0)
    bs.read_transform_parameters(r, p2)
    r.sync()
    got = di.decode_picture(unit[13 + r.bits_read // 8:], p2)
    for g, orig, name in zip(got, (y, u, v), "yuv"):
        np.testing.assert_array_equal(g, orig, err_msg=name)
