"""Settings registry wiring: every setting is settable by name (index or
name for enums, like the reference's introspectable table,
schroencoder.c:4461-4535), defaults match the registry, and wired settings
measurably change encoder behavior."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.api import Encoder
from schroedinger_tpu.config import SETTINGS, EncoderConfig
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80


def make_frames(n=6, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 55 * np.sin(xx / 6.0) * np.cos(yy / 5.0)
    out = []
    for i in range(n):
        y = np.roll(base, (i, 2 * i), axis=(0, 1)) + rng.normal(0, 3, (H, W))
        u = 128 + 20 * np.cos((xx[::2, ::2] + i) / 8.0)
        v = 128 + 20 * np.sin((yy[::2, ::2] + i) / 7.0)
        out.append((y.clip(0, 255).astype(np.uint8),
                    u.clip(0, 255).astype(np.uint8),
                    v.clip(0, 255).astype(np.uint8)))
    return out


def vfmt():
    return VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                       chroma_format=ChromaFormat.C420,
                       frame_rate_numerator=25, frame_rate_denominator=1)


def test_registry_matches_reference_count_and_defaults():
    # the reference's table has exactly 71 settings (schroencoder.c:
    # 4461-4535, counted via its INT/ENUM/BOOL/DOUB macros)
    assert len(SETTINGS) == 71
    cfg = EncoderConfig()
    # defaults ARE the registry defaults (sweeps port 1:1)
    assert cfg.rate_control == "constant_quality"
    assert cfg.get("quality") == 5.0
    assert cfg.get("magic_subgroup_length") == 4.0
    assert cfg.get("perceptual_weighting") == "ccir959"
    assert cfg.get("open_gop") is True


def test_all_settings_settable_by_name_and_index():
    cfg = EncoderConfig()
    for s in SETTINGS:
        # every setting accepts its own default, by name
        cfg.set(s.name, s.default if s.type != "enum"
                else s.enum_list[int(s.default)])
        if s.type == "enum":
            cfg.set(s.name, int(s.max))      # by index
            assert cfg.get(s.name) == s.enum_list[int(s.max)]
            cfg.set(s.name, s.enum_list[0])  # by name
            assert cfg.get(s.name) == s.enum_list[0]
    with pytest.raises(KeyError):
        cfg.set("not_a_setting", 1)


def _encode(frames=None, **settings):
    frames = frames or make_frames()
    cfg = EncoderConfig()
    cfg.set("rate_control", "constant_quality")
    cfg.set("au_distance", 6)
    cfg.set("enable_scene_change_detection", 0)
    for k, v in settings.items():
        cfg.set(k, v)
    enc = Encoder(vfmt(), cfg)
    stream = enc.encode_stream(frames)
    return stream, enc


def _roundtrip(stream):
    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(mine) == len(ref)
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)
    return mine


# each case: a setting + value that must ALTER the stream vs defaults,
# while remaining decodable bit-identically by the reference decoder
ALTERING = [
    {"quality": 8.0},
    {"filtering": "gaussian", "filter_value": 20.0},
    {"filtering": "center_weighted_median", "filter_value": 5.0},
    {"perceptual_weighting": "none"},
    {"perceptual_weighting": "manos_sakrison"},
    {"perceptual_distance": 1.0},
    {"motion_block_size": "large"},  # automatic is already small at 96x80
    {"motion_block_overlap": "full"},
    {"codeblock_size": "full"},
    {"open_gop": 0, "au_distance": 4},
    {"enable_multiquant": 1},
    {"magic_subband0_lambda_scale": 1000.0},
    {"magic_subgroup_length": 2},
    {"inter_wavelet": "haar_1"},
    {"intra_wavelet": "le_gall_5_3"},
    {"transform_depth": 2},
    {"mv_precision": 2},
]


@pytest.mark.parametrize("settings", ALTERING,
                         ids=[",".join(s) for s in ALTERING])
def test_wired_setting_alters_stream(settings):
    frames = make_frames()
    base, _ = _encode(frames)
    changed, _ = _encode(frames, **settings)
    assert changed != base, f"{settings} did not alter the stream"
    _roundtrip(changed)


def test_enable_psnr_ssim_populate_stats():
    frames = make_frames()
    stream, enc = _encode(frames, enable_psnr=1, enable_ssim=1)
    recs = enc._gop.stats.frames
    assert any("psnr" in r for r in recs)
    assert any("ssim" in r for r in recs)
    ps = [r["psnr"] for r in recs if "psnr" in r]
    ss = [r["ssim"] for r in recs if "ssim" in r]
    assert all(20 < p <= 99 for p in ps)
    assert all(0.5 < s <= 1.0 for s in ss)


def test_rdo_cbr_toggle_changes_cbr_behavior():
    frames = make_frames()
    a, _ = _encode(frames, rate_control="constant_bitrate", bitrate=500000)
    b, _ = _encode(frames, rate_control="constant_bitrate", bitrate=500000,
                   enable_rdo_cbr=0)
    assert a != b
    _roundtrip(a)
    _roundtrip(b)


def test_buffer_size_changes_cbr_stream():
    frames = make_frames()
    a, _ = _encode(frames, rate_control="constant_bitrate", bitrate=300000,
                   enable_rdo_cbr=0)
    # a tiny reservoir makes the per-picture allocation bind
    b, _ = _encode(frames, rate_control="constant_bitrate", bitrate=300000,
                   enable_rdo_cbr=0, buffer_size=24000)
    assert a != b
