"""GOP sharding across hosts (parallel/gops.py): the sharded encode must
produce exactly the serial encoder's stream (closed GOPs are independent),
and the merged parse-offset chain must satisfy both decoders."""
import numpy as np

from oracle import schro_oracle as so
from schroedinger_tpu.decoder.core import StreamDecoder
from schroedinger_tpu.encoder.gop import GopEncoder
from schroedinger_tpu.parallel import gops
from schroedinger_tpu.video_format import ChromaFormat, VideoFormat

W, H = 96, 80
GOP = 4
N = 16


def make_frames(n=N, seed=9):
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


def _vf():
    return VideoFormat(width=W, height=H, clean_width=W, clean_height=H,
                       chroma_format=ChromaFormat.C420,
                       frame_rate_numerator=25, frame_rate_denominator=1)


def _enc():
    # scene-change scoring looks one frame back across chunk boundaries,
    # so it is disabled for byte-exact shard equivalence
    return GopEncoder(_vf(), base_qi_intra=12, base_qi_inter=16,
                      gop_length=GOP, enable_scene_change=False)


def test_chunk_ranges():
    assert gops.chunk_ranges(16, 4, 2) == [(0, 8), (8, 16)]
    assert gops.chunk_ranges(17, 4, 2) == [(0, 12), (12, 17)]
    assert gops.chunk_ranges(8, 4, 8) == [(0, 4), (4, 8)]
    assert gops.chunk_ranges(3, 4, 4) == [(0, 3)]


def test_sharded_equals_serial():
    frames = make_frames()
    serial = _enc().encode_stream(frames)
    sharded = gops.encode_gops_sharded(frames, _enc, n_shards=4,
                                       sequential=True)
    assert sharded == serial


def test_threaded_shards_match_and_decode():
    frames = make_frames()
    stream = gops.encode_gops_sharded(frames, _enc, n_shards=2)
    assert stream == _enc().encode_stream(frames)

    mine = StreamDecoder().decode_stream(stream)
    ref = so.decode(stream, W, H)
    assert len(ref) >= N - 1
    for g3, r3 in zip(mine, ref):
        for g, r in zip(g3, r3):
            np.testing.assert_array_equal(g, r)


def test_multihost_single_process_fallback():
    frames = make_frames(8)
    stream = gops.encode_gops_multihost(frames, _enc)
    assert stream == _enc().encode_stream(frames)


def test_gather_and_merge_mocked_two_process():
    """Cover the DCN gather/padding/unpack logic with a fake allgather:
    two simulated processes encode their chunk, 'gather', and the merged
    stream must be byte-identical to the serial encode on both ranks."""
    frames = make_frames(8)
    ranges = gops.chunk_ranges(len(frames), GOP, 2)
    locals_ = []
    for start, stop in ranges:
        enc = _enc()
        gops._seed_shard_state(enc, start)
        locals_.append(enc.encode_stream(frames[start:stop]))

    def fake_allgather(arr):
        # what each rank contributes for this collective, stacked like
        # jax.experimental.multihost_utils.process_allgather
        if arr.dtype == np.int64:
            return np.stack([np.asarray([len(s)], np.int64)
                             for s in locals_])
        m = arr.shape[0]
        out = np.zeros((2, m), np.uint8)
        for i, s in enumerate(locals_):
            out[i, :len(s)] = np.frombuffer(s, np.uint8)
        return out

    merged0 = gops.gather_and_merge(locals_[0], 2, fake_allgather)
    merged1 = gops.gather_and_merge(locals_[1], 2, fake_allgather)
    serial = _enc().encode_stream(frames)
    assert merged0 == serial
    assert merged1 == serial


def test_shard_encoder_validation():
    import pytest
    frames = make_frames(4)

    def bad_enc():
        return GopEncoder(_vf(), gop_length=GOP, enable_scene_change=True)

    with pytest.raises(ValueError, match="enable_scene_change"):
        gops.encode_gops_sharded(frames, bad_enc, n_shards=2)


def test_encode_bytes_independent_of_compile_cache_state():
    """Cold vs warm compile caches must produce byte-identical streams.

    The compile barrier (_drain_if_compiling) quiesces the device before
    a first-use variant compiles; round 4 committed the drained pictures'
    rate-control updates early, so a cold-cache encode saw different TM5
    feedback timing than a warm one and the multihost dryrun's worker
    streams (cold) mismatched the single-process sharded encode (warm).
    Now the barrier fetches without committing."""
    import schroedinger_tpu
    frames = make_frames(8)

    def enc():
        return GopEncoder(_vf(), gop_length=4, gop_structure="biref",
                          subgroup_length=2, bitrate=400000, fps=25,
                          enable_scene_change=False)

    a = enc().encode_stream(frames)          # whatever cache state
    schroedinger_tpu.clear_compiled_caches()
    b = enc().encode_stream(frames)          # cold: barriers fire
    c = enc().encode_stream(frames)          # warm: no barriers
    assert a == b == c
