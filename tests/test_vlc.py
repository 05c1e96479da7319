"""VLC engine tests: scalar bitio vs reference semantics, vectorized vs scalar."""
import numpy as np

from schroedinger_tpu.coding import bitio, vlc


def test_uint_roundtrip_scalar():
    w = bitio.BitWriter()
    vals = list(range(0, 200)) + [1000, 65534, 2**20]
    for v in vals:
        w.write_uint(v)
    w.sync()
    r = bitio.BitReader(w.get_bytes())
    for v in vals:
        assert r.read_uint() == v


def test_sint_roundtrip_scalar():
    rng = np.random.default_rng(0)
    vals = rng.integers(-30000, 30000, 500).tolist() + [0, 1, -1, 32767, -32768]
    w = bitio.BitWriter()
    for v in vals:
        w.write_sint(int(v))
    w.sync()
    r = bitio.BitReader(w.get_bytes())
    for v in vals:
        assert r.read_sint() == int(v)


def test_sint_bits_matches_scalar():
    rng = np.random.default_rng(1)
    vals = np.concatenate([rng.integers(-40000, 40000, 1000),
                           np.array([0, 1, -1, 2**30, -2**30])])
    got = vlc.sint_bits(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == bitio.sint_bits(int(v)), v


def test_sint_codes_match_scalar_bitstream():
    rng = np.random.default_rng(2)
    vals = np.concatenate([rng.integers(-3000, 3000, 300), np.array([0, 1, -1])])
    codes, lengths = vlc.sint_codes(vals)
    packed = vlc.pack_streams(codes, lengths, [0, len(vals)],
                              [int(((lengths.sum() + 7) // 8) * 8)])
    w = bitio.BitWriter()
    for v in vals.tolist():
        w.write_sint(int(v))
    # fill remaining bits with 1s to match pack_streams fill
    while w.bit_position % 8:
        w.write_bit(1)
    w.sync()
    assert packed == w.get_bytes()


def test_lockstep_decoder_roundtrip():
    rng = np.random.default_rng(3)
    n_streams, n_vals = 7, 40
    data = rng.integers(-500, 500, (n_streams, n_vals))
    codes, lengths = vlc.sint_codes(data.ravel())
    cap = 16 * 8 * ((int(lengths.reshape(n_streams, -1).sum(1).max()) + 127) // 128 + 1)
    starts = np.arange(n_streams + 1) * n_vals
    packed = vlc.pack_streams(codes, lengths, starts, [cap] * n_streams)
    offsets = np.arange(n_streams) * cap
    limits = offsets + cap
    dec = vlc.LockstepDecoder(packed, offsets, limits)
    out = np.stack([dec.read_sints() for _ in range(n_vals)], axis=1)
    np.testing.assert_array_equal(out, data)


def test_lockstep_guard_reads_zero():
    # reading past the limit must return zeros (guard bit = 1)
    packed = bytes([0b10101010])  # arbitrary
    dec = vlc.LockstepDecoder(packed, [0], [0])  # limit 0: everything guarded
    for _ in range(5):
        assert dec.read_sints()[0] == 0
