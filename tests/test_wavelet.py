"""Differential tests: jnp wavelet lifting vs the compiled reference oracle.

Mirrors the reference's own test strategy (testsuite/wavelet_2d.c): every
wavelet x several sizes x deterministic patterns, forward and inverse, plus
bit-exact round trips.
"""
import numpy as np
import pytest

import jax

from oracle import schro_oracle as so
from schroedinger_tpu.ops import wavelet as wv
from schroedinger_tpu.wavelets import Wavelet

_fwd = jax.jit(wv.fwd_level, static_argnums=1)
_inv = jax.jit(wv.inv_level, static_argnums=4)

SIZES = [(16, 16), (32, 16), (16, 32), (64, 64), (24, 40)]


def patterns(h, w, dtype, seed=42):
    rng = np.random.default_rng(seed)
    lim = 1000 if dtype == np.int16 else 100000
    yield rng.integers(-lim, lim, (h, w)).astype(dtype)
    yield np.full((h, w), 255, dtype)
    ramp = np.arange(w, dtype=np.int32)[None, :] + np.arange(h, dtype=np.int32)[:, None]
    yield (ramp % 512 - 256).astype(dtype)
    # near-overflow random data exercises the wrap semantics
    big = 30000 if dtype == np.int16 else 2**30
    yield rng.integers(-big, big, (h, w)).astype(dtype)


@pytest.mark.parametrize("wavelet", list(Wavelet))
@pytest.mark.parametrize("dtype", [np.int16, np.int32])
def test_forward_matches_oracle(wavelet, dtype):
    for (h, w) in SIZES:
        for pat in patterns(h, w, dtype):
            ref = so.wavelet_fwd(pat, int(wavelet))
            ref_pyr = wv.interleaved_to_pyramid(ref, 1)
            got = _fwd(pat, wavelet)
            names = ["ll", "hl", "lh", "hh"]
            ref_bands = [ref_pyr["ll"], ref_pyr["levels"][0]["hl"],
                         ref_pyr["levels"][0]["lh"], ref_pyr["levels"][0]["hh"]]
            for name, r, g in zip(names, ref_bands, got):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(r),
                    err_msg=f"{wavelet.name} {dtype.__name__} {h}x{w} band {name}")


@pytest.mark.parametrize("wavelet", list(Wavelet))
@pytest.mark.parametrize("dtype", [np.int16, np.int32])
def test_inverse_matches_oracle(wavelet, dtype):
    for (h, w) in SIZES[:3]:
        for pat in patterns(h, w, dtype, seed=7):
            # treat pat as interleaved coefficients; both sides invert it
            ref = so.wavelet_inv(pat, int(wavelet))
            pyr = wv.interleaved_to_pyramid(pat, 1)
            got = _inv(pyr["ll"], pyr["levels"][0]["hl"],
                       pyr["levels"][0]["lh"], pyr["levels"][0]["hh"], wavelet)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(ref),
                err_msg=f"{wavelet.name} {dtype.__name__} {h}x{w}")


@pytest.mark.parametrize("wavelet", list(Wavelet))
def test_roundtrip_multilevel(wavelet):
    rng = np.random.default_rng(3)
    x = rng.integers(-512, 512, (64, 64)).astype(np.int16)
    depth = 3
    pyr = wv.forward(x, depth, wavelet)
    back = wv.inverse(pyr, wavelet)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_layout_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.integers(-512, 512, (32, 32)).astype(np.int16)
    pyr = wv.interleaved_to_pyramid(x, 3)
    back = wv.pyramid_to_interleaved(pyr)
    np.testing.assert_array_equal(np.asarray(back), x)
