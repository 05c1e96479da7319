"""Tile-sharded wavelet (halo exchange) must be bit-identical to the
single-device transform, on an 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from schroedinger_tpu.ops import wavelet as wv
from schroedinger_tpu.parallel import tiles
from schroedinger_tpu.wavelets import Wavelet


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("tile",))


@pytest.mark.parametrize("wavelet", [Wavelet.LE_GALL_5_3,
                                     Wavelet.DESLAURIERS_DUBUC_9_7,
                                     Wavelet.DAUBECHIES_9_7,
                                     Wavelet.FIDELITY])
def test_sharded_forward_matches(wavelet):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    depth = 2
    x = rng.integers(-512, 512, (128, 64)).astype(np.int16)
    ref = wv.forward(jnp.asarray(x), depth, wavelet)

    fwd = tiles.make_sharded_forward(mesh, depth, wavelet)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("tile", None)))
    got = fwd(xs)

    np.testing.assert_array_equal(np.asarray(got["ll"]), np.asarray(ref["ll"]))
    for lg, lr in zip(got["levels"], ref["levels"]):
        for k in ("hl", "lh", "hh"):
            np.testing.assert_array_equal(np.asarray(lg[k]), np.asarray(lr[k]),
                                          err_msg=f"{wavelet.name} {k}")


def test_sharded_roundtrip():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    depth = 2
    x = rng.integers(-512, 512, (128, 64)).astype(np.int16)
    fwd = tiles.make_sharded_forward(mesh, depth, Wavelet.LE_GALL_5_3)
    inv = tiles.make_sharded_inverse(mesh, depth, Wavelet.LE_GALL_5_3)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("tile", None)))
    back = inv(fwd(xs))
    np.testing.assert_array_equal(np.asarray(back), x)
