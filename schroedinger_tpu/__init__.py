"""schroedinger_tpu — a TPU-native Dirac / SMPTE VC-2 video codec framework.

A from-scratch JAX/XLA/Pallas implementation of the Dirac and VC-2 wavelet
video codecs, with the capabilities of the schroedinger reference library
(encode + decode, all 7 wavelets, intra + long-GOP motion-compensated coding,
VC-2 low-delay slices, arithmetic coding, rate control), designed TPU-first:

- integer lifting wavelet transforms as vectorized jnp / Pallas kernels
- subband quantisation + RDO evaluated for all 60 quant indices in parallel
- OBMC motion compensation and hierarchical block-matching on the MXU
- entropy coding vectorized across independent streams (subbands / slices)
- multi-chip scaling via jax.sharding Mesh (frames-within-GOP, tile sharding)

Bitstream behavior matches the reference (dschleef/schroedinger); decoded
output is bit-exact for lossless VC-2 configurations.
"""

__version__ = "0.1.0"

from schroedinger_tpu.wavelets import Wavelet  # noqa: F401


def clear_compiled_caches():
    """Drop every module-level cache of jitted programs and ask JAX to
    release its compilation caches.

    The fused inter/intra/lowdelay steps are huge XLA programs keyed on
    many shape/feature axes; a long-lived process that encodes many
    distinct configurations (e.g. a test suite, or a transcode farm
    worker) otherwise accumulates compiled executables without bound —
    round 2's full-suite crash was XLA CPU compile-state exhaustion after
    ~124 tests.  Call between jobs/modules to return to a near-fresh
    compile state."""
    import jax

    from schroedinger_tpu.encoder import inter, lowdelay, ratecontrol
    from schroedinger_tpu.ops import obmc

    inter._ME_CACHE.clear()
    ratecontrol._STATS_CACHE.clear()
    lowdelay._ANALYZE_CACHE.clear()
    lowdelay._TRANSFORM_CACHE.clear()
    lowdelay._HOST_CACHE.clear()
    obmc._RENDER_CACHE.clear()
    jax.clear_caches()
