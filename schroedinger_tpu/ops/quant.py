"""Dead-zone quantiser / dequantiser, bit-exact with the reference.

Reference semantics (schroutils.c:177-235):

  dequantise(q) = sign(q) * ((|q| * qf + qo + 2) >> 2)          (0 -> 0)
  quantise(v):   x = |v| << 2
                 0 if x < qo (dead zone)
                 else sign(v) * ((x - (qo - qf//2)) / qf)       (trunc div)

All intermediates are C `int` (32-bit, wrapping); matched here with int32.
qf/qo come from tables.QUANT_FACTOR / QUANT_OFFSET_* indexed by quant index.
"""
import jax.numpy as jnp

from schroedinger_tpu import tables


def quant_factor(qi):
    return jnp.asarray(tables.QUANT_FACTOR, jnp.int32)[qi]


def quant_offset(qi, intra: bool):
    t = tables.QUANT_OFFSET_1_2 if intra else tables.QUANT_OFFSET_3_8
    return jnp.asarray(t, jnp.int32)[qi]


def quantise(v, qf, qo):
    """Vectorized dead-zone quantise. v int array; qf/qo broadcastable int32.

    Returns int32 quantised magnitudes with sign.
    """
    v = v.astype(jnp.int32)
    qf = jnp.asarray(qf, jnp.int32)
    qo = jnp.asarray(qo, jnp.int32)
    x = jnp.abs(v) << 2
    offset = qo - qf // 2
    # numerator >= qf//2 >= 0 whenever x >= qo, so trunc == floor division
    mag = jnp.where(x < qo, 0, (x - offset) // jnp.maximum(qf, 1))
    return jnp.where(v < 0, -mag, mag)


def dequantise(q, qf, qo):
    """Vectorized dequantise; int32 wrapping as the C `int` path."""
    q = q.astype(jnp.int32)
    qf = jnp.asarray(qf, jnp.int32)
    qo = jnp.asarray(qo, jnp.int32)
    mag = (jnp.abs(q) * qf + qo + 2) >> 2
    return jnp.where(q == 0, 0, jnp.where(q < 0, -mag, mag))


def quantise_dequantise(v, qf, qo):
    """Fused quantise + local reconstruction (schro_quantise_s16 behavior)."""
    q = quantise(v, qf, qo)
    return q, dequantise(q, qf, qo)
