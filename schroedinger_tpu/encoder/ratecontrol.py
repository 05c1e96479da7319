"""Rate control: TPU-vectorized bit estimation + CBR buffer model.

The quantiser search evaluates the coded-bit estimate of a whole frame for
all 61 base quant indices in one jitted pass (the reference's histogram
RDO analog, schroquantiser.c:619-836, but exact sint-length sums instead of
histogram interpolation), then the CBR driver picks the base index against
the buffer model (schroencoder.c:183-545 analog, simplified).
"""
from __future__ import annotations

from functools import partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu import tables
from schroedinger_tpu.params import Params, subband_count


def _sint_bits(v):
    m = jnp.abs(v.astype(jnp.int32))
    n = 32 - jax.lax.clz(m + 1)
    return 2 * n - 1 + (m != 0)


@jax.jit
def bits_per_base(flat_coeffs, qmo, intra_flag):
    """Total sint-bit estimate of quantised coefficients for base 0..60.

    flat_coeffs: (N,) int; qmo: (N,) per-coefficient quant-matrix offset.
    Returns (61,) int64.
    """
    QF = jnp.asarray(tables.QUANT_FACTOR, jnp.int32)
    QO_I = jnp.asarray(tables.QUANT_OFFSET_1_2, jnp.int32)
    QO_P = jnp.asarray(tables.QUANT_OFFSET_3_8, jnp.int32)
    v = flat_coeffs.astype(jnp.int32)

    def one(base):
        qi = jnp.clip(base - qmo, 0, 60)
        qf = QF[qi]
        qo = jnp.where(intra_flag, QO_I[qi], QO_P[qi])
        x = jnp.abs(v) << 2
        offset = qo - qf // 2
        mag = jnp.where(x < qo, 0, (x - offset) // qf)
        return _sint_bits(mag).astype(jnp.float32).sum().astype(jnp.int32)

    return jax.lax.map(one, jnp.arange(61, dtype=jnp.int32))


def pick_base_qi(band_lists, p: Params, target_bits: int,
                 intra: bool, correction: float = 1.0) -> int:
    """Choose the base quant index whose estimated frame bits fit the target.

    band_lists: per-component list of subband arrays (device or host).
    correction: measured arith-vs-estimate ratio (EMA updated by the caller).
    """
    nb = subband_count(p.transform_depth)
    qm = np.asarray(p.quant_matrix[:nb], np.int32)
    flats = []
    qmos = []
    for bands in band_lists:
        for i, b in enumerate(bands):
            arr = jnp.ravel(jnp.asarray(b))
            flats.append(arr)
            qmos.append(jnp.full(arr.shape, qm[i], jnp.int32))
    flat = jnp.concatenate(flats)
    qmo = jnp.concatenate(qmos)
    bits = np.asarray(bits_per_base(flat, qmo, jnp.asarray(intra)))
    bits = bits * correction
    # smallest base whose estimate fits; favor quality when everything fits
    fits = np.nonzero(bits <= target_bits)[0]
    if len(fits) == 0:
        return 60
    return int(fits[0])


def pick_base_from_stats(bits61, qm, target_bits: float,
                         correction: float = 1.0) -> int:
    """Smallest base quant index whose estimated frame bits fit the target.

    bits61: (61, nb) per-band coded-bit estimates indexed by ACTUAL quant
    index (the fused P-step's stat tables); qm: (nb,) quant-matrix offsets.
    The per-base frame estimate applies the matrix the same way the coder
    will (qi = clip(base - qm)), so the pick and the coded stream agree.
    """
    bits61 = np.asarray(bits61, np.float64)
    nb = bits61.shape[1]
    qis = np.clip(np.arange(61)[:, None] - np.asarray(qm)[None, :], 0, 60)
    totals = bits61[qis, np.arange(nb)[None, :]].sum(axis=1) * correction
    fits = np.nonzero(totals <= target_bits)[0]
    return int(fits[0]) if len(fits) else 60


def estimate_bits_at(bits61, qi_bands) -> float:
    """Frame-bit estimate of coding each band at qi_bands from the
    actual-qi-indexed stat table."""
    bits61 = np.asarray(bits61, np.float64)
    nb = bits61.shape[1]
    return float(bits61[np.asarray(qi_bands), np.arange(nb)].sum())


class CbrController:
    """Reference-grade CBR bit reservoir (schroencoder.c:183-545).

    Allocation follows schro_encoder_calculate_allocation / get_alloc
    (schroengine.c:552-637): per-picture requested bits = bits_per_picture
    * picture_weight * allocation_scale, passed through the buffer-aware
    exponential curve so the allocation never exceeds what the reservoir
    holds and must-spend bits (level about to overflow) are always spent.
    Level update mirrors schroencoder.c:2592-2615 (underrun clamps to 0;
    overrun clamps to buffer_size — the reference pads the stream there,
    we simply leave the reservoir full).  Picture weights default to the
    reference's magic_keyframe_weight 7.5 / magic_inter_p_weight 1.5 /
    magic_inter_b_weight 0.2 with magic_allocation_scale 1.1
    (schroencoder.c:4520-4525); buffer_size/buffer_level settings follow
    schro_encoder_init_rc_buffer (buffer_size 0 -> 3s of bitrate, level 0
    -> start full).  The arith-vs-estimate correction is the reference's
    online EMA 0.9/0.1 (schroencoder.c:2548-2590).
    """

    def __init__(self, bitrate: int, fps: float, gop_length: int,
                 buffer_size: int = 0, buffer_level: int = 0,
                 interlaced: bool = False,
                 keyframe_weight: float = 7.5,
                 inter_p_weight: float = 1.5,
                 inter_b_weight: float = 0.2,
                 allocation_scale: float = 1.1):
        self.bitrate = bitrate
        self.gop_length = gop_length
        self.buffer_size = buffer_size if buffer_size else 3 * bitrate
        self.buffer_level = buffer_level if buffer_level \
            else self.buffer_size
        self.bits_per_picture = bitrate / fps / (2 if interlaced else 1)
        self.weights = {"I": keyframe_weight, "P": inter_p_weight,
                        "B": inter_b_weight}
        self.allocation_scale = allocation_scale
        self.correction = 1.0

    # backward-compatible: frame_target(True) == intra, (False) == P
    def frame_target(self, is_intra: bool = False, kind: str | None = None,
                     extra_weight: float = 0.0) -> int:
        """Allocated bits for the next picture (get_alloc analog).

        kind: "I"/"P"/"B" (overrides is_intra); extra_weight: additive
        weight term (the reference's badblock_ratio * magic multipliers)."""
        if kind is None:
            kind = "I" if is_intra else "P"
        w = self.weights[kind] + extra_weight
        requested = self.bits_per_picture * w * self.allocation_scale
        must_use = max(
            0.0, self.buffer_level + self.bits_per_picture - self.buffer_size)
        denom = max(1.0, self.buffer_size - self.bits_per_picture)
        x = max(0.0, requested - must_use) / denom
        y = 1.0 - np.exp(-x)
        alloc = must_use + (self.buffer_level - must_use) * y
        return max(1000, int(alloc))

    def update(self, actual_bits: int, estimated_bits: float | None = None):
        self.buffer_level += self.bits_per_picture - actual_bits
        if self.buffer_level < 0:
            self.buffer_level = 0.0      # underrun (schroencoder.c:2599)
        if self.buffer_level > self.buffer_size:
            self.buffer_level = float(self.buffer_size)  # ref pads here
        if estimated_bits and estimated_bits > 200:
            ratio = actual_bits / estimated_bits
            self.correction = 0.9 * self.correction + 0.1 * ratio


# ---- per-subband quantiser engines (schroquantiser.c:280-316 dispatch) ----

def qi_from_lambda(bits61, err61, lam: float) -> np.ndarray:
    """Per-subband quant indices minimising R + lambda*D (the reference's
    lambda weights distortion: larger lambda -> finer quantisation,
    schroquantiser.c entropy/error tradeoff).

    bits61/err61: (61, nb) per-base coded-bit / squared-error estimates
    (exact-stat analog of the reference's histogram estimate tables,
    schro_encoder_calc_estimates).  Returns (nb,) int32.
    """
    cost = np.asarray(bits61, np.float64) + lam * np.asarray(err61, np.float64)
    return np.argmin(cost, axis=0).astype(np.int32)


def lambda_for_error(bits61, err61, target_error: float,
                     iters: int = 24) -> float:
    """Bisect lambda so total squared error at the RDO choice hits the
    target (schro_encoder_error_to_lambda, schroquantiser.c:1040-1106)."""
    lo, hi = 1e-10, 1e6   # err_at is non-increasing in lambda

    def err_at(lam):
        qi = qi_from_lambda(bits61, err61, lam)
        return float(np.asarray(err61, np.float64)[qi, np.arange(len(qi))]
                     .sum())

    if err_at(lo) <= target_error:
        return lo             # cheapest choice already clean enough
    if err_at(hi) >= target_error:
        return hi             # can't reach the target; use finest tradeoff
    for _ in range(iters):
        mid = np.sqrt(lo * hi)
        if err_at(mid) > target_error:
            lo = mid
        else:
            hi = mid
    return float(np.sqrt(lo * hi))


class QuantiserEngine:
    """Per-frame per-subband quant-index chooser from exact stat tables.

    Modes (schroencoder.c:726-760 rate-control dispatch):
      constant_lambda: fixed lambda RDO (ENGINE_RDO_LAMBDA)
      constant_error / constant_noise_threshold: lambda bisected each frame
        so the frame error matches the noise target
        (ENGINE_CONSTANT_ERROR, schroquantiser.c:1099-1129)

    Stats arrive with one frame of lag (the fused P-step emits them with
    the frame it encodes); pick() returns None until the first P frame's
    stats exist, letting the caller fall back to base_qi - quant_matrix.
    """

    def __init__(self, mode: str, lam: float = 1.0,
                 noise_threshold: float = 25.0, width: int = 0,
                 height: int = 0):
        self.mode = mode
        self.lam = lam
        noise_amp = 255.0 * (0.1 ** (noise_threshold * 0.05))
        self.target_error = (noise_amp ** 2) * max(width * height, 1)
        self._stats = None

    def update(self, stats) -> None:
        if stats is not None:
            self._stats = stats

    def pick(self):
        if self._stats is None:
            return None
        bits61, err61 = self._stats
        if self.mode == "constant_lambda":
            lam = self.lam
        else:
            lam = lambda_for_error(bits61, err61, self.target_error)
        return qi_from_lambda(bits61, err61, lam)
