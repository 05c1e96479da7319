"""FFT phase-correlation motion estimation on TPU.

TPU-native analog of schrophasecorrelation.c: the reference slides
Gaussian-weighted windows (2^(5+i) x 2^(4+i), i = level) over the 4x
downsampled luma, phase-correlates each window of the current frame against
the co-sited reference window (normalized cross-power spectrum, inverse
FFT), and extracts the top-2 correlation peaks with half-peak sub-sample
refinement (schrophasecorrelation.c:129-179,339-401).  The resulting
vectors seed superblock motion search
(schro_motionest_superblock_phasecorr1, :502-561).

TPU-first design: all windows of a level are gathered into one
(n_windows, wh, ww) batch with a single constant-index gather, and the
whole pipeline — weighting, 2-D FFT, cross-power normalisation, inverse
FFT, dual peak extraction — runs batched in one jitted program.  Instead of
the reference's per-superblock window lookup, the distilled candidate
vectors feed the hierarchical matcher as extra full-frame SAD candidates
(see me.make_me_fn n_extra), which recovers locality through the per-block
argmin while keeping the compute dense.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from schroedinger_tpu.encoder.me import downsample2

PICTURE_SHIFT = 2  # reference runs phase corr on the 4x-down frame (:489)


def _gauss_weight(wh: int, ww: int) -> np.ndarray:
    """Normalised Gaussian window (schrophasecorrelation.c:71-102)."""
    my, mx = 0.5 * (wh - 1), 0.5 * (ww - 1)
    y = (np.arange(wh) - my) / my
    x = (np.arange(ww) - mx) / mx
    d2 = y[:, None] ** 2 + x[None, :] ** 2
    w = np.exp(-2.0 * d2)
    return (w / w.sum()).astype(np.float32)


def _window_origins(dh: int, dw: int, wh: int, ww: int):
    """Static window grid: ~50% overlap, edges included (:319-324,354-357)."""
    num_x = (dw - ww) // (ww // 2) + 2
    num_y = (dh - wh) // (wh // 2) + 2
    xs = [((dw - ww) * ix) // (num_x - 1) for ix in range(num_x)]
    ys = [((dh - wh) * iy) // (num_y - 1) for iy in range(num_y)]
    return ys, xs


def _find_peaks(ccorr, wh: int, ww: int):
    """Top-2 peaks with half-peak sub-sample refinement, batched.

    ccorr: (N, wh, ww) real correlation surfaces (cyclic).  Returns
    (dy, dx) float32 (N, 2) for first and second peak
    (schrophasecorrelation.c:129-179: find_peak called twice, the first
    peak's 3x3 neighbourhood zeroed in between).
    """
    n = ccorr.shape[0]
    flat0 = ccorr.reshape(n, wh * ww)

    def at(flat, iy, ix):
        return jnp.take_along_axis(
            flat, ((iy % wh) * ww + (ix % ww))[:, None], axis=1)[:, 0]

    def one_peak(flat):
        i = jnp.argmax(flat, axis=1)
        peak = jnp.take_along_axis(flat, i[:, None], axis=1)[:, 0]
        ix = i % ww
        iy = i // ww
        sx = jnp.where(ix >= ww // 2, ix - ww, ix)
        sy = jnp.where(iy >= wh // 2, iy - wh, iy)
        safe = jnp.where(peak != 0, peak, 1.0)
        a = at(flat, iy, ix + 1)
        b = at(flat, iy, ix - 1)
        dx = jnp.where(a > b, sx + 0.5 * a / safe, sx - 0.5 * b / safe)
        a = at(flat, iy + 1, ix)
        b = at(flat, iy - 1, ix)
        dy = jnp.where(a > b, sy + 0.5 * a / safe, sy - 0.5 * b / safe)
        dx = jnp.where(peak != 0, dx, 0.0)
        dy = jnp.where(peak != 0, dy, 0.0)
        # zero the 3x3 neighbourhood for the next peak (:170-178)
        oy = jnp.arange(-1, 2)
        ox = jnp.arange(-1, 2)
        ny = (iy[:, None, None] + oy[None, :, None]) % wh
        nx = (ix[:, None, None] + ox[None, None, :]) % ww
        kill = (ny * ww + nx).reshape(n, 9)
        mask = jnp.zeros_like(flat).at[
            jnp.arange(n)[:, None], kill].set(1.0)
        return dy, dx, flat * (1.0 - mask)

    dy1, dx1, flat1 = one_peak(flat0)
    dy2, dx2, _ = one_peak(flat1)
    return jnp.stack([dy1, dy2], 1), jnp.stack([dx1, dx2], 1)


def make_phasecorr_fn(H: int, W: int, levels=(0, 1)):
    """Jitted (cur_y u8 (H,W), ref_y u8) -> (n_total, 2, 2) int32 vectors.

    Output [k, p] = (dy, dx) of peak p of window k, in full-res pels
    (rint(-d << picture_shift), schrophasecorrelation.c:386-397), windows
    of all requested levels concatenated.  Levels whose window exceeds the
    downsampled frame are skipped (:483-486).
    """
    dh, dw = H >> PICTURE_SHIFT, W >> PICTURE_SHIFT
    plans = []
    for lev in levels:
        ww, wh = 1 << (5 + lev), 1 << (4 + lev)
        if dw < ww or dh < wh:
            continue
        ys, xs = _window_origins(dh, dw, wh, ww)
        oy = np.repeat(ys, len(xs)).astype(np.int32)
        ox = np.tile(xs, len(ys)).astype(np.int32)
        # constant gather indices: win[k, j, i] = img[oy[k]+j, ox[k]+i]
        iy = oy[:, None, None] + np.arange(wh)[None, :, None]
        ix = ox[:, None, None] + np.arange(ww)[None, None, :]
        plans.append((wh, ww, jnp.asarray(iy), jnp.asarray(ix),
                      jnp.asarray(_gauss_weight(wh, ww))))

    def run(cur, ref):
        c = downsample2(downsample2(cur)).astype(jnp.float32)
        r = downsample2(downsample2(ref)).astype(jnp.float32)
        outs = []
        for wh, ww, iy, ix, wt in plans:
            def prep(img):
                win = img[iy, ix] * wt          # (N, wh, ww)
                s = win.sum(axis=(1, 2), keepdims=True)
                win = win / jnp.where(s != 0, s, 1.0)  # get_image (:104-127)
                return jnp.fft.fft2(win)
            f1 = prep(c)
            f2 = prep(r)
            cross = f1 * jnp.conj(f2)           # complex_mult of conj (:369)
            mag = jnp.abs(cross)
            cross = cross / jnp.where(mag > 0, mag, 1.0)  # normalize (:28-40)
            ccorr = jnp.real(jnp.fft.ifft2(cross)) * (wh * ww)
            dy, dx = _find_peaks(ccorr, wh, ww)
            v = jnp.stack([dy, dx], axis=-1)    # (N, 2, 2)
            outs.append(jnp.round(-v * (1 << PICTURE_SHIFT)).astype(jnp.int32))
        if not outs:
            return jnp.zeros((1, 2, 2), jnp.int32)
        return jnp.concatenate(outs, axis=0)

    return jax.jit(run)


def pick_candidates(vecs, n: int = 8, vmax: int = 240) -> np.ndarray:
    """Distil window vectors into the n most common distinct (dy, dx).

    Host-side (tiny input).  Zero-padded to exactly n rows; the zero vector
    is harmless as an extra SAD candidate.
    """
    v = np.asarray(vecs).reshape(-1, 2)
    v = v[(np.abs(v) <= vmax).all(axis=1)]
    if len(v) == 0:
        return np.zeros((n, 2), np.int32)
    uniq, counts = np.unique(v, axis=0, return_counts=True)
    order = np.argsort(-counts)
    out = np.zeros((n, 2), np.int32)
    take = min(n, len(uniq))
    out[:take] = uniq[order[:take]]
    from schroedinger_tpu.utils.telemetry import dump, dump_enabled
    if dump_enabled("phase_corr"):
        dump("phase_corr", " ".join("%d,%d:%d" % (dy, dx, c) for (dy, dx), c
                                    in zip(uniq[order[:take]],
                                           counts[order[:take]])))
    return out
