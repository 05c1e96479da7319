"""Global (affine) motion estimation from a block MV field.

TPU-native replacement for the reference's schro_encoder_global_estimation
(schroglobalest.c:65-221): the reference iterates scalar accumulation loops
with outlier rejection over 4 rounds (and is disabled as broken,
schroencoder.c:649-650).  Here the fit is one vectorized weighted
least-squares solve per round — design matrix [1, x, y] against each MV
component — with the same residual-variance outlier gate (r^2 < 16*var).

Conversion to Dirac global-motion parameters follows the renderer's exact
fixed-point model (ops/obmc.global_vectors, schromotionref.c
schro_motion_get_global_vector):

    v_prec(x, y) = (a . p + (1 << a_exp) * b) >> a_exp      (c == 0)

with v in 1/2^prec-pel units, so a = rint(M * 2^(a_exp + prec)) for a
fitted pel-unit affine M, b = rint(pan_pel * 2^prec).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from schroedinger_tpu.params import GlobalMotion, Params

A_EXP = 16


def fit_affine_mv_field(dy, dx, xs, ys, n_rounds: int = 4):
    """Least-squares fit of (dx, dy) ~ b + M @ (x, y) with outlier rejection.

    dy, dx: (N,) MV components (any consistent unit); xs, ys: (N,) block
    centre coordinates in pixels.  Returns (b0, b1, m00, m01, m10, m11,
    inlier_mask) in the same units as dx/dy per pixel.
    """
    dy = jnp.asarray(dy, jnp.float32).ravel()
    dx = jnp.asarray(dx, jnp.float32).ravel()
    xs = jnp.asarray(xs, jnp.float32).ravel()
    ys = jnp.asarray(ys, jnp.float32).ravel()
    n = dx.shape[0]
    A = jnp.stack([jnp.ones(n, jnp.float32), xs, ys], axis=1)
    w = jnp.ones(n, jnp.float32)

    sol_x = sol_y = None
    for _ in range(n_rounds):
        Aw = A * w[:, None]
        # weighted normal equations (3x3 solve; lstsq of masked rows)
        G = Aw.T @ A
        sol_x = jnp.linalg.solve(G, Aw.T @ dx)
        sol_y = jnp.linalg.solve(G, Aw.T @ dy)
        rx = dx - A @ sol_x
        ry = dy - A @ sol_y
        r2 = rx * rx + ry * ry
        var = jnp.maximum((r2 * w).sum() / jnp.maximum(w.sum(), 1.0), 1.0)
        w = (r2 < 16.0 * var).astype(jnp.float32)

    b0, m00, m01 = (float(sol_x[0]), float(sol_x[1]), float(sol_x[2]))
    b1, m10, m11 = (float(sol_y[0]), float(sol_y[1]), float(sol_y[2]))
    return b0, b1, m00, m01, m10, m11, np.asarray(w) > 0


def estimate_global_motion(mv_fields, p: Params, ref: int = 1) -> GlobalMotion:
    """Fit a GlobalMotion from an estimated MV field dict (estimate_motion
    output: dy1/dx1 in 1/2^prec-pel units on the (ynb, xnb) block grid).

    Only MC blocks predicting from `ref` participate; DC blocks are excluded
    up front (the reference instead trims a fixed border, a cruder inlier
    prior)."""
    xnb, ynb = p.x_num_blocks, p.y_num_blocks
    sfx = str(ref)
    dxf = np.asarray(mv_fields["dx" + sfx], np.float32)
    dyf = np.asarray(mv_fields["dy" + sfx], np.float32)
    mode = np.asarray(mv_fields["pred_mode"], np.int32)
    use = (mode & ref) != 0
    ii, jj = np.meshgrid(np.arange(xnb), np.arange(ynb))
    xs = (ii * p.xbsep_luma + p.xbsep_luma // 2).astype(np.float32)
    ys = (jj * p.ybsep_luma + p.ybsep_luma // 2).astype(np.float32)
    if use.sum() < 8:  # degenerate field: identity
        return GlobalMotion()
    b0, b1, m00, m01, m10, m11, inliers = fit_affine_mv_field(
        dyf[use], dxf[use], xs[use], ys[use])
    sol = (b0, b1, m00, m01, m10, m11)
    if inliers.sum() < 3 or not all(np.isfinite(v) for v in sol):
        # outlier gate left a singular/near-collinear system: identity
        return GlobalMotion()

    prec = p.mv_precision
    gm = GlobalMotion()
    # dx* are already in 1/2^prec units; b is coded in the same units,
    # a in units of 2^-(a_exp) prec-units per pel
    # +0.5 turns the renderer's floor shift (>> a_exp) into round-to-nearest
    gm.b0 = int(np.rint(b0 + 0.5))
    gm.b1 = int(np.rint(b1 + 0.5))
    gm.a_exp = A_EXP
    gm.a00 = int(np.rint(m00 * (1 << A_EXP)))
    gm.a01 = int(np.rint(m01 * (1 << A_EXP)))
    gm.a10 = int(np.rint(m10 * (1 << A_EXP)))
    gm.a11 = int(np.rint(m11 * (1 << A_EXP)))
    gm.c_exp = 0
    gm.c0 = 0
    gm.c1 = 0
    return gm
