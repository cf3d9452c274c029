"""Perspective-n-Point: batched DLT-RANSAC + Gauss-Newton refinement.

Replaces the reference's `cv::solvePnPRansac` wrapper (`/root/reference/
src/Slam.cpp:505-529`) used by local refinement (`:1373-1473`), periodic
global PnP (`:1477-1522`), tracking-loss recovery (`:535-613`) and loop
verification (`:778-782`), plus the dead LM pose optimizer
(`src/Optimizer.cpp:54-180`) whose math the GN refiner supersedes with
analytic Jacobians.

Design: minimal 6-point DLT pose solves for all RANSAC hypotheses as one
batched 12x12 eigen-solve; inlier scoring as one (B, N) reprojection
matrix; winner refined by a fixed-iteration Huber-IRLS Gauss-Newton on
se(3) (6x6 solves — `lax.fori_loop`-friendly, no data-dependent shapes).

Conventions: world points `X` (N, 3), pixel observations `uv` (N, 2).
Internally solves the world->camera pose (R_cw, t_cw); returns the
camera-to-world pose (R, t) used across the framework.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.ops import camera as cam
from vslam_tpu.ops import se3
from vslam_tpu.ops.ransac import sample_minimal_sets


def _dlt_pose(X, xn):
    """Minimal/least-squares DLT pose from world points + normalized obs.

    Args:
      X: (..., N, 3) world points (N >= 6).
      xn: (..., N, 2) normalized image coordinates.

    Returns:
      (R_cw, t_cw) with orthonormalized R, cheirality-corrected sign.
    """
    N = X.shape[-2]
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    x, y = xn[..., 0:1], xn[..., 1:2]
    # Rows: [X 0 -x*X ; 0 X -y*X] with unknowns [P1 P2 P3] rows of [R|t]
    r1 = jnp.concatenate([Xh, zeros, -x * Xh], axis=-1)  # (..., N, 12)
    r2 = jnp.concatenate([zeros, Xh, -y * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 12)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    from vslam_tpu.ops import linalg

    # The minimal 6-point system (12 rows, 12 unknowns) has an exact 1-D
    # nullspace: shift-and-invert beats a 99-round Jacobi 12x12 eigh.
    p = linalg.smallest_eigvec_psd(AtA)
    P = p.reshape(*p.shape[:-1], 3, 4)
    R_raw = P[..., :3]
    t_raw = P[..., 3]
    # Fix scale via singular values of R_raw, orthonormalize.
    _, svals, _ = linalg.svd3x3(R_raw)
    scale = jnp.mean(svals, axis=-1)
    scale = jnp.where(scale < 1e-12, 1e-12, scale)
    R = se3.orthonormalize(R_raw / scale[..., None, None])
    t = t_raw / scale[..., None]
    # Cheirality: majority of points should land in front.
    z = se3.transform_points(R, t, X)[..., 2]
    front = jnp.mean(jnp.sign(z), axis=-1)
    flip = front < 0
    # Negating p flips both R and t; R must stay a rotation -> rotate by pi
    # around... instead rebuild from -P.
    Rn = se3.orthonormalize(-R_raw / scale[..., None, None])
    tn = -t
    R = jnp.where(flip[..., None, None], Rn, R)
    t = jnp.where(flip[..., None], tn, t)
    return R, t


def gn_refine_pose(
    R_cw,
    t_cw,
    X,
    uv,
    weights,
    fx,
    fy,
    cx,
    cy,
    iters=10,
    huber_px=5.0,
    damping=1e-3,
):
    """Huber-IRLS Gauss-Newton pose refinement on se(3).

    Analytic Jacobians (the dead reference optimizer used numeric ones,
    `src/Optimizer.cpp:100-131`). Fixed iteration count — jit-stable.
    """
    dtype = X.dtype

    def body(_, carry):
        R, t = carry
        # Explicit linear combination instead of X @ R.T: exact f32 on the
        # VPU — under the tracking step's f32 pin a (N,3)x(3,3) MXU matmul
        # costs 6 bf16 passes of pure latency.
        p = (
            X[..., 0:1] * R[:, 0][None]
            + X[..., 1:2] * R[:, 1][None]
            + X[..., 2:3] * R[:, 2][None]
            + t
        )  # camera-frame points (N, 3)
        z = jnp.maximum(p[..., 2], 1e-6)
        u = fx * p[..., 0] / z + cx
        v = fy * p[..., 1] / z + cy
        r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], axis=-1)  # (N, 2)
        rn = jnp.linalg.norm(r, axis=-1)
        w_h = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        w = weights * w_h * (p[..., 2] > 1e-6)

        # d(uv)/dp
        zi = 1.0 / z
        J_proj = jnp.stack(
            [
                jnp.stack([fx * zi, jnp.zeros_like(zi), -fx * p[..., 0] * zi * zi], -1),
                jnp.stack([jnp.zeros_like(zi), fy * zi, -fy * p[..., 1] * zi * zi], -1),
            ],
            axis=-2,
        )  # (N, 2, 3)
        # dp/d[w, dt] with left perturbation p' = exp(w) p + dt:
        # J = J_proj @ [-hat(p) | I]; the rotation block per row is
        # j @ (-hat(p)) = p x j — cross products, no batched matmul.
        J_rot = jnp.cross(p[..., None, :], J_proj)  # (N, 2, 3)
        J = jnp.concatenate([J_rot, J_proj], axis=-1)  # (N, 2, 6)

        JW = (J * w[..., None, None]).reshape(-1, 6)  # (2N, 6)
        Jf = J.reshape(-1, 6)
        H = JW.T @ Jf + damping * jnp.eye(6, dtype=dtype)
        g = JW.T @ r.reshape(-1)
        from vslam_tpu.ops import linalg

        delta = -linalg.cholesky_solve_small(H, g)
        dw, dt = delta[:3], delta[3:]
        dR = se3.exp_so3(dw)
        R_new = dR @ R
        t_new = (dR @ t[..., None])[..., 0] + dt
        return (R_new, t_new)

    R, t = jax.lax.fori_loop(0, iters, body, (R_cw, t_cw))
    return se3.orthonormalize(R), t


class PnPResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) camera-to-world
    t: jnp.ndarray  # (3,)
    inlier_mask: jnp.ndarray  # (N,)
    num_inliers: jnp.ndarray  # ()
    ok: jnp.ndarray  # ()


def ransac_pnp(
    key,
    X,
    uv,
    valid,
    fx,
    fy,
    cx,
    cy,
    num_hypotheses=256,
    threshold_px=8.0,
    min_inliers=10,
    gn_iters=10,
    huber_px=5.0,
):
    """solvePnPRansac equivalent (reference call `src/Slam.cpp:515`:
    iterationsCount=100..300, reprojectionError=8.0).

    Returns PnPResult with the camera-to-world pose.
    """
    xn = cam.normalize_pixels(uv, fx, fy, cx, cy)
    idx = sample_minimal_sets(key, valid, num_hypotheses, 6)
    R_h, t_h = _dlt_pose(X[idx], xn[idx])  # (B, 3, 3), (B, 3)

    # Reprojection residuals for all hypotheses: (B, N)
    p = se3.transform_points(R_h, t_h, X[None])
    uv_hat, front = cam.project(p, fx, fy, cx, cy)
    err = jnp.linalg.norm(uv_hat - uv[None], axis=-1)
    inl = (err < threshold_px) & front & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    w = inl[best].astype(X.dtype)
    R_cw, t_cw = gn_refine_pose(
        R_h[best], t_h[best], X, uv, w, fx, fy, cx, cy, iters=gn_iters, huber_px=huber_px
    )

    p_f = se3.transform_points(R_cw, t_cw, X)
    uv_f, front_f = cam.project(p_f, fx, fy, cx, cy)
    err_f = jnp.linalg.norm(uv_f - uv, axis=-1)
    final_inl = (err_f < threshold_px) & front_f & valid
    n_inl = jnp.sum(final_inl)
    ok = n_inl >= min_inliers

    R_wc, t_wc = se3.inverse(R_cw, t_cw)
    return PnPResult(R_wc, t_wc, final_inl, n_inl, ok)
