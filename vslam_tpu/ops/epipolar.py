"""Fundamental / Essential matrix estimation and pose recovery, batch-first.

Replaces the reference's OpenCV calib3d calls:
- `cv::findFundamentalMat(FM_RANSAC, 3.0, 0.999)` match gate
  (`/root/reference/src/Slam.cpp:879-910`),
- `cv::findEssentialMat(RANSAC, 0.999, 1.0)` + `cv::recoverPose`
  monocular motion (`src/Slam.cpp:1193-1213`),
- the symmetric epipolar diagnostics (`src/Slam.cpp:889-904`).

Everything is a masked, weighted, normalized 8-point solve that vmaps over
RANSAC hypothesis batches (see ops.ransac) — a few batched 3x3/9x9 SVDs on
the MXU instead of sequential minimal solves.

Conventions: correspondences (uv1, uv2) are pixels; E/F satisfy
x2^T F x1 = 0 with homogeneous pixel (F) or normalized (E) coordinates.
recover_pose returns (R, t) with x2 = R x1 + t (cam1 -> cam2, ||t|| = 1),
matching cv::recoverPose.
"""

from __future__ import annotations

import jax.numpy as jnp

from vslam_tpu.ops import camera as cam
from vslam_tpu.ops import linalg
from vslam_tpu.ops import se3


def _hartley_normalize(uv, w, eps=1e-9):
    """Weighted Hartley normalization. Returns (uv_n, T) with T (3, 3)."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), eps)
    mean = jnp.sum(uv * w[..., None], axis=-2) / wsum
    d = jnp.linalg.norm(uv - mean[..., None, :], axis=-1)
    mean_d = jnp.sum(d * w, axis=-1) / wsum[..., 0]
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, eps)
    uv_n = (uv - mean[..., None, :]) * s[..., None, None]
    z = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, z, -s * mean[..., 0]], axis=-1),
            jnp.stack([z, s, -s * mean[..., 1]], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )
    return uv_n, T


def eight_point(uv1, uv2, weights=None, essential=False, nullvec_iters=3):
    """Weighted normalized 8-point algorithm.

    Args:
      uv1, uv2: (..., N, 2) correspondences (N >= 8).
      weights: (..., N) soft/hard inlier weights; zero rows are dropped.
      essential: if True enforce singular values (1, 1, 0), else rank-2.
      nullvec_iters: shift-and-invert iterations for the null vector.
        3 suffices for minimal samples (exact 1-D nullspace); the
        over-determined all-inlier refits pass a higher count because
        noisy/near-degenerate geometry shrinks the spectral gap between
        the two smallest eigenvalues (each extra iteration damps the
        mixed-in second eigenvector by the eigenvalue ratio, and the
        refit runs once per RANSAC call, not per hypothesis).

    Returns:
      F (or E): (..., 3, 3), scaled so ||F||_F = 1.
    """
    dtype = uv1.dtype
    if weights is None:
        weights = jnp.ones(uv1.shape[:-1], dtype=dtype)
    uv1n, T1 = _hartley_normalize(uv1, weights)
    uv2n, T2 = _hartley_normalize(uv2, weights)

    x1, y1 = uv1n[..., 0], uv1n[..., 1]
    x2, y2 = uv2n[..., 0], uv2n[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (..., N, 9)
    A = A * weights[..., None]
    # Smallest right singular vector of A: the epipolar design matrix has
    # a (near-)null direction — the model itself — so shift-and-invert
    # iteration converges in ~2 steps where cyclic Jacobi on the 9x9
    # needs 72 sequential rotation rounds (see ops.linalg).
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    f = linalg.smallest_eigvec_psd(AtA, iters=nullvec_iters)
    F = f.reshape(*f.shape[:-1], 3, 3)

    # Enforce rank-2 in the normalized frame (rank survives the
    # denormalization congruence; isotropic-noise argument per Hartley).
    U, S, Vt = linalg.svd3x3(F)
    S_fixed = jnp.concatenate([S[..., :2], jnp.zeros_like(S[..., 2:3])], axis=-1)
    F = (U * S_fixed[..., None, :]) @ Vt

    # Denormalize: F = T2^T F_n T1
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1

    if essential:
        # The equal-singular-value structure of E is NOT invariant under the
        # (anisotropic-in-effect) Hartley similarity, so project onto the
        # essential manifold only after denormalization.
        U, S, Vt = linalg.svd3x3(F)
        s_mean = (S[..., 0] + S[..., 1]) * 0.5
        S_fixed = jnp.stack([s_mean, s_mean, jnp.zeros_like(s_mean)], axis=-1)
        F = (U * S_fixed[..., None, :]) @ Vt
    nrm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    return F / jnp.maximum(nrm, 1e-12)


def _homog(uv):
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


def epipolar_distance(F, uv1, uv2):
    """Symmetric epipolar distance (pixels), the reference's diagnostic
    metric (`src/Slam.cpp:889-904`). F in pixel coordinates."""
    x1 = _homog(uv1)
    x2 = _homog(uv2)
    l2 = x1 @ jnp.swapaxes(F, -1, -2)  # epiline in image 2
    l1 = x2 @ F  # epiline in image 1
    num = jnp.abs(jnp.sum(x2 * l2, axis=-1))
    d2 = num / jnp.maximum(jnp.linalg.norm(l2[..., :2], axis=-1), 1e-12)
    d1 = num / jnp.maximum(jnp.linalg.norm(l1[..., :2], axis=-1), 1e-12)
    return 0.5 * (d1 + d2)


def sampson_distance(F, uv1, uv2):
    """First-order geometric (Sampson) distance — cv::findFundamentalMat's
    internal inlier metric."""
    x1 = _homog(uv1)
    x2 = _homog(uv2)
    Fx1 = x1 @ jnp.swapaxes(F, -1, -2)
    Ftx2 = x2 @ F
    e = jnp.sum(x2 * Fx1, axis=-1)
    denom = (
        Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    )
    return jnp.abs(e) / jnp.sqrt(jnp.maximum(denom, 1e-12))


def essential_from_fundamental(F, fx, fy, cx, cy):
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=F.dtype)
    return K.T @ F @ K


def decompose_essential(E):
    """E -> two rotation candidates + unit translation.

    Returns (R1, R2, t) each (..., 3, 3) / (..., 3); candidate poses are
    (R1, t), (R1, -t), (R2, t), (R2, -t).
    """
    U, _, Vt = linalg.svd3x3(E)
    # Force proper rotations
    detU = jnp.linalg.det(U)
    detVt = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(detU)] * 2 + [detU], axis=-1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(detVt)] * 2 + [detVt], axis=-1)[..., :, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R1, R2, t


def _cheirality_count(R, t, xn1, xn2, mask):
    """Count correspondences with positive depth in both views for pose
    candidate x2 = R x1 + t. xn1/xn2 are normalized image coords (..., N, 2).

    Uses the midpoint-free linear depth solve: for each match,
    z1 * (R x̂1) + t = z2 * x̂2 with x̂ = (xn, 1).
    Solve the 2-unknown least squares in closed form.
    """
    h1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1)
    h2 = jnp.concatenate([xn2, jnp.ones_like(xn2[..., :1])], axis=-1)
    Rx1 = h1 @ jnp.swapaxes(R, -1, -2)
    # minimize || z1 * Rx1 - z2 * h2 + t ||^2 over (z1, z2)
    a = jnp.sum(Rx1 * Rx1, axis=-1)
    b = -jnp.sum(Rx1 * h2, axis=-1)
    c = jnp.sum(h2 * h2, axis=-1)
    d = -jnp.sum(Rx1 * t[..., None, :], axis=-1)
    e = jnp.sum(h2 * t[..., None, :], axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (d * c - b * e) / det
    z2 = (a * e - b * d) / det
    good = (z1 > 0) & (z2 > 0) & mask
    return jnp.sum(good, axis=-1), good


def recover_pose(E, uv1, uv2, fx, fy, cx, cy, mask=None):
    """cv::recoverPose equivalent: pick the (R, t) candidate with the most
    points in front of both cameras.

    Returns (R, t, n_good, good_mask) with x2 = R x1 + t, ||t|| = 1.
    """
    if mask is None:
        mask = jnp.ones(uv1.shape[:-1], dtype=bool)
    xn1 = cam.normalize_pixels(uv1, fx, fy, cx, cy)
    xn2 = cam.normalize_pixels(uv2, fx, fy, cx, cy)
    R1, R2, t = decompose_essential(E)

    cands_R = jnp.stack([R1, R1, R2, R2], axis=-3)
    cands_t = jnp.stack([t, -t, t, -t], axis=-2)

    counts = []
    goods = []
    for i in range(4):
        cnt, good = _cheirality_count(
            cands_R[..., i, :, :], cands_t[..., i, :], xn1, xn2, mask
        )
        counts.append(cnt)
        goods.append(good)
    counts = jnp.stack(counts, axis=-1)  # (..., 4)
    goods = jnp.stack(goods, axis=-2)  # (..., 4, N)
    best = jnp.argmax(counts, axis=-1)

    R = jnp.take_along_axis(cands_R, best[..., None, None, None], axis=-3)[..., 0, :, :]
    tt = jnp.take_along_axis(cands_t, best[..., None, None], axis=-2)[..., 0, :]
    n_good = jnp.take_along_axis(counts, best[..., None], axis=-1)[..., 0]
    good = jnp.take_along_axis(goods, best[..., None, None], axis=-2)[..., 0, :]
    R = se3.orthonormalize(R)
    return R, tt, n_good, good


def _sampson_signed(E, xn1, xn2):
    """Signed Sampson residual of E in NORMALIZED image coordinates
    (smooth in E — no abs — so GN Jacobians are well-defined)."""
    x1 = _homog(xn1)
    x2 = _homog(xn2)
    Ex1 = x1 @ jnp.swapaxes(E, -1, -2)
    Etx2 = x2 @ E
    e = jnp.sum(x2 * Ex1, axis=-1)
    denom = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
        + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return e / jnp.sqrt(jnp.maximum(denom, 1e-12))


def refine_pose_sampson(R, t, xn1, xn2, w, iters=8, damping=1e-8):
    """Gauss-Newton polish of a relative pose on the Sampson error.

    NEW vs the reference: `cv::findEssentialMat` + the weighted 8-point
    refit minimize an ALGEBRAIC error; this polishes the decomposed
    (R, t) directly on the first-order geometric (Sampson) distance over
    the inlier set — the standard two-view upgrade. On the coupled bench
    the essential-fallback frames carry ~10x the per-frame rotation error
    of the 3D-3D frames and dominate accumulated yaw drift; this is the
    targeted fix (diagnosis in BENCH_NOTES round 3).

    Parameterization: 5 DoF, xi = (dw in so(3), dv in T_t S^2);
    R' = exp(dw) R, t' = normalize(t + B dv) with B an orthonormal basis
    of the plane perpendicular to t. E(xi) = [t']_x R'.

    Args:
      R, t: initial pose, x2 = R x1 + t convention, ||t|| = 1.
      xn1, xn2: (N, 2) NORMALIZED coordinates.
      w: (N,) nonnegative weights (inlier mask as float).
      iters: GN steps; each step is accepted only if the weighted cost
        decreases (reject keeps the previous estimate, so the result is
        never worse than the input on this objective).

    Returns (R_ref, t_ref) with ||t_ref|| = 1.
    """
    import jax

    dtype = t.dtype
    eye5 = jnp.eye(5, dtype=dtype)

    def tangent_basis(tv):
        # Any consistent orthonormal (b1, b2) perpendicular to tv.
        a = jnp.where(
            jnp.abs(tv[0]) < 0.9,
            jnp.array([1.0, 0.0, 0.0], dtype),
            jnp.array([0.0, 1.0, 0.0], dtype),
        )
        b1 = jnp.cross(tv, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        b2 = jnp.cross(tv, b1)
        return jnp.stack([b1, b2], axis=-1)  # (3, 2)

    def residuals_at(xi, R0, t0, B):
        Rp = se3.exp_so3(xi[:3]) @ R0
        tp = t0 + B @ xi[3:]
        tp = tp / jnp.maximum(jnp.linalg.norm(tp), 1e-12)
        E = se3.hat(tp) @ Rp
        return _sampson_signed(E, xn1, xn2)

    def cost_at(xi, R0, t0, B):
        r = residuals_at(xi, R0, t0, B)
        return jnp.sum(w * r * r)

    def step(carry, _):
        R0, t0, c0 = carry
        B = tangent_basis(t0)
        zero = jnp.zeros(5, dtype)
        r = residuals_at(zero, R0, t0, B)
        J = jax.jacfwd(residuals_at)(zero, R0, t0, B)  # (N, 5)
        Jw = J * w[:, None]
        H = Jw.T @ J + damping * eye5
        g = Jw.T @ r
        # Small LM-style diagonal lift keyed to the Hessian scale.
        H = H + 1e-6 * jnp.trace(H) / 5.0 * eye5
        dxi = -linalg.cholesky_solve_small(H, g)
        c1 = cost_at(dxi, R0, t0, B)
        ok = c1 < c0
        R1 = jnp.where(ok, se3.exp_so3(dxi[:3]) @ R0, R0)
        t1 = t0 + B @ jnp.where(ok, dxi[3:], jnp.zeros(2, dtype))
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
        return (R1, t1, jnp.where(ok, c1, c0)), None

    import jax.lax as lax

    c_init = cost_at(jnp.zeros(5, dtype), R, t, tangent_basis(t))
    (R_ref, t_ref, _), _ = lax.scan(step, (R, t, c_init), None, length=iters)
    return se3.orthonormalize(R_ref), t_ref
