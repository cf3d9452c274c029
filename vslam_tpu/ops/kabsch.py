"""Weighted Kabsch / Umeyama rigid (+ similarity) alignment, batch-first.

Replaces the reference's 3-point SVD rigid solve inside the 3D-3D RANSAC
(`/root/reference/src/Slam.cpp:278-318`), its all-inlier refinement
(`src/Slam.cpp:324-358`) and the Umeyama sim(3) aligner used for ATE
(`src/main.cpp:286-325`). One function handles all three as masked,
vmappable closed-form solves — on TPU, 200 RANSAC hypotheses become a
single batched 3x3 SVD.
"""

from __future__ import annotations

import jax.numpy as jnp

from vslam_tpu.ops import linalg


def _svd3(M):
    """Batched SVD of (..., 3, 3) via the custom Jacobi kernel — XLA's
    generic svd costs ~1.4 ms for (256, 3, 3) on TPU and is less accurate
    in f32 (see ops.linalg)."""
    return linalg.svd3x3(M)


def kabsch(src, dst, weights=None, with_scale=False, eps=1e-9):
    """Solve R, t (and optionally s) minimizing sum_i w_i ||dst_i - (s R src_i + t)||^2.

    Args:
      src, dst: (..., N, 3) corresponding point sets.
      weights:  (..., N) nonnegative; zero weight drops a correspondence
                (the static-shape replacement for variable inlier lists).
      with_scale: also estimate isotropic scale (Umeyama) — used by ATE
                alignment (`src/main.cpp:286-325` does the same with s).

    Returns:
      (R, t, s): R (..., 3, 3) with det=+1, t (..., 3), s (...) scalar
      (s == 1 when with_scale=False).
    """
    dtype = src.dtype
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), eps)

    mu_src = jnp.sum(src * w[..., None], axis=-2)
    mu_dst = jnp.sum(dst * w[..., None], axis=-2)
    sc = src - mu_src[..., None, :]
    dc = dst - mu_dst[..., None, :]

    # Weighted cross-covariance (3x3): H = sum w_i dc_i sc_i^T
    H = jnp.einsum("...ni,...nj->...ij", dc * w[..., None], sc)
    U, S, Vt = _svd3(H)
    det = jnp.linalg.det(U @ Vt)
    # Reflection fix (reference does the same det flip, Slam.cpp:297-301)
    D = jnp.concatenate([jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]), det[..., None]], axis=-1)
    R = (U * D[..., None, :]) @ Vt

    if with_scale:
        var_src = jnp.sum(jnp.sum(sc * sc, axis=-1) * w, axis=-1)
        trace_DS = jnp.sum(S * D, axis=-1)
        s = trace_DS / jnp.maximum(var_src, eps)
    else:
        s = jnp.ones(src.shape[:-2], dtype=dtype)

    t = mu_dst - s[..., None] * (R @ mu_src[..., None])[..., 0]
    return R, t, s


def rigid_residuals(R, t, src, dst, s=None):
    """Per-point alignment error norms (..., N)."""
    from vslam_tpu.ops import se3

    if s is None:
        pred = se3.rotate_rows(R, src) + t[..., None, :]
    else:
        pred = s[..., None, None] * se3.rotate_rows(R, src) + t[..., None, :]
    return jnp.linalg.norm(dst - pred, axis=-1)
