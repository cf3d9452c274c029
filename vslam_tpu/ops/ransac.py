"""Batched RANSAC: hypothesis generation as one vmapped solve.

The reference runs sequential RANSAC loops — 200 iterations of 3-point
Kabsch (`/root/reference/src/Slam.cpp:214-375`), OpenCV's internal loops
for F/E/PnP. On TPU the idiomatic form is: sample ALL minimal sets at
once, solve them as one batched kernel (batched 3x3/9x9 SVDs ride the
MXU/VPU), score all hypotheses against all correspondences with one
(B, N) residual matrix, argmax inlier count, then refine on the winning
inlier set with a masked full solve.

Determinism: keyed by `jax.random.PRNGKey(seed + frame_id)` mirroring the
reference's per-frame `mt19937(42 + frame_count_)` (`src/Slam.cpp:276`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.ops import epipolar as epi
from vslam_tpu.ops import kabsch as kb


def sample_minimal_sets(key, valid, num_hypotheses, set_size):
    """Sample `num_hypotheses` index sets of `set_size` valid entries.

    Compaction + modular draw: valid indices are compacted to the front
    (one argsort), then uniform ints mod n_valid pick entries. Duplicates
    within a set are possible (~set_size^2 / 2n probability) and merely
    waste that hypothesis — its degenerate solve loses the inlier argmax.
    (A Gumbel-top-k guarantees distinctness but costs ~0.3 ms/call on TPU,
    ~10% of the whole tracking step.)
    Returns (B, set_size) int32 indices.
    """
    n = valid.shape[-1]
    order = jnp.argsort(~valid, stable=True).astype(jnp.int32)  # valid first
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    u = jax.random.randint(key, (num_hypotheses, set_size), 0, n, dtype=jnp.int32)
    return order[u % n_valid]


class RansacResult(NamedTuple):
    inlier_mask: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool — enough inliers / valid model


def ransac_kabsch_3d3d(
    key,
    src,
    dst,
    valid,
    num_hypotheses=256,
    inlier_thresh=0.05,
    max_translation=0.2,
    min_translation=1e-4,
    min_inliers=3,
):
    """3D-3D rigid motion RANSAC (reference `estimate_motion_3d3d`,
    `src/Slam.cpp:214-375`).

    Args:
      src, dst: (N, 3) matched camera-frame points (src = previous KF,
        dst = current frame); solves dst ≈ R src + t.
      valid: (N,) mask of usable correspondences.

    Returns:
      (R, t, RansacResult). Gates mirror the reference: inliers at 5 cm,
      reject ||t|| > 0.2 m or < 0.1 mm (`src/Slam.cpp:360-371`).
    """
    n = src.shape[0]
    idx = sample_minimal_sets(key, valid, num_hypotheses, 3)  # (B, 3)
    s3 = src[idx]  # (B, 3, 3)
    d3 = dst[idx]
    R_h, t_h, _ = kb.kabsch(s3, d3)  # batched minimal solves

    # Score all hypotheses against all correspondences: (B, N) residuals.
    res = kb.rigid_residuals(R_h, t_h, src[None], dst[None])
    inl = (res < inlier_thresh) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)

    # Hypothesis validity: translation magnitude gates.
    tn = jnp.linalg.norm(t_h, axis=-1)
    h_ok = (tn <= max_translation) & (tn >= min_translation)
    scores = jnp.where(h_ok, counts, -1)
    best = jnp.argmax(scores)

    best_inl = inl[best]
    # All-inlier refinement (reference refines with SVD over inliers,
    # src/Slam.cpp:324-358).
    w = best_inl.astype(src.dtype)
    R, t, _ = kb.kabsch(src, dst, weights=w)
    # Re-score after refinement.
    res_f = kb.rigid_residuals(R, t, src, dst)
    final_inl = (res_f < inlier_thresh) & valid
    n_inl = jnp.sum(final_inl)
    tn_f = jnp.linalg.norm(t)
    ok = (
        (n_inl >= min_inliers)
        & (tn_f <= max_translation)
        & (tn_f >= min_translation)
        & (scores[best] > 0)
    )
    return R, t, RansacResult(final_inl, n_inl, ok)


def ransac_fundamental(
    key,
    uv1,
    uv2,
    valid,
    num_hypotheses=256,
    threshold_px=3.0,
    min_inliers=8,
):
    """Fundamental-matrix RANSAC gate (reference uses
    cv::findFundamentalMat(FM_RANSAC, 3.0, 0.999), `src/Slam.cpp:885`).

    Returns (F, RansacResult); inliers by Sampson distance.
    """
    idx = sample_minimal_sets(key, valid, num_hypotheses, 8)
    F_h = epi.eight_point(uv1[idx], uv2[idx])  # (B, 3, 3)
    d = epi.sampson_distance(F_h, uv1[None], uv2[None])  # (B, N)
    inl = (d < threshold_px) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    w = inl[best].astype(uv1.dtype)
    F = epi.eight_point(uv1, uv2, weights=w, nullvec_iters=10)
    d_f = epi.sampson_distance(F, uv1, uv2)
    final_inl = (d_f < threshold_px) & valid
    n_inl = jnp.sum(final_inl)
    return F, RansacResult(final_inl, n_inl, n_inl >= min_inliers)


def ransac_essential(
    key,
    uv1,
    uv2,
    valid,
    fx,
    fy,
    cx,
    cy,
    num_hypotheses=256,
    threshold_px=1.0,
    min_inliers=15,
    polish_iters=8,
):
    """Essential-matrix RANSAC (reference `cv::findEssentialMat(RANSAC,
    0.999, 1.0)` + recoverPose, `src/Slam.cpp:1193-1213`).

    Returns (R, t, E, RansacResult) with x2 = R x1 + t, ||t|| = 1.
    Thresholding is Sampson distance in pixels via F = K^-T E K^-1.

    `polish_iters` > 0 adds a Gauss-Newton Sampson polish of the
    recovered (R, t) over the inlier set (`epipolar.refine_pose_sampson`)
    — NEW vs the reference's algebraic-only estimate; set 0 for the
    reference behavior.
    """
    from vslam_tpu.ops import camera as cam

    xn1 = cam.normalize_pixels(uv1, fx, fy, cx, cy)
    xn2 = cam.normalize_pixels(uv2, fx, fy, cx, cy)
    idx = sample_minimal_sets(key, valid, num_hypotheses, 8)
    E_h = epi.eight_point(xn1[idx], xn2[idx], essential=True)  # (B, 3, 3)

    Kinv_T_E_Kinv = _E_to_pixel_F(E_h, fx, fy, cx, cy)
    d = epi.sampson_distance(Kinv_T_E_Kinv, uv1[None], uv2[None])
    inl = (d < threshold_px) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    w = inl[best].astype(uv1.dtype)
    E = epi.eight_point(xn1, xn2, weights=w, essential=True, nullvec_iters=10)
    F_px = _E_to_pixel_F(E, fx, fy, cx, cy)
    d_f = epi.sampson_distance(F_px, uv1, uv2)
    final_inl = (d_f < threshold_px) & valid

    R, t, n_good, good = epi.recover_pose(E, uv1, uv2, fx, fy, cx, cy, mask=final_inl)
    if polish_iters > 0:
        R, t = epi.refine_pose_sampson(
            R, t, xn1, xn2,
            (final_inl & good).astype(uv1.dtype), iters=polish_iters,
        )
    n_inl = jnp.sum(final_inl)
    det_ok = jnp.abs(jnp.linalg.det(R) - 1.0) < 1e-3
    ok = (n_good >= min_inliers) & det_ok
    return R, t, E, RansacResult(final_inl & good, n_good, ok)


def _E_to_pixel_F(E, fx, fy, cx, cy):
    """F (pixel coords) = K^-T E K^-1, normalized."""
    Kinv = jnp.array(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]],
        dtype=E.dtype,
    )
    F = Kinv.T @ E @ Kinv
    nrm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    return F / jnp.maximum(nrm, 1e-12)
