"""Batched DLT two-view triangulation + validity gating.

Replaces `cv::triangulatePoints` + the reference's gating logic
(`/root/reference/src/Slam.cpp:1246-1356`): cheirality in both views,
depth range, reprojection error in both views, and camera-distance cap
(`include/Config.h:70-73`). All per-match loops become one batched
4x4 solve.
"""

from __future__ import annotations

import jax.numpy as jnp

from vslam_tpu.ops import camera as cam
from vslam_tpu.ops import se3


def projection_matrix(R_cw, t_cw, fx, fy, cx, cy):
    """3x4 projection P = K [R_cw | t_cw] mapping world -> pixels.

    Note (R_cw, t_cw) is world-to-camera (inverse of our stored pose).
    """
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=R_cw.dtype)
    Rt = jnp.concatenate([R_cw, t_cw[..., None]], axis=-1)
    return K @ Rt


def triangulate_dlt(P1, P2, uv1, uv2):
    """Linear DLT triangulation.

    Args:
      P1, P2: (3, 4) projection matrices (world -> pixel homogeneous).
      uv1, uv2: (..., 2) pixel observations.

    Returns:
      World points (..., 3).

    The 4x4 homogeneous system is solved with a closed-form smallest-
    singular-vector via SVD, batched over leading axes (TPU: one fused
    batched kernel instead of the per-point loop in cv::triangulatePoints).
    """
    rows = []
    for P, uv in ((P1, uv1), (P2, uv2)):
        u, v = uv[..., 0], uv[..., 1]
        rows.append(u[..., None] * P[2] - P[0])
        rows.append(v[..., None] * P[2] - P[1])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    from vslam_tpu.ops import linalg

    Xh = linalg.svd4x4_nullvec(A)
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w[..., None]


def triangulate_two_view(
    R1, t1, R2, t2, uv1, uv2, fx, fy, cx, cy,
    min_depth=0.05, max_depth=50.0, max_reproj_px=3.0, max_cam_dist=5.0,
):
    """Triangulate + apply the reference's full validity gate set.

    Poses (R*, t*) are camera-to-world. Returns (pts_world (..., 3),
    valid (...,) bool). Gates mirror `src/Slam.cpp:1312-1334`.
    """
    R1_cw = jnp.swapaxes(R1, -1, -2)
    t1_cw = -(R1_cw @ t1[..., None])[..., 0]
    R2_cw = jnp.swapaxes(R2, -1, -2)
    t2_cw = -(R2_cw @ t2[..., None])[..., 0]
    P1 = projection_matrix(R1_cw, t1_cw, fx, fy, cx, cy)
    P2 = projection_matrix(R2_cw, t2_cw, fx, fy, cx, cy)

    X = triangulate_dlt(P1, P2, uv1, uv2)

    # Camera-frame depths (cheirality both views + range)
    Xc1 = se3.transform_points(R1_cw, t1_cw, X)
    Xc2 = se3.transform_points(R2_cw, t2_cw, X)
    z1, z2 = Xc1[..., 2], Xc2[..., 2]

    uv1_hat, v1ok = cam.project(Xc1, fx, fy, cx, cy)
    uv2_hat, v2ok = cam.project(Xc2, fx, fy, cx, cy)
    e1 = jnp.linalg.norm(uv1_hat - uv1, axis=-1)
    e2 = jnp.linalg.norm(uv2_hat - uv2, axis=-1)

    dist1 = jnp.linalg.norm(X - t1[..., None, :] if t1.ndim < X.ndim else X - t1, axis=-1)

    valid = (
        (z1 > min_depth)
        & (z2 > min_depth)
        & (z1 < max_depth)
        & (z2 < max_depth)
        & v1ok
        & v2ok
        & (e1 <= max_reproj_px)
        & (e2 <= max_reproj_px)
        & (dist1 <= max_cam_dist)
    )
    return X, valid
