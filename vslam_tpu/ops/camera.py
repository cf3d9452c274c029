"""Pinhole camera projection / back-projection (batched, masked).

Replaces the projection math scattered through the reference
(`/root/reference/src/Optimizer.cpp:26-48` project_point,
`src/Slam.cpp:240-262` back-projection in the 3D-3D path,
`src/main.cpp:1116-1141` dense back-projection).
All functions broadcast over leading axes and carry validity masks instead
of variable-length point lists.
"""

from __future__ import annotations

import jax.numpy as jnp


def project(pts_cam, fx, fy, cx, cy, eps=1e-6):
    """Camera-frame points (..., 3) -> pixels (..., 2) + in-front mask.

    Returns (uv, valid) where valid = z > eps.
    """
    z = pts_cam[..., 2]
    valid = z > eps
    zs = jnp.where(valid, z, 1.0)
    u = fx * pts_cam[..., 0] / zs + cx
    v = fy * pts_cam[..., 1] / zs + cy
    return jnp.stack([u, v], axis=-1), valid


def backproject(uv, depth, fx, fy, cx, cy):
    """Pixels (..., 2) + depth (...) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normalize_pixels(uv, fx, fy, cx, cy):
    """Pixels -> normalized image coordinates (x/z, y/z)."""
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def denormalize(xn, fx, fy, cx, cy):
    return jnp.stack([xn[..., 0] * fx + cx, xn[..., 1] * fy + cy], axis=-1)


def in_image(uv, width, height, margin=0.0):
    """Mask of pixels inside the image bounds."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] <= width - 1 - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] <= height - 1 - margin)
    )


def bilinear_sample(img, uv, valid=None):
    """Bilinearly sample a (H, W) or (H, W, C) image at float pixels (..., 2).

    Out-of-bounds samples are clamped; pass `valid` to zero them instead.
    Used for depth lookup at keypoints (reference reads the nearest pixel,
    `src/Slam.cpp:243-246`; see `nearest_sample` for exact parity).
    """
    H, W = img.shape[0], img.shape[1]
    u = jnp.clip(uv[..., 0], 0.0, W - 1.0)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = u - u0.astype(u.dtype)
    fv = v - v0.astype(v.dtype)

    def gat(vi, ui):
        return img[vi, ui]

    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv
    if img.ndim == 3:
        w00, w01, w10, w11 = (w[..., None] for w in (w00, w01, w10, w11))
    out = (
        gat(v0, u0) * w00 + gat(v0, u1) * w01 + gat(v1, u0) * w10 + gat(v1, u1) * w11
    )
    if valid is not None:
        out = jnp.where(valid[..., None] if img.ndim == 3 else valid, out, 0.0)
    return out


def nearest_sample(img, uv):
    """Nearest-neighbor sample (reference depth lookup uses integer rounding,
    `src/Slam.cpp:243` `depth.at<float>(cvRound(y), cvRound(x))`)."""
    H, W = img.shape[0], img.shape[1]
    u = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    return img[v, u]
