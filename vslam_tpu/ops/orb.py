"""ORB-style fallback features (FAST + oriented BRIEF) in pure JAX.

The reference falls back to `cv::ORB::create(3000, 1.2, 8)` when the
SuperPoint model is absent (`/root/reference/src/FeatureExtractor.cpp:
12-15, 210-214`; `include/Config.h:48-50`). TPU-native equivalent:

- FAST-16 corner test vectorized over the whole image: the 16 Bresenham
  circle taps become 16 shifted image views; the "9 contiguous" arc test
  is a rolled AND-reduction — no per-pixel loops.
- Orientation by intensity centroid (patch moments as separable sums).
- rBRIEF descriptors sampled with the keypoint's rotation; bits are kept
  as +-1 float vectors so Hamming distance becomes an MXU dot product:
  hamming = (D - dot) / 2 — the same `knn2_ratio_match` machinery used
  for SuperPoint works unchanged (reference uses BF-Hamming + dist < 30,
  `src/Slam.cpp:1160-1171`).
- Scale pyramid: static per-level shapes, unrolled (8 levels, factor 1.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.ops import nms as nms_ops

# FAST-16 Bresenham circle offsets (radius 3), clockwise.
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)


def fast_score(img, threshold=0.08, arc=9):
    """FAST-16 corner response for every pixel of (H, W) image in [0, 1].

    Returns (H, W) score map (0 for non-corners): score = mean |diff| over
    the circle where the contiguous-arc test passes.
    """
    H, W = img.shape
    taps = []
    for dx, dy in _CIRCLE:
        taps.append(jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)))
    taps = jnp.stack(taps)  # (16, H, W)
    diff = taps - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def contiguous(mask):
        # arc-length contiguous True across the circular 16: AND of `arc`
        # consecutive rotations, any start.
        acc = jnp.zeros_like(mask[0], dtype=bool)
        for s in range(16):
            run = jnp.ones_like(mask[0], dtype=bool)
            for a in range(arc):
                run = run & mask[(s + a) % 16]
            acc = acc | run
        return acc

    is_corner = contiguous(bright) | contiguous(dark)
    score = jnp.mean(jnp.abs(diff), axis=0)
    score = jnp.where(is_corner, score, 0.0)
    # Kill the border (circle taps wrap around via roll)
    score = score.at[:3, :].set(0.0).at[-3:, :].set(0.0)
    score = score.at[:, :3].set(0.0).at[:, -3:].set(0.0)
    return score


def orientation(img, xy, patch=15):
    """Intensity-centroid orientation (degrees-free, radians) at keypoints."""
    H, W = img.shape
    r = patch // 2
    ys = jnp.arange(-r, r + 1)
    xs = jnp.arange(-r, r + 1)
    # Gather patches around keypoints
    cx = jnp.clip(xy[:, 0].astype(jnp.int32), r, W - 1 - r)
    cy = jnp.clip(xy[:, 1].astype(jnp.int32), r, H - 1 - r)
    yy = cy[:, None, None] + ys[None, :, None]
    xx = cx[:, None, None] + xs[None, None, :]
    p = img[yy, xx]  # (K, patch, patch)
    m10 = jnp.sum(p * xs[None, None, :], axis=(1, 2))
    m01 = jnp.sum(p * ys[None, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _brief_pattern(n_bits=256, patch=31, seed=7):
    """Deterministic BRIEF point pairs ~ N(0, (patch/5)^2), clipped."""
    rng = np.random.default_rng(seed)
    r = patch // 2
    pts = np.clip(rng.normal(0, patch / 5.0, (n_bits, 4)), -r, r)
    return jnp.asarray(pts, jnp.float32)  # (bits, [x1 y1 x2 y2])


@functools.partial(jax.jit, static_argnames=("n_bits",))
def brief_descriptors(img, xy, angles, n_bits=256):
    """Rotated BRIEF: (K, n_bits) float descriptors in {-1, +1} (L2-
    normalized to unit length so MXU matching applies directly)."""
    pat = _brief_pattern(n_bits)
    c, s = jnp.cos(angles), jnp.sin(angles)
    # rotate pattern per keypoint: (K, bits, 2) for both endpoints
    def rot(px, py):
        return (
            c[:, None] * px[None, :] - s[:, None] * py[None, :],
            s[:, None] * px[None, :] + c[:, None] * py[None, :],
        )

    x1, y1 = rot(pat[:, 0], pat[:, 1])
    x2, y2 = rot(pat[:, 2], pat[:, 3])
    H, W = img.shape

    def sample(dx, dy):
        u = jnp.clip(xy[:, 0:1] + dx, 0, W - 1)
        v = jnp.clip(xy[:, 1:2] + dy, 0, H - 1)
        ui = u.astype(jnp.int32)
        vi = v.astype(jnp.int32)
        return img[vi, ui]

    a = sample(x1, y1)
    b = sample(x2, y2)
    bits = jnp.where(a < b, 1.0, -1.0)  # (K, bits)
    return bits / jnp.sqrt(jnp.asarray(n_bits, jnp.float32))


def detect_orb(
    img,
    max_keypoints=400,
    num_levels=8,
    scale_factor=1.2,
    threshold=0.08,
    nms_radius=4,
):
    """Multi-scale ORB detection on one (H, W) grayscale [0,1] image.

    Returns (xy (K, 2), score (K,), valid (K,), desc (K, 256)) at
    full-image coordinates — drop-in compatible with the SuperPoint
    frontend outputs.
    """
    H, W = img.shape
    per_level = max(max_keypoints // num_levels, 16)
    all_xy, all_score, all_valid, all_desc = [], [], [], []
    cur = img
    scale = 1.0
    for lvl in range(num_levels):
        score = fast_score(cur, threshold=threshold)
        kept = nms_ops.nms_local_max(score[None], radius=nms_radius, conf_threshold=1e-6)
        kps = nms_ops.topk_keypoints(kept, per_level)
        ang = orientation(cur, kps.xy[0])
        desc = brief_descriptors(cur, kps.xy[0], ang)
        all_xy.append(kps.xy[0] * scale)
        all_score.append(kps.score[0])
        all_valid.append(kps.valid[0])
        all_desc.append(desc)
        # Next pyramid level (static shapes per level)
        scale *= scale_factor
        nh, nw = int(round(H / scale)), int(round(W / scale))
        if nh < 32 or nw < 32:
            break
        cur = jax.image.resize(img, (nh, nw), method="bilinear")

    xy = jnp.concatenate(all_xy)
    sc = jnp.concatenate(all_score)
    va = jnp.concatenate(all_valid)
    de = jnp.concatenate(all_desc)
    # Global top-K across levels
    order = jnp.argsort(-jnp.where(va, sc, -1.0))[:max_keypoints]
    return xy[order], sc[order], va[order], de[order]
