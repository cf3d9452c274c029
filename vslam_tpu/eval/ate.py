"""Trajectory evaluation: ATE (Umeyama-aligned) and RPE.

Rebuilds the reference's built-in evaluation (`/root/reference/src/main.cpp:
258-332` compute_ate, `:346-389` compute_rpe): timestamp association with a
50 ms window, sim(3) Umeyama alignment, RMSE. Runs in JAX (the aligner is
the same batched Kabsch used by the 3D-3D solver) with a NumPy host wrapper
for ragged timestamp association.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import kabsch as kb


class ATEResult(NamedTuple):
    rmse: float
    mean: float
    median: float
    max: float
    num_pairs: int
    scale: float


class RPEResult(NamedTuple):
    rmse: float
    mean: float
    max: float
    num_pairs: int


def associate(ts_est, ts_gt, max_dt=0.05):
    """Associate estimated to ground-truth timestamps (<= max_dt apart).

    Mirrors `src/main.cpp:265-284` (nearest-neighbor in time). Host-side
    NumPy — ragged output sizes.
    Returns (idx_est, idx_gt) integer arrays.
    """
    ts_est = np.asarray(ts_est)
    ts_gt = np.asarray(ts_gt)
    pos = np.searchsorted(ts_gt, ts_est)
    pos = np.clip(pos, 1, len(ts_gt) - 1)
    left = ts_gt[pos - 1]
    right = ts_gt[pos]
    choose_right = np.abs(right - ts_est) < np.abs(ts_est - left)
    idx_gt = np.where(choose_right, pos, pos - 1)
    dt = np.abs(ts_gt[idx_gt] - ts_est)
    keep = dt <= max_dt
    return np.nonzero(keep)[0], idx_gt[keep]


def align_umeyama(est_xyz, gt_xyz, with_scale=True):
    """sim(3) alignment est -> gt. Returns (R, t, s)."""
    R, t, s = kb.kabsch(
        jnp.asarray(est_xyz, dtype=jnp.float32),
        jnp.asarray(gt_xyz, dtype=jnp.float32),
        with_scale=with_scale,
    )
    return np.asarray(R), np.asarray(t), float(s)


def compute_ate(ts_est, est_xyz, ts_gt, gt_xyz, max_dt=0.05, with_scale=True):
    """Absolute trajectory error after Umeyama alignment
    (`src/main.cpp:258-332`)."""
    ie, ig = associate(ts_est, ts_gt, max_dt)
    if len(ie) < 3:
        return ATEResult(float("inf"), float("inf"), float("inf"), float("inf"), len(ie), 1.0)
    e = np.asarray(est_xyz)[ie]
    g = np.asarray(gt_xyz)[ig]
    R, t, s = align_umeyama(e, g, with_scale=with_scale)
    aligned = s * e @ R.T + t
    err = np.linalg.norm(aligned - g, axis=-1)
    return ATEResult(
        rmse=float(np.sqrt(np.mean(err**2))),
        mean=float(np.mean(err)),
        median=float(np.median(err)),
        max=float(np.max(err)),
        num_pairs=len(ie),
        scale=s,
    )


def compute_rpe(ts_est, est_xyz, ts_gt, gt_xyz, max_dt=0.05, delta=1):
    """Relative pose (translation drift) error per step
    (`src/main.cpp:346-389`)."""
    ie, ig = associate(ts_est, ts_gt, max_dt)
    if len(ie) < delta + 2:
        return RPEResult(float("inf"), float("inf"), float("inf"), 0)
    e = np.asarray(est_xyz)[ie]
    g = np.asarray(gt_xyz)[ig]
    # Norm of the VECTOR difference of per-step displacements
    # (`src/main.cpp:368-380`): direction errors count, not just length.
    err = np.linalg.norm((e[delta:] - e[:-delta]) - (g[delta:] - g[:-delta]), axis=-1)
    return RPEResult(
        rmse=float(np.sqrt(np.mean(err**2))),
        mean=float(np.mean(err)),
        max=float(np.max(err)),
        num_pairs=len(err),
    )
