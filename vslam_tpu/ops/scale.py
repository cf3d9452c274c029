"""Monocular scale estimation from depth (two-view variant).

Rebuilds `Slam::estimate_scale_from_depth_two_view`
(`/root/reference/src/Slam.cpp:73-157`): for each match with valid depth
in BOTH frames, back-project to camera points P1, P2 and solve the
per-match scale s_i = (P2 - R P1) · t̂ along the translation direction;
IQR outlier rejection; median. The single-view variant (C13,
`src/Slam.cpp:162-207`) lives in `core.tracking._single_view_scale`.
"""

from __future__ import annotations

import jax.numpy as jnp

from vslam_tpu.ops import se3


def _masked_quantile(x, valid, q):
    """Quantile over valid entries (static shape): sort invalid to +inf."""
    n = jnp.sum(valid)
    xs = jnp.sort(jnp.where(valid, x, jnp.inf))
    idx = jnp.clip((q * jnp.maximum(n - 1, 0)).astype(jnp.int32), 0, x.shape[0] - 1)
    return xs[idx], n


def two_view_scale(R_rel, t_rel, p1, p2, valid, min_matches=5):
    """Scale of the unit translation t̂ from matched metric depths.

    Args:
      R_rel, t_rel: relative pose (x2 = R x1 + s t̂), ||t_rel|| ~ 1.
      p1, p2: (N, 3) camera-frame back-projections in frame 1 / frame 2.
      valid: (N,) both-depths-valid & match mask.

    Returns (scale, ok): median of IQR-filtered per-match scales
    (`Slam.cpp:118-152`), ok=False when too few samples or s <= 0.
    """
    t_hat = t_rel / jnp.maximum(jnp.linalg.norm(t_rel), 1e-9)
    s_i = jnp.sum((p2 - se3.rotate_rows(R_rel, p1)) * t_hat, axis=-1)  # (N,)
    ok_i = valid & jnp.isfinite(s_i)

    q1, _ = _masked_quantile(s_i, ok_i, 0.25)
    q3, _ = _masked_quantile(s_i, ok_i, 0.75)
    iqr = q3 - q1
    inband = ok_i & (s_i >= q1 - 1.5 * iqr) & (s_i <= q3 + 1.5 * iqr)
    med, n = _masked_quantile(s_i, inband, 0.5)
    ok = (n >= min_matches) & (med > 0) & jnp.isfinite(med)
    return jnp.where(ok, med, -1.0), ok
