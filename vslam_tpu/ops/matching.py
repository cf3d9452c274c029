"""Descriptor matching as batched MXU matmuls.

Replaces the reference's FLANN KNN-2 + Lowe ratio matcher
(`/root/reference/src/Slam.cpp:1140-1172`) and the local-map descriptor
search (`src/Slam.cpp:380-469`). A 400x400x256 L2 distance matrix is a
single 400x256 @ 256x400 matmul — exact brute-force KNN is cheaper on the
MXU than any approximate tree.

Descriptors are L2-normalized (SuperPoint), so
||a - b||^2 = 2 - 2 a.b; we compute distances from the dot-product matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e9


def _on_tpu(*arrays) -> bool:
    """Pallas-vs-XLA dispatch gate for the fused matchers.

    Prefers the committed device of a concrete array argument (so explicit
    `jax.device_put(..., cpu)` placement traces the XLA fallback even when
    the process default backend is TPU). Inside a `jit` trace the inputs
    are tracers with no device, so the gate falls back to the process
    default backend — the device an un-annotated jit compiles for. A jit
    explicitly lowered for a non-default device with TPU-default backend
    is NOT detected; pass concrete arrays or pin the default backend.
    """
    for a in arrays:
        devs = getattr(a, "devices", None)
        if callable(devs):
            try:
                return any(d.platform in ("tpu", "axon") for d in a.devices())
            except Exception:
                continue
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def l2_distance_matrix(desc1, desc2, valid1=None, valid2=None):
    """(N, D) x (M, D) -> (N, M) L2 distances; invalid rows/cols -> +BIG.

    Dot product accumulated in float32 but with DEFAULT (bf16-pass) MXU
    precision — descriptor distances only feed relative comparisons
    (ratio/threshold tests), where bf16's ~0.4% error is immaterial, and
    this matmul is the biggest single op in the tracking step. The
    explicit precision opts out of the f32 pin on the tracking step.
    """
    dots = jnp.dot(
        desc1,
        desc2.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d2 = jnp.maximum(2.0 - 2.0 * dots, 0.0)
    d = jnp.sqrt(d2)
    if valid1 is not None:
        d = jnp.where(valid1[:, None], d, _BIG)
    if valid2 is not None:
        d = jnp.where(valid2[None, :], d, _BIG)
    return d


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (N,) int32 — for each desc1 row, matched desc2 index
    valid: jnp.ndarray  # (N,) bool — passed ratio (+ mutual) test
    dist: jnp.ndarray  # (N,) float32 — best distance


def knn2_ratio_match(
    desc1,
    desc2,
    valid1=None,
    valid2=None,
    ratio=0.75,
    mutual=True,
    max_dist=None,
):
    """KNN-2 + Lowe ratio (+ optional mutual-NN) matcher.

    Mirrors the reference semantics (`src/Slam.cpp:1146-1158`): keep match
    (i -> j) iff d1(i) < ratio * d2(i). The mutual check additionally
    requires i == argmin_col(j) — the reference gets a similar effect from
    its per-keypoint best-distance dedup in local tracking
    (`src/Slam.cpp:443-456`).
    """
    d = l2_distance_matrix(desc1, desc2, valid1, valid2)  # (N, M)
    # Two min/argmin passes beat a sort-based lax.top_k(k=2) on TPU; ties
    # resolve to the lowest index exactly like top_k's stable order.
    d1 = jnp.min(d, axis=1)
    j = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jnp.arange(d.shape[1], dtype=jnp.int32)[None, :]
    d2 = jnp.min(jnp.where(cols == j[:, None], _BIG, d), axis=1)

    ok = d1 < ratio * d2
    if max_dist is not None:
        ok = ok & (d1 < max_dist)
    ok = ok & (d1 < _BIG * 0.5)
    if valid1 is not None:
        ok = ok & valid1
    if mutual:
        col_best = jnp.argmin(d, axis=0).astype(jnp.int32)  # (M,)
        ok = ok & (col_best[j] == jnp.arange(d.shape[0], dtype=jnp.int32))
    return MatchResult(j, ok, d1)


def knn2_ratio_match_streaming(desc_q, desc_db, valid_q, valid_db, ratio=0.75):
    """Whole-map KNN-2 + ratio matcher for LARGE databases (the recovery
    path matches the frame against every map point, `src/Slam.cpp:567-572`
    — no mutual check there).

    On TPU this dispatches to the streaming Pallas kernel
    (`ops.pallas_matching`), which fuses distance computation + masking +
    top-2 reduction in VMEM so HBM never sees the (M, K) distance block.
    Measured on a v5e chip vs the XLA matmul matcher (bf16, K=400, D=256):
    1.08x at M=16,384 (the default map capacity) and 1.69x at M=131,072.
    Off-TPU it falls back to the XLA path.
    """
    if desc_db.shape[0] >= 4096 and _on_tpu(desc_q, desc_db):
        from vslam_tpu.ops import pallas_matching as pm

        idx, ok, d1 = pm.knn2_ratio_match_pallas(
            desc_q, desc_db, valid_q, valid_db, ratio=ratio
        )
        return MatchResult(idx, ok, d1)
    return knn2_ratio_match(
        desc_q, desc_db, valid_q, valid_db, ratio=ratio, mutual=False
    )


def radius_descriptor_match_fused(
    desc_q, uv_q, valid_q, desc_db, uv_db, valid_db, radius_px, desc_thresh
):
    """Local-map radius matcher + found-counter distances, fused.

    On TPU this runs the Pallas kernel (`ops.pallas_matching.
    radius_match_pallas`) that keeps every (M, K) block in VMEM — the XLA
    path materializes ~4 such blocks (26 MB each at 16384x400) in HBM per
    frame, the dominant bandwidth term of local-map tracking
    (`src/Slam.cpp:380-469`). Off-TPU it falls back to the XLA ops.

    Returns (mp_idx (K,), kp_ok (K,), dist (K,), min_pix_d2 (M,)) where
    min_pix_d2[i] is the squared distance from db projection i to the
    nearest VALID keypoint (the reference's geometric found counter,
    `src/Slam.cpp:1099-1104`).
    """
    if desc_db.shape[0] >= 4096 and _on_tpu(desc_q, desc_db):
        from vslam_tpu.ops import pallas_matching as pm

        return pm.radius_match_pallas(
            desc_q, uv_q, valid_q, desc_db, uv_db, valid_db,
            radius_px=float(radius_px), desc_thresh=float(desc_thresh),
        )
    pix_d2 = pixel_dist2_matrix(uv_db, uv_q)
    mp_idx, kp_ok, dist = radius_descriptor_match(
        desc_q, uv_q, valid_q, desc_db, uv_db, valid_db,
        radius_px=radius_px, desc_thresh=desc_thresh, pix_d2=pix_d2,
    )
    min_pix_d2 = jnp.min(jnp.where(valid_q[None, :], pix_d2, _BIG), axis=-1)
    return mp_idx, kp_ok, dist, min_pix_d2


def radius_descriptor_match_fused_batched(
    desc_q, uv_q, valid_q, desc_db, uv_db, valid_db, radius_px, desc_thresh
):
    """Batched `radius_descriptor_match_fused`: B members, ONE kernel.

    Hypothesis was that `vmap(radius_match_pallas)` (leading grid dim,
    B=4 pays 4x the grid steps) is grid-step-latency bound; the batched
    kernel advances all B members per db tile instead. MEASURED WRONG on
    v5e at production shapes (B=4, M=16384, K=400, D=256): 766.8 us/iter
    batched vs 711.7 vmapped — the pass is VMEM-stream bound on the map
    descriptors, which a single launch cannot reduce (BENCH_NOTES
    "Negative result: batched radius-match kernel"). Kept off the hot
    path (`tracking_batched` uses the vmapped form); equivalence is
    pinned by tests/test_pallas_matching.py. Off-TPU falls back to the
    vmapped XLA path. Args carry a leading batch dim; returns
    (mp_idx (B, K), kp_ok (B, K), dist (B, K), min_pix_d2 (B, M))."""
    if desc_db.shape[1] >= 4096 and _on_tpu(desc_q, desc_db):
        from vslam_tpu.ops import pallas_matching as pm

        return pm.radius_match_pallas_batched(
            desc_q, uv_q, valid_q, desc_db, uv_db, valid_db,
            radius_px=float(radius_px), desc_thresh=float(desc_thresh),
        )
    return jax.vmap(
        lambda q, uq, vq, db, udb, vdb: radius_descriptor_match_fused(
            q, uq, vq, db, udb, vdb,
            radius_px=radius_px, desc_thresh=desc_thresh,
        )
    )(desc_q, uv_q, valid_q, desc_db, uv_db, valid_db)


def pixel_dist2_matrix(uv_db, uv_q):
    """(M, 2) x (K, 2) -> (M, K) squared pixel distances via the
    |a|^2 + |b|^2 - 2ab matmul identity — avoids materializing the
    (M, K, 2) difference broadcast (52 MB at 16384x400 f32), the dominant
    HBM term of local-map tracking."""
    n_db = jnp.sum(uv_db * uv_db, axis=-1)
    n_q = jnp.sum(uv_q * uv_q, axis=-1)
    # HIGHEST precision always: pixel coords are O(600), so bf16 matmul
    # passes would put ~tens-of-px^2 of error into the radius gates.
    cross = jnp.dot(
        uv_db, uv_q.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(n_db[:, None] + n_q[None, :] - 2.0 * cross, 0.0)


def radius_descriptor_match(
    desc_q,
    uv_q,
    valid_q,
    desc_db,
    uv_db,
    valid_db,
    radius_px,
    desc_thresh,
    pix_d2=None,
):
    """Local-map tracking matcher (`src/Slam.cpp:380-469`).

    For each db entry (projected map point), find the best query keypoint
    within `radius_px` whose descriptor distance < `desc_thresh`; then dedup
    so each query keypoint keeps only its best db match (the reference's
    per-keypoint best-distance dedup, `src/Slam.cpp:443-456`).

    Args:
      desc_q: (K, D) frame keypoint descriptors; uv_q (K, 2); valid_q (K,).
      desc_db: (M, D) map point descriptors; uv_db (M, 2) projected pixels;
        valid_db (M,) projected-in-image mask.

    Returns:
      (mp_idx_per_kp, valid_per_kp, dist_per_kp): for each query keypoint,
      the matched db index (or -1).
    """
    d = l2_distance_matrix(desc_db, desc_q, valid_db, valid_q)  # (M, K)
    if pix_d2 is None:
        pix_d2 = pixel_dist2_matrix(uv_db, uv_q)
    d = jnp.where(pix_d2 <= radius_px * radius_px, d, _BIG)

    best_kp = jnp.argmin(d, axis=1).astype(jnp.int32)  # (M,)
    best_d = jnp.min(d, axis=1)
    mp_ok = (best_d < desc_thresh) & valid_db

    # Dedup: for each keypoint keep the best map point claiming it.
    K = desc_q.shape[0]
    d_masked = jnp.where(mp_ok[:, None], d, _BIG)
    claim = jnp.where(
        best_kp[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :], d_masked[
            jnp.arange(d.shape[0]), best_kp
        ][:, None], _BIG
    )  # (M, K): distance if mp claims kp else BIG
    best_mp_per_kp = jnp.argmin(claim, axis=0).astype(jnp.int32)
    best_dist_per_kp = jnp.min(claim, axis=0)
    kp_ok = best_dist_per_kp < _BIG * 0.5
    mp_idx = jnp.where(kp_ok, best_mp_per_kp, -1)
    return mp_idx, kp_ok, best_dist_per_kp
