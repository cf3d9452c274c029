"""The per-frame tracking step: one jitted pure function.

TPU-native rebuild of `Slam::process_frame` (`/root/reference/src/Slam.cpp:
809-1135`): descriptor matching -> fundamental gate -> 3D-3D RANSAC (or
Essential + depth scale) -> EKF fusion -> local-map tracking -> PnP
refinement -> keyframe creation with triangulation + depth back-projection
-> visibility/culling. The reference's ~10 data-dependent branch points
become `lax.cond`/masked updates; all sizes are static (see core.state).

The step is designed to run inside `lax.scan` over a frame chunk, with the
feature frontend (SuperPoint) batched separately — inference saturates the
MXU across frames while this cheap sequential state machine scans.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vslam_tpu.config import SlamConfig
from vslam_tpu.core.state import (
    FrameFeatures,
    KeyframeStore,
    MapStore,
    StepOutputs,
    TrackState,
)
from vslam_tpu.ops import camera as cam
from vslam_tpu.ops import ekf as ekf_ops
from vslam_tpu.ops import matching
from vslam_tpu.ops import pnp as pnp_ops
from vslam_tpu.ops import ransac as rs
from vslam_tpu.ops import scale as scale_ops
from vslam_tpu.ops import se3
from vslam_tpu.ops import triangulate as tri


def _intr(config):
    c = config.camera
    return c.fx, c.fy, c.cx, c.cy


def _single_view_scale(R_rel, t_rel, p_kf, xn_cur, valid):
    """Monocular scale from KF depth (`src/Slam.cpp:162-207`).

    For each match: p_cur = R p_kf + s t̂; the x (and y) image constraints
    give closed-form per-match scales; robust median over valid entries.
    """
    Rp = se3.rotate_rows(R_rel, p_kf)  # (K, 3)
    # x constraint: xn·(Rp_z + s t_z) = Rp_x + s t_x
    num_x = xn_cur[:, 0] * Rp[:, 2] - Rp[:, 0]
    den_x = t_rel[0] - xn_cur[:, 0] * t_rel[2]
    num_y = xn_cur[:, 1] * Rp[:, 2] - Rp[:, 1]
    den_y = t_rel[1] - xn_cur[:, 1] * t_rel[2]
    sx = num_x / jnp.where(jnp.abs(den_x) < 1e-6, jnp.inf, den_x)
    sy = num_y / jnp.where(jnp.abs(den_y) < 1e-6, jnp.inf, den_y)
    s_all = jnp.concatenate([sx, sy])
    v_all = jnp.concatenate([valid, valid]) & jnp.isfinite(s_all) & (s_all > 0)
    # masked median: sort with invalid -> +inf, take middle of valid prefix
    s_sorted = jnp.sort(jnp.where(v_all, s_all, jnp.inf))
    n = jnp.sum(v_all)
    med = s_sorted[jnp.clip(n // 2, 0, s_all.shape[0] - 1)]
    return jnp.where(n >= 3, med, -1.0), n


def _masked_free_slot_insert(
    map_store: MapStore, new_pos, new_desc, new_valid, kf_id, protect=None
):
    """Insert up to K new points into map slots (static-shape compaction:
    the reference simply push_backs into an unbounded vector,
    `src/Map.cpp:20-30`).

    Free slots are consumed first; once the map is FULL, the weakest
    established points — lowest found/visible ratio among points at least
    3 keyframes old (the cull policy's own quality metric,
    `src/Slam.cpp:1111-1126`) — are evicted to make room, so a bounded
    map keeps the unbounded-growth semantics of always accepting new
    observations. Young points (< 3 KFs old, ratio still noisy) are never
    evicted, nor are slots in the optional `protect` (M,) mask — the
    keyframe step protects the points the CURRENT frame observes, so the
    step's keypoint->slot associations (reprojection cull, periodic PnP)
    never dangle onto an evicted-and-refilled slot. If free + evictable
    slots run out, the remaining new points are dropped.

    Returns (map_store, slot_of_new (K,) int32 with -1 for not-inserted).
    """
    M = map_store.valid.shape[0]
    K = new_valid.shape[0]
    new_desc = new_desc.astype(map_store.desc.dtype)
    free = ~map_store.valid
    n_new = jnp.sum(new_valid)

    # Compact new points to the front (stable: valid first, original order).
    order = jnp.argsort(jnp.where(new_valid, 0, 1), stable=True)
    pos_c = new_pos[order]
    desc_c = new_desc[order]

    # Destination ranking: free slots first (slot order), then evictable
    # valid slots by ascending found-ratio, protected slots last.
    PROT = jnp.asarray(1e9, jnp.float32)
    age = kf_id - map_store.first_kf
    ratio = map_store.found / jnp.maximum(map_store.visible, 1).astype(jnp.float32)
    dest_key = jnp.where(
        free, 0.0, jnp.where(age >= 3, 1.0 + ratio, PROT)
    )
    if protect is not None:
        dest_key = jnp.where(free, dest_key, jnp.where(protect, PROT, dest_key))
    dest_order = jnp.argsort(dest_key, stable=True).astype(jnp.int32)
    dest_rank = (
        jnp.zeros(M, jnp.int32).at[dest_order].set(jnp.arange(M, dtype=jnp.int32))
    )
    take = (dest_rank < n_new) & (dest_key < PROT)
    src = jnp.clip(dest_rank, 0, K - 1)
    pos_new = jnp.where(take[:, None], pos_c[src], map_store.pos)
    desc_new = jnp.where(take[:, None], desc_c[src], map_store.desc)
    valid_new = map_store.valid | take
    visible_new = jnp.where(take, 1, map_store.visible)
    found_new = jnp.where(take, 1, map_store.found)
    first_kf_new = jnp.where(take, kf_id, map_store.first_kf)
    num_obs_new = jnp.where(take, 1, map_store.num_obs)

    # Map each new point (original index) to its slot: slot_of_rank r =
    # index of free slot with free_rank == r (& take). Build via scatter.
    slot_of_rank = jnp.full(K, -1, jnp.int32)
    slot_ids = jnp.arange(M, dtype=jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(take, src, K - 1)].max(
        jnp.where(take, slot_ids, -1), mode="drop"
    )
    # rank of each original new point among valid ones
    rank_of_orig = jnp.cumsum(new_valid) - 1
    slot_of_new = jnp.where(
        new_valid & (rank_of_orig < jnp.sum(take)),
        slot_of_rank[jnp.clip(rank_of_orig, 0, K - 1)],
        -1,
    )
    return (
        MapStore(pos_new, desc_new, valid_new, visible_new, found_new, first_kf_new, num_obs_new),
        slot_of_new,
    )


def _match_to_keyframe(state: TrackState, frame: FrameFeatures, config: SlamConfig, key):
    """Descriptor match + fundamental RANSAC gate
    (`src/Slam.cpp:841, 879-910`).

    The F-gate runs lazily: the 3D-3D RANSAC is itself robust, so on the
    RGB-D fast path the gate would only redo work (at ~1 ms/frame).
    It is applied inside the Essential fallback branch instead
    (`_estimate_motion`), which is the path the reference's gate protects
    (`src/Slam.cpp:879-910`); triangulation keeps its own 3 px
    reprojection gates.
    """
    m = matching.knn2_ratio_match(
        state.kf_desc,
        frame.desc,
        state.kf_valid,
        frame.valid,
        ratio=config.frontend.l2_ratio_threshold,
        mutual=config.frontend.mutual_check,
        max_dist=config.frontend.l2_max_distance or None,
    )
    uv_kf = state.kf_xy
    uv_cur = frame.xy[m.idx]
    n_raw = jnp.sum(m.valid)
    return m, uv_kf, uv_cur, m.valid, n_raw


def _fundamental_gate(uv_kf, uv_cur, gated, config, key):
    """Main-path fundamental RANSAC gate + epipolar diagnostics
    (`src/Slam.cpp:879-910`): estimate F over the current matches, filter
    to its inliers, and record the mean symmetric epipolar error of the
    match set before and after the gate (the reference's HUD metric,
    `src/main.cpp:1220-1260`).

    Returns (gated', epi_before, epi_after)."""
    from vslam_tpu.ops import epipolar as epi_ops

    mc = config.motion
    F, fres = rs.ransac_fundamental(
        key, uv_kf, uv_cur, gated,
        num_hypotheses=mc.fm_ransac_iters,
        threshold_px=mc.fm_ransac_threshold_px,
    )
    gated_new = jnp.where(fres.ok, gated & fres.inlier_mask, gated)
    d = epi_ops.epipolar_distance(F, uv_kf, uv_cur)

    def masked_mean(mask):
        return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1)

    epi_before = jnp.where(fres.ok, masked_mean(gated), 0.0)
    epi_after = jnp.where(fres.ok, masked_mean(gated_new), 0.0)
    return gated_new, epi_before, epi_after


def _motion_3d3d(state, frame, config, m, uv_kf, uv_cur, gated, key):
    """3D-3D RANSAC part of motion estimation (`src/Slam.cpp:214-375`).

    Returns (R3, t3, res3, p_kf, p_cur, d_ok) — the back-projections are
    reused by the Essential fallback's scale chain.
    """
    fx, fy, cx, cy = _intr(config)
    mc = config.motion

    depth_kf = state.kf_depth
    depth_cur = frame.depth[m.idx]
    d_ok = (
        (depth_kf > config.camera.depth_min)
        & (depth_kf < config.camera.depth_max)
        & (depth_cur > config.camera.depth_min)
        & (depth_cur < config.camera.depth_max)
    )
    valid3d = gated & d_ok
    p_kf = cam.backproject(uv_kf, depth_kf, fx, fy, cx, cy)
    p_cur = cam.backproject(uv_cur, depth_cur, fx, fy, cx, cy)

    # Gap-aware translation cap (see MotionConfig
    # .r3d_max_translation_per_frame): the gate is keyframe-relative, so
    # it must grow with the keyframe gap or healthy fast motion falls to
    # the essential fallback.
    max_t = mc.r3d_max_translation
    if mc.r3d_max_translation_per_frame > 0:
        gap = (frame.frame_id - state.kf_frame_id).astype(p_kf.dtype)
        max_t = jnp.maximum(
            jnp.asarray(max_t, p_kf.dtype),
            gap * mc.r3d_max_translation_per_frame,
        )
    R3, t3, res3 = rs.ransac_kabsch_3d3d(
        key,
        p_kf,
        p_cur,
        valid3d,
        num_hypotheses=mc.r3d_iters,
        inlier_thresh=mc.r3d_inlier_thresh,
        max_translation=max_t,
        min_translation=mc.r3d_min_translation,
        min_inliers=config.frontend.min_inliers,
    )
    return R3, t3, res3, p_kf, p_cur, d_ok


def _motion_essential(state, frame, config, uv_kf, uv_cur, gated,
                      p_kf, p_cur, d_ok, key):
    """Essential fallback + depth-derived scale — only executed when
    the 3D-3D path fails (`src/Slam.cpp:966-984`). The fundamental gate
    (`src/Slam.cpp:879-910`) runs here first — this is the path it
    protects. Returns (Re, te_scaled, ok, n_inliers, new_scale)."""
    fx, fy, cx, cy = _intr(config)
    mc = config.motion
    depth_kf = state.kf_depth
    kf1, kf2 = jax.random.split(key)
    if mc.fgate_main_path:
        # Matches already passed the main-path F-gate — don't redo it.
        gated_f = gated
    else:
        _, fres = rs.ransac_fundamental(
            kf1, uv_kf, uv_cur, gated,
            num_hypotheses=mc.fm_ransac_iters,
            threshold_px=mc.fm_ransac_threshold_px,
        )
        gated_f = jnp.where(fres.ok, gated & fres.inlier_mask, gated)
    Re, te, E, rese = rs.ransac_essential(
        kf2, uv_kf, uv_cur, gated_f, fx, fy, cx, cy,
        num_hypotheses=mc.em_ransac_iters,
        threshold_px=mc.em_ransac_threshold_px,
        min_inliers=config.frontend.min_inliers,
    )
    xn_cur = cam.normalize_pixels(uv_cur, fx, fy, cx, cy)
    kf_d_ok = (depth_kf > config.camera.depth_min) & (
        depth_kf < config.camera.depth_max
    )
    # Scale chain (`src/Slam.cpp:73-157` -> `:162-207` -> `:975-980`):
    # prefer the two-view solve when BOTH depths are valid at >=10
    # matches (per-match s = (P2 - R P1)·t̂, IQR + median), else the
    # single-view x/y-constraint solve, else last good scale.
    s2v, ok2v = scale_ops.two_view_scale(
        Re, te, p_kf, p_cur, gated & d_ok & rese.inlier_mask, min_matches=10
    )
    s1v, _ = _single_view_scale(
        Re, te, p_kf, xn_cur, gated & kf_d_ok & rese.inlier_mask
    )
    s_med = jnp.where(ok2v, s2v, s1v)
    scale = jnp.where(s_med > 0, s_med, state.last_scale)
    if mc.mono_scale_ekf_prior:
        scale = _scale_with_ekf_prior(scale, state, frame, mc)
    new_scale = jnp.where(scale > 0, scale, state.last_scale)
    return Re, te * scale, rese.ok, rese.num_inliers, new_scale


def _scale_with_ekf_prior(scale, state, frame, mc):
    """EKF scale prior for the essential fallback (NEW vs the reference
    chain `src/Slam.cpp:975-980`, see MotionConfig.mono_scale_ekf_prior).

    The filter's predicted distance from the keyframe anchor
    ||x + v dt - kf_t|| gates the fresh depth-derived scale: estimates
    deviating more than `mono_scale_gate` (relative) are replaced by the
    prediction; agreeing ones are averaged with it. The fresh per-match
    solves are low-SNR at small keyframe baselines (measured +23%
    step-scale bias on the coupled run's essential segments)."""
    dt = jnp.maximum(frame.timestamp - state.last_time, 0.0)
    x = state.ekf.x
    s_pred = jnp.linalg.norm(x[:3] + x[3:] * dt - state.kf_t)
    pred_ok = (s_pred > 1e-4) & state.tracking_ok
    agree = jnp.abs(scale - s_pred) <= mc.mono_scale_gate * s_pred
    s_gated = jnp.where(agree, 0.5 * (scale + s_pred), s_pred)
    return jnp.where(pred_ok, s_gated, scale)


def _estimate_motion(state, frame, config, m, uv_kf, uv_cur, gated, key):
    """3D-3D preferred, Essential+scale fallback (`src/Slam.cpp:953-984`).

    Returns (R_new, t_new, used_3d3d, motion_ok, n_inliers).
    """
    k1, k2 = jax.random.split(key)
    R3, t3, res3, p_kf, p_cur, d_ok = _motion_3d3d(
        state, frame, config, m, uv_kf, uv_cur, gated, k1
    )
    use_3d3d = res3.ok & jnp.asarray(config.rgbd)

    def essential_branch():
        # lax.cond so the expensive 8-point RANSAC is skipped on healthy
        # RGB-D frames.
        return _motion_essential(
            state, frame, config, uv_kf, uv_cur, gated, p_kf, p_cur, d_ok, k2
        )

    def skip_branch():
        return R3, t3, res3.ok, res3.num_inliers, state.last_scale

    Re, te_s, e_ok, e_ninl, new_scale_e = jax.lax.cond(
        use_3d3d, skip_branch, essential_branch
    )

    R_rel = jnp.where(use_3d3d, R3, Re)
    t_rel = jnp.where(use_3d3d, t3, te_s)

    # Pose composition (`src/Slam.cpp:960-984`): T_w,cur = T_w,kf ∘ inv(T_rel)
    R_new = state.kf_R @ R_rel.T
    t_new = state.kf_t - R_new @ t_rel

    motion_ok = use_3d3d | e_ok
    n_inl = jnp.where(use_3d3d, res3.num_inliers, e_ninl)
    new_scale = jnp.where(use_3d3d, state.last_scale, new_scale_e)
    n_dok = jnp.sum(gated & d_ok).astype(jnp.int32)
    return R_new, t_new, use_3d3d, motion_ok, n_inl, new_scale, n_dok


def _fuse_ekf(state: TrackState, frame, config, t_meas, used_3d3d, motion_ok):
    """EKF predict + gated visual update + height + clamp
    (`src/Slam.cpp:986-1047`). Returns (ekf_state, fused_pos, snapshot)."""
    ec = config.ekf
    st = state.ekf
    # Lazy init at current pose
    st = jax.lax.cond(
        st.initialized,
        lambda s: s,
        lambda s: ekf_ops.initialize(state.t, frame.timestamp),
        st,
    )
    dt = frame.timestamp - state.last_time
    first = state.frame_idx == 0
    dt = jnp.where(first, 0.0, dt)
    st = ekf_ops.predict(st, dt, sigma_a=ec.process_accel, decay=ec.vel_decay)
    x_pred, P_pred = st.x, st.P

    sigma = jnp.where(used_3d3d, ec.sigma_vis_3d3d, ec.sigma_vis_emat)
    st = ekf_ops.update_visual_gated(
        st, t_meas, sigma, gate=ec.innovation_gate, enabled=motion_ok
    )
    st = ekf_ops.update_height(
        st,
        state.gravity,
        state.initial_height,
        ec.sigma_height,
        enabled=state.has_height,
    )
    P_filt = st.P
    st, fused = ekf_ops.clamp_step(st, state.t, dt, max_step=ec.max_step)
    snap = (x_pred, P_pred, st.x, P_filt, dt)
    return st, fused, snap


def _track_local_map(state: TrackState, frame, config, R_new, t_new):
    """Project map points, radius-match descriptors
    (`src/Slam.cpp:380-469`). Returns (mp_idx per kp, tracked mask, map')."""
    fx, fy, cx, cy = _intr(config)
    Rcw, tcw = se3.inverse(R_new, t_new)
    p_c = se3.transform_points(Rcw, tcw, state.map.pos)
    uv_mp, front = cam.project(p_c, fx, fy, cx, cy)
    in_img = front & cam.in_image(uv_mp, config.camera.width, config.camera.height)
    visible_mask = state.map.valid & in_img

    # Fused radius matcher + found-counter distances: one Pallas program on
    # TPU (no (M, K) HBM blocks), XLA fallback elsewhere.
    mp_idx, kp_ok, _, min_pix_d2 = matching.radius_descriptor_match_fused(
        frame.desc,
        frame.xy,
        frame.valid,
        state.map.desc,
        uv_mp,
        visible_mask,
        radius_px=config.map.track_search_radius_px,
        desc_thresh=config.map.track_desc_threshold,
    )
    # Update visibility / found counters (`src/Slam.cpp:1089-1108` does this
    # per-KF; we fold it into per-frame tracking). "Found" is geometric, as
    # in the reference (`:1099-1104`): any keypoint within
    # TRACK_VISIBILITY_RADIUS of the projection counts.
    r2 = config.map.track_visibility_radius_px**2
    found_inc = visible_mask & (min_pix_d2 < r2)
    map2 = state.map._replace(
        visible=state.map.visible + visible_mask.astype(jnp.int32),
        found=state.map.found + found_inc.astype(jnp.int32),
    )
    return mp_idx, kp_ok, map2


def _refine_pnp(state, frame, config, R_new, t_new, mp_idx, kp_ok, key):
    """Local PnP refinement with adaptive blending
    (`src/Slam.cpp:1373-1473`): blend 0.3..0.5 by inlier ratio, jump gate."""
    fx, fy, cx, cy = _intr(config)
    pc = config.pnp
    X = state.map.pos[jnp.clip(mp_idx, 0, state.map.pos.shape[0] - 1)]
    n_corr = jnp.sum(kp_ok)
    # Correspondences come pre-gated (12 px radius + 0.5 descriptor
    # threshold), so a Huber-IRLS GN from the CURRENT pose replaces the
    # reference's solvePnPRansac here — no hypothesis sampling, no 12x12
    # eigensolve. Robustness is preserved by the Huber weights + the jump
    # gate below; RANSAC-PnP remains in use for recovery and loop paths.
    R_cw0 = R_new.T
    t_cw0 = -R_cw0 @ t_new
    w0 = kp_ok.astype(X.dtype)
    R_cw, t_cw = pnp_ops.gn_refine_pose(
        R_cw0, t_cw0, X, frame.xy, w0, fx, fy, cx, cy,
        iters=pc.refine_gn_iters, huber_px=pc.ransac_threshold_px * 0.5,
    )
    R_pnp, t_pnp = se3.inverse(R_cw, t_cw)
    p_f = se3.transform_points(R_cw, t_cw, X)
    uv_f, front_f = cam.project(p_f, fx, fy, cx, cy)
    err_f = jnp.linalg.norm(uv_f - frame.xy, axis=-1)
    inl = (err_f < pc.ransac_threshold_px) & front_f & kp_ok
    result = pnp_ops.PnPResult(
        R_pnp, t_pnp, inl, jnp.sum(inl), jnp.sum(inl) >= pc.min_points
    )
    inlier_ratio = result.num_inliers / jnp.maximum(n_corr, 1)
    blend = 0.3 + 0.2 * jnp.clip(inlier_ratio, 0.0, 1.0)
    jump = jnp.linalg.norm(result.t - t_new)
    apply = result.ok & (n_corr >= pc.min_points) & (jump < pc.refine_max_jump)

    t_ref = t_new + blend * (result.t - t_new)
    # Rotation blend via geodesic interpolation
    dR = result.R @ R_new.T
    w = se3.log_so3(dR)
    R_ref = se3.exp_so3(w * blend) @ R_new

    R_out = jnp.where(apply, R_ref, R_new)
    t_out = jnp.where(apply, t_ref, t_new)
    # Fully-applied variant (same gates, blend 1): keyframe registration
    # uses this when config.pnp.kf_refine_full — see PnPConfig.
    R_full = jnp.where(apply, result.R, R_new)
    t_full = jnp.where(apply, result.t, t_new)
    return R_out, t_out, jnp.where(apply, result.num_inliers, 0), R_full, t_full


def _reproject_cull(map_store: MapStore, frame, config, R_new, t_new, mp_idx, kp_ok):
    """Reprojection-based cull of this keyframe's observed map points
    (`src/Slam.cpp:473-500`): a point matched to keypoint i is invalidated
    when it lands behind the camera (z < DEPTH_MIN) or reprojects more than
    CULL_REPROJ_PX away from the keypoint. Runs at every keyframe."""
    fx, fy, cx, cy = _intr(config)
    M = map_store.valid.shape[0]
    X = map_store.pos[jnp.clip(mp_idx, 0, M - 1)]
    Rcw, tcw = se3.inverse(R_new, t_new)
    p_c = se3.transform_points(Rcw, tcw, X)
    z = p_c[:, 2]
    uv, _ = cam.project(p_c, fx, fy, cx, cy)
    err2 = jnp.sum((uv - frame.xy) ** 2, axis=-1)
    bad = kp_ok & (
        (z < config.camera.depth_min) | (err2 > config.map.cull_reproj_px**2)
    )
    valid = map_store.valid.at[jnp.where(bad, mp_idx, M)].set(False, mode="drop")
    return map_store._replace(valid=valid)


def _periodic_pnp(st: TrackState, frame, config, R_new, t_new, mp_idx, kp_ok, key):
    """Periodic global PnP re-localization every Nth keyframe
    (`src/Slam.cpp:1477-1522`, knobs `include/Config.h:76-84`): a FRESH
    RANSAC-PnP over this frame's observed map points — unlike the per-frame
    GN refine it does not start from the current pose, so it can yank a
    drifted trajectory back. Jump gate 1.5 m, blend 0.5.

    Returns (R, t) after the gated blend.
    """
    fx, fy, cx, cy = _intr(config)
    pc = config.pnp
    M = st.map.pos.shape[0]
    X = st.map.pos[jnp.clip(mp_idx, 0, M - 1)]
    ok = kp_ok & st.map.valid[jnp.clip(mp_idx, 0, M - 1)]
    res = pnp_ops.ransac_pnp(
        key, X, frame.xy, ok, fx, fy, cx, cy,
        num_hypotheses=pc.ransac_iters,
        threshold_px=pc.ransac_threshold_px,
        min_inliers=pc.min_points,
        gn_iters=pc.gn_iters,
    )
    jump = jnp.linalg.norm(res.t - t_new)
    apply = res.ok & (jump < pc.periodic_max_jump)
    b = pc.periodic_blend
    t_b = t_new + b * (res.t - t_new)
    w = se3.log_so3(res.R @ R_new.T)
    R_b = se3.exp_so3(w * b) @ R_new
    R_out = jnp.where(apply, R_b, R_new)
    t_out = jnp.where(apply, t_b, t_new)
    return R_out, t_out


def _make_keyframe(
    state: TrackState, frame, config, R_new, t_new, m, gated, protect=None
):
    """Keyframe creation (`src/Slam.cpp:699-725, 1246-1356, 1526-1577`):
    triangulate gated matches (with Kinect-depth override), back-project
    unmatched keypoints with depth, insert as map points, push to ring.
    `protect` (M,) marks map slots that must not be evicted (the caller's
    live keypoint->slot associations)."""
    fx, fy, cx, cy = _intr(config)
    mc = config.map
    K = frame.xy.shape[0]

    # --- Triangulation between active KF and this frame ---
    uv_kf = state.kf_xy
    uv_cur = frame.xy[m.idx]
    X_tri, tri_ok = tri.triangulate_two_view(
        state.kf_R, state.kf_t, R_new, t_new, uv_kf, uv_cur, fx, fy, cx, cy,
        min_depth=mc.triang_min_depth, max_depth=mc.triang_max_depth,
        max_reproj_px=mc.triang_max_reproj_px, max_cam_dist=mc.triang_max_cam_dist,
    )
    tri_ok = tri_ok & gated
    # Kinect-depth override (`src/Slam.cpp:1293-1310`): if current frame has
    # valid depth at the matched keypoint, use back-projected depth instead.
    d_cur = frame.depth[m.idx]
    d_ok = (d_cur > config.camera.depth_min) & (d_cur < config.camera.depth_max)
    X_bp = se3.transform_points(
        R_new, t_new, cam.backproject(uv_cur, d_cur, fx, fy, cx, cy)
    )
    X_new = jnp.where((d_ok & gated)[:, None], X_bp, X_tri)
    pt_ok = jnp.where(d_ok & gated, True, tri_ok)
    # Use the current frame's descriptor for the new point.
    desc_new = frame.desc[m.idx]

    # Keypoint indices (in current frame) covered by matched points
    # (out-of-bounds index + drop mode scatters only the gated entries).
    matched_kp = (
        jnp.zeros(K, dtype=bool)
        .at[jnp.where(gated, m.idx, K)]
        .set(True, mode="drop")
    )

    # --- Depth back-projection at unmatched keypoints (`:1526-1577`) ---
    d_all = frame.depth
    bp_ok = (
        frame.valid
        & ~matched_kp
        & (d_all > config.camera.depth_min)
        & (d_all < config.camera.depth_max)
    )
    X_bp2 = se3.transform_points(
        R_new, t_new, cam.backproject(frame.xy, d_all, fx, fy, cx, cy)
    )

    # Insert both sets (2K candidates max).
    all_pos = jnp.concatenate([X_new, X_bp2], axis=0)
    all_desc = jnp.concatenate([desc_new, frame.desc], axis=0)
    all_ok = jnp.concatenate([pt_ok, bp_ok], axis=0)
    map2, _ = _masked_free_slot_insert(
        state.map, all_pos, all_desc, all_ok, state.kf_count, protect=protect
    )

    # --- Push to keyframe ring ---
    slot = jnp.mod(state.kf_count, state.keyframes.valid.shape[0])
    kfs = state.keyframes
    kfs = KeyframeStore(
        xy=kfs.xy.at[slot].set(frame.xy),
        desc=kfs.desc.at[slot].set(frame.desc),
        depth=kfs.depth.at[slot].set(frame.depth),
        kp_valid=kfs.kp_valid.at[slot].set(frame.valid),
        R=kfs.R.at[slot].set(R_new),
        t=kfs.t.at[slot].set(t_new),
        R_anchor=kfs.R_anchor.at[slot].set(R_new),
        t_anchor=kfs.t_anchor.at[slot].set(t_new),
        frame_id=kfs.frame_id.at[slot].set(frame.frame_id),
        valid=kfs.valid.at[slot].set(True),
    )

    # --- Map point culling every 3rd KF (`src/Slam.cpp:1111-1126`) ---
    do_cull = jnp.mod(state.kf_count + 1, mc.cull_interval_kfs) == 0
    age = state.kf_count - map2.first_kf
    ratio = map2.found / jnp.maximum(map2.visible, 1)
    cull = map2.valid & (
        ((age >= 3) & (map2.visible > 0) & (ratio < mc.cull_found_ratio_young))
        | ((age >= 5) & (map2.num_obs <= 2) & (ratio < mc.cull_found_ratio_old))
    )
    map3 = map2._replace(valid=jnp.where(do_cull, map2.valid & ~cull, map2.valid))

    return state._replace(
        map=map3,
        keyframes=kfs,
        kf_xy=frame.xy,
        kf_desc=frame.desc,
        kf_depth=frame.depth,
        kf_valid=frame.valid,
        kf_R=R_new,
        kf_t=t_new,
        kf_frame_id=frame.frame_id,
        kf_count=state.kf_count + 1,
    )


def _try_pnp_recovery(st: TrackState, frame: FrameFeatures, config: SlamConfig, key):
    """Tracking-loss recovery against the whole map
    (`src/Slam.cpp:535-613`): global descriptor match vs all map points,
    solvePnPRansac(300), distance-dependent blending (0.8 close / 0.3
    far), jump gate 1.5 m, EKF reset + cooldown.

    Returns (R, t, ok).
    """
    fx, fy, cx, cy = _intr(config)
    pc = config.pnp
    # The reference's recovery matcher is FLANN with ratio 0.7 on SQUARED
    # L2 distances (`src/Slam.cpp:567-572`); the equivalent L2 ratio is
    # sqrt(FLANN_RATIO_THRESHOLD). Whole-map match -> streaming kernel on
    # TPU (Pallas top-2; XLA fallback elsewhere).
    mres = matching.knn2_ratio_match_streaming(
        frame.desc,
        st.map.desc,
        frame.valid,
        st.map.valid,
        ratio=config.frontend.flann_ratio_threshold**0.5,
    )
    X = st.map.pos[jnp.clip(mres.idx, 0, st.map.pos.shape[0] - 1)]
    result = pnp_ops.ransac_pnp(
        key,
        X,
        frame.xy,
        mres.valid,
        fx, fy, cx, cy,
        num_hypotheses=pc.ransac_iters,
        threshold_px=pc.ransac_threshold_px,
        min_inliers=pc.min_points,
        gn_iters=pc.gn_iters,
    )
    jump = jnp.linalg.norm(result.t - st.t)
    ok = result.ok & (jump < pc.recovery_max_jump)
    blend = jnp.where(jump < 0.5, pc.recovery_blend_close, pc.recovery_blend_far)
    t_rec = st.t + blend * (result.t - st.t)
    dR = result.R @ st.R.T
    w = se3.log_so3(dR)
    R_rec = se3.exp_so3(w * blend) @ st.R
    return R_rec, t_rec, ok


def _handle_loop_closure(st: TrackState, frame: FrameFeatures, config: SlamConfig,
                         R_new, t_new, key):
    """Loop detection + constraint accumulation (`src/LoopCloser.cpp:16-100`
    + `src/Slam.cpp:730-798`).

    Batched form: descriptor-match the current frame against EVERY stored
    keyframe at once (one (KFC*K, K) distance computation), ratio test,
    pick the candidate with the most matches, Essential-RANSAC verify,
    then PnP with the (0.01, 0.5) m jump gate. On success, appends a
    LoopConstraint.

    DELTA from the reference's PnP stage (`src/Slam.cpp:744-775`, which
    matches against live MAP POINTS created within ±30 frames of the
    anchor): the PnP here runs against the ANCHOR KEYFRAME'S OWN
    depth-backprojected keypoints, using the detection stage's
    descriptor matches directly. The reference can rely on old-region
    map points staying resident because its map grows unboundedly
    (`src/Map.cpp:20-30`); a bounded TPU map store evicts weak old
    points long before a revisit, which silently starves the reference
    formulation exactly when a loop is on offer. The keyframe ring
    (capacity >= total keyframes at reference scale) keeps every
    anchor's geometry, so the constraint is immune to map churn — and
    the correspondences are the already-verified detection matches, not
    a second global search.
    """
    fx, fy, cx, cy = _intr(config)
    lc = config.loop
    kfs = st.keyframes
    KFC, K, D = kfs.desc.shape

    # Candidate set is every `kf_stride`-th ring slot (LoopCloser.cpp:
    # 43-48) — a STATIC strided slice, so the all-KF distance tensor is
    # (KFC/stride, K, K) instead of computing all KFC rows and masking
    # 4/5 of them away (the d2 intermediate drops ~160 MB -> ~32 MB at
    # the 256-slot ring).
    stride = int(lc.kf_stride)
    desc_s = kfs.desc[::stride]  # (KFS, K, D)
    cand = (
        kfs.valid[::stride]
        & (frame.frame_id - kfs.frame_id[::stride] >= lc.min_frame_gap)
    )

    # Distances: current frame (K, D) vs candidate KF descriptors.
    dots = jnp.einsum("kd,oid->oki", frame.desc, desc_s)  # (KFS, K, K)
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))
    d2 = jnp.where(frame.valid[None, :, None], d2, 1e9)
    d2 = jnp.where(kfs.kp_valid[::stride][:, None, :], d2, 1e9)
    dd1 = jnp.min(d2, axis=-1)  # (KFS, K)
    best_idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # (KFS, K)
    cols = jnp.arange(d2.shape[-1], dtype=jnp.int32)
    dd2 = jnp.min(
        jnp.where(cols[None, None, :] == best_idx[..., None], 1e9, d2), axis=-1
    )
    match_ok = (dd1 < config.frontend.l2_ratio_threshold * dd2) & (
        dd1 < 1e8
    ) & frame.valid[None, :]
    counts = jnp.sum(match_ok, axis=-1) * cand  # (KFS,)
    best_s = jnp.argmax(counts).astype(jnp.int32)
    best_kf = best_s * stride  # ring slot of the winning candidate
    best_count = counts[best_s]
    enough = best_count >= config.frontend.min_matches

    mok = match_ok[best_s]
    bi = best_idx[best_s]  # (K,) anchor-kp index matched per current kp
    cand_frame_id = kfs.frame_id[best_kf]

    def _verify(_):
        """E-RANSAC + PnP + polish on the winning candidate — only run
        when the match stage produced enough correspondences; on a
        loop-free run every check exits at the cheap match stage (the
        RANSAC/GN chain is ~10x the match cost in pure dispatch
        latency)."""
        # Essential verification on the best candidate's matches.
        uv_cur = frame.xy
        uv_old = kfs.xy[best_kf][bi]  # matched old-KF pixels per cur kp
        k1, k2 = jax.random.split(key)
        _, _, _, eres = rs.ransac_essential(
            k1, uv_old, uv_cur, mok, fx, fy, cx, cy,
            num_hypotheses=config.motion.em_ransac_iters,
            threshold_px=config.motion.em_ransac_threshold_px,
            min_inliers=lc.min_inliers,
        )

        # PnP against the anchor keyframe's depth-backprojected keypoints
        # (redesigned `Slam.cpp:744-782` stage — see docstring): the 2D-3D
        # correspondences are the detection matches themselves, with the 3D
        # side lifted from the anchor's stored sensor depth at its estimated
        # pose. Both endpoints live in the same (drifted) trajectory frame,
        # so the RELATIVE constraint is drift-free up to sensor noise.
        d_old = kfs.depth[best_kf]  # (K,) sensor depth at anchor keypoints
        d_ok_old = (d_old > config.camera.depth_min) & (
            d_old < config.camera.depth_max
        )
        X_w = se3.transform_points(
            kfs.R[best_kf], kfs.t[best_kf],
            cam.backproject(kfs.xy[best_kf], d_old, fx, fy, cx, cy),
        )  # (K, 3) anchor keypoints in world
        X = X_w[bi]
        corr_ok = mok & d_ok_old[bi]
        pnp_res = pnp_ops.ransac_pnp(
            k2, X, frame.xy, corr_ok, fx, fy, cx, cy,
            num_hypotheses=config.pnp.ransac_iters,
            threshold_px=config.pnp.ransac_threshold_px,
            min_inliers=config.pnp.min_points,
        )
        # Two-stage tightened polish of the constraint pose (delta from
        # `src/Slam.cpp:778-782`, which measures the constraint straight off
        # the 8 px-gated solvePnPRansac pose): re-select correspondences at
        # loop.refine_threshold_px against the RANSAC pose and Huber-GN with
        # a small delta, so the PGO edge (sigma_t=0.03 m, Config.h:134) is
        # measured from sub-pixel-consistent map points only. Falls back to
        # the RANSAC pose when too few tight correspondences survive.
        R_cw, t_cw = se3.inverse(pnp_res.R, pnp_res.t)
        if lc.refine_threshold_px > 0.0:
            p_c = se3.transform_points(R_cw, t_cw, X)
            uv_hat, front = cam.project(p_c, fx, fy, cx, cy)
            t_err_px = jnp.linalg.norm(uv_hat - frame.xy, axis=-1)
            tight = (t_err_px < lc.refine_threshold_px) & front & corr_ok
            n_tight = jnp.sum(tight)
            R_cw2, t_cw2 = pnp_ops.gn_refine_pose(
                R_cw, t_cw, X, frame.xy, tight.astype(X.dtype), fx, fy, cx, cy,
                iters=lc.refine_gn_iters, huber_px=lc.refine_huber_px,
            )
            use_tight = n_tight >= config.pnp.min_points
            R_cw = jnp.where(use_tight, R_cw2, R_cw)
            t_cw = jnp.where(use_tight, t_cw2, t_cw)
        R_pnp, t_pnp = se3.inverse(R_cw, t_cw)

        jump = jnp.linalg.norm(t_pnp - t_new)
        # Spacing between ACCEPTED constraints (see LoopClosureConfig
        # .min_frames_between_accepts): the denser check cadence would
        # otherwise fill the buffer with near-duplicates of one revisit.
        last_to = jnp.max(jnp.where(st.loops.valid, st.loops.to_id, -1))
        spaced = frame.frame_id - last_to >= lc.min_frames_between_accepts
        acc = (
            eres.ok
            & pnp_res.ok
            & (jump > lc.min_jump)
            & (jump < lc.max_jump)
            & (best_count > 0)
            & spaced
        )
        # Constraint: relative pose between matched KF and PnP pose.
        R_rel, t_rel = se3.relative(
            kfs.R[best_kf], kfs.t[best_kf], R_pnp, t_pnp
        )
        return acc, R_rel, t_rel

    def _skip(_):
        return (
            jnp.asarray(False),
            jnp.eye(3, dtype=kfs.R.dtype),
            jnp.zeros(3, dtype=kfs.t.dtype),
        )

    accept, R_rel, t_rel = jax.lax.cond(enough, _verify, _skip, None)
    loops = st.loops
    cursor = jnp.sum(loops.valid)
    L = loops.valid.shape[0]
    # Called after _make_keyframe incremented kf_count: the current
    # keyframe's slot is kf_count - 1.
    cur_slot = jnp.mod(st.kf_count - 1, KFC).astype(jnp.int32)
    write = accept & (cursor < L)
    idx = jnp.where(write, cursor, L - 1).astype(jnp.int32)
    loops = loops._replace(
        kf_from=loops.kf_from.at[idx].set(jnp.where(write, best_kf, loops.kf_from[idx])),
        kf_to=loops.kf_to.at[idx].set(jnp.where(write, cur_slot, loops.kf_to[idx])),
        from_id=loops.from_id.at[idx].set(
            jnp.where(write, cand_frame_id, loops.from_id[idx])
        ),
        to_id=loops.to_id.at[idx].set(
            jnp.where(write, frame.frame_id, loops.to_id[idx])
        ),
        R_rel=loops.R_rel.at[idx].set(jnp.where(write, R_rel, loops.R_rel[idx])),
        t_rel=loops.t_rel.at[idx].set(jnp.where(write, t_rel, loops.t_rel[idx])),
        valid=loops.valid.at[idx].set(jnp.where(write, True, loops.valid[idx])),
    )
    return st._replace(loops=loops)


def _bridge(s: TrackState, frame: FrameFeatures, config: SlamConfig, key):
    """Bridge-keyframe promotion (`src/Slam.cpp:847-872`): promote the
    previous frame to keyframe (depth-backprojected points only) and
    re-match the current frame against it."""
    prev = FrameFeatures(
        xy=s.prev_xy,
        desc=s.prev_desc,
        depth=s.prev_depth,
        valid=s.prev_valid,
        timestamp=s.last_time,
        stationary=jnp.asarray(False),
        frame_id=s.prev_frame_id,
    )
    K = s.prev_xy.shape[0]
    m_dummy = matching.MatchResult(
        jnp.arange(K, dtype=jnp.int32),
        jnp.zeros(K, dtype=bool),
        jnp.zeros(K),
    )
    s2 = _make_keyframe(
        s, prev, config, s.prev_R, s.prev_t, m_dummy,
        jnp.zeros(K, dtype=bool),
    )
    m2, uv_kf2, uv_cur2, gated2, n_raw2 = _match_to_keyframe(s2, frame, config, key)
    return s2, m2, uv_kf2, uv_cur2, gated2, n_raw2


def _bootstrap(st: TrackState, frame: FrameFeatures, config: SlamConfig):
    """First frame: become the first keyframe at the initial pose
    (`src/Slam.cpp:826-839`)."""
    m_dummy = matching.MatchResult(
        jnp.arange(frame.xy.shape[0], dtype=jnp.int32),
        jnp.zeros(frame.xy.shape[0], dtype=bool),
        jnp.zeros(frame.xy.shape[0]),
    )
    st2 = _make_keyframe(
        st, frame, config, st.R, st.t, m_dummy,
        jnp.zeros(frame.xy.shape[0], dtype=bool),
    )
    ekf0 = ekf_ops.initialize(st.t, frame.timestamp)
    eye6 = jnp.eye(6, dtype=st.t.dtype)
    out = StepOutputs(
        R=st.R, t=st.t, timestamp=frame.timestamp,
        x_pred=ekf0.x, P_pred=eye6, x_filt=ekf0.x, P_filt=ekf0.P,
        dt=jnp.asarray(0.0, st.t.dtype),
        num_matches=jnp.asarray(0, jnp.int32),
        num_inliers=jnp.asarray(0, jnp.int32),
        num_tracked=jnp.asarray(0, jnp.int32),
        is_keyframe=jnp.asarray(True),
        used_3d3d=jnp.asarray(False),
        tracking_ok=jnp.asarray(True),
        epi_before=jnp.asarray(0.0, jnp.float32),
        epi_after=jnp.asarray(0.0, jnp.float32),
        bridged=jnp.asarray(False),
        recovered=jnp.asarray(False),
        num_depth_ok=jnp.asarray(0, jnp.int32),
    )
    return (
        st2._replace(
            ekf=ekf0,
            frame_idx=st.frame_idx + 1,
            last_time=frame.timestamp,
            prev_xy=frame.xy,
            prev_desc=frame.desc,
            prev_depth=frame.depth,
            prev_valid=frame.valid,
            prev_R=st.R,
            prev_t=st.t,
            prev_frame_id=frame.frame_id,
        ),
        out,
    )


from vslam_tpu.ops.linalg import f32_matmuls


@f32_matmuls
def tracking_step(
    state: TrackState, frame: FrameFeatures, config: SlamConfig, key
) -> Tuple[TrackState, StepOutputs]:
    """One frame through the full tracking state machine.

    Wrapped in full-f32 matmul precision: geometry at 5-cm inlier
    thresholds cannot tolerate the TPU's default bf16 matmul passes
    (descriptor matmuls lose a little speed; correctness wins).
    """
    (
        k_match, k_motion, k_pnp, k_recover, k_loop, k_periodic, k_fgate
    ) = jax.random.split(key, 7)

    # Descriptors are stored/matched in bf16 (see core.state.init_state);
    # cast the incoming frame's once so every consumer agrees on dtype.
    frame = frame._replace(desc=frame.desc.astype(state.kf_desc.dtype))

    def bootstrap(st: TrackState):
        return _bootstrap(st, frame, config)

    def track(st: TrackState):
        m, uv_kf, uv_cur, gated, n_raw = _match_to_keyframe(st, frame, config, k_match)

        # Bridge-keyframe promotion (`src/Slam.cpp:847-872`): when matching
        # against the keyframe collapses but the previous frame tracked,
        # promote the previous frame to keyframe (with depth-backprojected
        # points) and re-match the current frame against it.
        can_bridge = (
            (n_raw < config.frontend.min_matches)
            & (st.prev_frame_id >= 0)
            & (st.prev_frame_id != st.kf_frame_id)
        )

        st, m, uv_kf, uv_cur, gated, n_raw = jax.lax.cond(
            can_bridge,
            lambda s: _bridge(s, frame, config, k_match),
            lambda s: (s, m, uv_kf, uv_cur, gated, n_raw),
            st,
        )

        # Main-path fundamental gate + epipolar diagnostics
        # (`src/Slam.cpp:879-910`; reference gates EVERY frame).
        if config.motion.fgate_main_path:
            gated, epi_before, epi_after = _fundamental_gate(
                uv_kf, uv_cur, gated, config, k_fgate
            )
        else:
            epi_before = jnp.asarray(0.0, jnp.float32)
            epi_after = jnp.asarray(0.0, jnp.float32)
        n_matches = jnp.sum(gated)

        (R_mot, t_mot, used_3d3d, motion_ok, n_inl, new_scale,
         n_depth_ok) = _estimate_motion(
            st, frame, config, m, uv_kf, uv_cur, gated, k_motion
        )
        enough = n_matches >= config.frontend.min_matches
        motion_ok = motion_ok & enough

        # Tracking-loss recovery vs the whole map (`src/Slam.cpp:875, 535-613`):
        # only when matching collapsed and the cooldown has expired.
        can_recover = (
            (~enough)
            & (st.recovery_cooldown <= 0)
            & (jnp.sum(st.map.valid) >= config.pnp.min_points)
        )
        R_rec, t_rec, rec_ok = jax.lax.cond(
            can_recover,
            lambda: _try_pnp_recovery(st, frame, config, k_recover),
            lambda: (st.R, st.t, jnp.asarray(False)),
        )
        recovered = can_recover & rec_ok

        # Stationary frames: freeze position, keep rotation update
        # (`src/Slam.cpp:618-694`).
        R_new = jnp.where(motion_ok, R_mot, st.R)
        t_meas = jnp.where(motion_ok & ~frame.stationary, t_mot, st.t)

        ekf_st, t_fused, snap = _fuse_ekf(
            st, frame, config, t_meas, used_3d3d, motion_ok & ~frame.stationary
        )
        R_new = se3.renormalize_rotation(R_new)
        t_new = jnp.where(frame.stationary, st.t, t_fused)

        # Recovery overrides the visual/EKF pose and resets the filter
        # (`src/Slam.cpp:595-610`).
        R_new = jnp.where(recovered, R_rec, R_new)
        t_new = jnp.where(recovered, t_rec, t_new)
        ekf_reset = ekf_ops.initialize(t_rec, frame.timestamp)
        ekf_st = jax.tree.map(
            lambda reset, keep: jnp.where(recovered, reset, keep), ekf_reset, ekf_st
        )

        # Local-map tracking + PnP refinement
        mp_idx, kp_ok, map2 = _track_local_map(st, frame, config, R_new, t_new)
        st = st._replace(map=map2)
        n_tracked = jnp.sum(kp_ok)
        R_ref, t_ref, n_pnp, R_full, t_full = _refine_pnp(
            st, frame, config, R_new, t_new, mp_idx, kp_ok, k_pnp
        )
        R_fin = R_ref
        t_fin = jnp.where(frame.stationary, st.t, t_ref)
        # Keyframe registration pose: fully-applied refine when enabled
        # (PnPConfig.kf_refine_full), else the blended per-frame pose.
        if config.pnp.kf_refine_full:
            R_kfp = R_full
            t_kfp = jnp.where(frame.stationary, st.t, t_full)
        else:
            R_kfp, t_kfp = R_fin, t_fin

        # Keyframe policy (`src/Slam.cpp:1062-1070, 1359-1368`)
        gap = frame.frame_id - st.kf_frame_id
        is_kf_normal = (
            ((gap >= config.map.kf_min_frame_gap) & (n_matches >= config.map.kf_min_matches))
            | ((gap >= config.map.kf_proactive_min_gap)
               & (n_matches < config.map.kf_proactive_max_matches))
        ) & motion_ok & ~frame.stationary & ~recovered
        # Stationary rotation-drift keyframe (`src/Slam.cpp:660-694`): the
        # robot pans in place; register the rotation once it drifts enough.
        rot_drift = jnp.linalg.norm(se3.log_so3(R_fin @ st.kf_R.T))
        is_kf_rot = (
            frame.stationary
            & (rot_drift > config.ekf.stationary_kf_rot_drift)
            & motion_ok
        )
        # Post-stationary promotion (`src/Slam.cpp:916-951`): first moving
        # frame after a stationary stretch refreshes the reference KF.
        is_kf_post = st.was_stationary & ~frame.stationary & motion_ok
        is_kf = is_kf_normal | is_kf_rot | is_kf_post

        def kf_branch(s):
            # Protect this frame's observed map points from eviction so
            # mp_idx/kp_ok stay valid through the cull + periodic PnP below.
            M = s.map.valid.shape[0]
            protect = (
                jnp.zeros(M, dtype=bool)
                .at[jnp.where(kp_ok, mp_idx, M)]
                .set(True, mode="drop")
            )
            s2 = _make_keyframe(
                s, frame, config, R_kfp, t_kfp, m, gated, protect=protect
            )
            # Reprojection cull at EVERY keyframe (`src/Slam.cpp:724,
            # 473-500`), on this frame's observed map-point associations.
            s2 = s2._replace(
                map=_reproject_cull(s2.map, frame, config, R_kfp, t_kfp, mp_idx, kp_ok)
            )
            # Periodic global PnP every PNP_INTERVAL-th keyframe
            # (`src/Slam.cpp:1079-1081, 1477-1522`).
            do_pnp = jnp.mod(s2.kf_count, config.pnp.interval) == 0
            R_kf, t_kf = jax.lax.cond(
                do_pnp,
                lambda: _periodic_pnp(
                    s2, frame, config, R_kfp, t_kfp, mp_idx, kp_ok, k_periodic
                ),
                lambda: (R_kfp, t_kfp),
            )
            # The reference's frame object IS the keyframe: set_pose after
            # run_pnp updates the stored keyframe pose (`Slam.cpp:1520`).
            slot = jnp.mod(s2.kf_count - 1, s2.keyframes.valid.shape[0])
            s2 = s2._replace(
                kf_R=R_kf,
                kf_t=t_kf,
                keyframes=s2.keyframes._replace(
                    R=s2.keyframes.R.at[slot].set(R_kf),
                    t=s2.keyframes.t.at[slot].set(t_kf),
                    # Anchor tracks the registration-time pose, periodic
                    # PnP blend included — subsequent frames track
                    # against this value.
                    R_anchor=s2.keyframes.R_anchor.at[slot].set(R_kf),
                    t_anchor=s2.keyframes.t_anchor.at[slot].set(t_kf),
                ),
            )
            # Loop closure every Nth keyframe (`src/Slam.cpp:1084-1086`).
            check = jnp.mod(s2.kf_count, config.loop.check_interval_kfs) == 0
            s3 = jax.lax.cond(
                check,
                lambda s4: _handle_loop_closure(s4, frame, config, R_kf, t_kf, k_loop),
                lambda s4: s4,
                s2,
            )
            return s3, R_kf, t_kf

        st_kf, R_fin, t_fin = jax.lax.cond(
            is_kf, kf_branch, lambda s: (s, R_fin, t_fin), st
        )

        # Keep EKF position consistent with the final (possibly periodic-
        # PnP-blended) pose; stationary frames zero the velocity
        # (`src/Slam.cpp:640-655`)
        x_new = ekf_st.x.at[:3].set(t_fin)
        x_new = jnp.where(frame.stationary, x_new.at[3:].set(0.0), x_new)
        ekf_st = ekf_st._replace(x=x_new)

        st_out = st_kf._replace(
            R=R_fin,
            t=t_fin,
            ekf=ekf_st,
            frame_idx=st.frame_idx + 1,
            last_time=frame.timestamp,
            last_scale=new_scale,
            tracking_ok=motion_ok | recovered,
            was_stationary=frame.stationary,
            prev_xy=frame.xy,
            prev_desc=frame.desc,
            prev_depth=frame.depth,
            prev_valid=frame.valid,
            prev_R=R_fin,
            prev_t=t_fin,
            prev_frame_id=frame.frame_id,
            recovery_cooldown=jnp.where(
                recovered,
                jnp.asarray(config.pnp.recovery_cooldown_frames, jnp.int32),
                jnp.maximum(st.recovery_cooldown - 1, 0),
            ),
        )
        out = StepOutputs(
            R=R_fin, t=t_fin, timestamp=frame.timestamp,
            x_pred=snap[0], P_pred=snap[1], x_filt=snap[2], P_filt=snap[3],
            dt=snap[4],
            num_matches=n_matches.astype(jnp.int32),
            num_inliers=n_inl.astype(jnp.int32),
            num_tracked=n_tracked.astype(jnp.int32),
            is_keyframe=is_kf,
            used_3d3d=used_3d3d,
            tracking_ok=motion_ok,
            epi_before=epi_before,
            epi_after=epi_after,
            bridged=can_bridge,
            recovered=recovered,
            num_depth_ok=n_depth_ok,
        )
        return st_out, out

    return jax.lax.cond(state.kf_frame_id < 0, bootstrap, track, state)


def make_scan_step(config: SlamConfig, seed: int = 42):
    """Build a `lax.scan`-compatible step closure.

    RNG determinism mirrors the reference's per-frame `mt19937(42 +
    frame_count_)` (`src/Slam.cpp:276`): key = fold_in(seed, frame_idx).
    """

    def scan_fn(state: TrackState, frame: FrameFeatures):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), frame.frame_id)
        return tracking_step(state, frame, config, key)

    return scan_fn
