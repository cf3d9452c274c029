"""Hand-batched multi-sequence tracking: B independent sequences per chip.

`vmap(tracking_step)` lowers every `lax.cond` to a both-branch select, so
the rare expensive paths (bridge re-keyframing, Essential RANSAC, PnP
recovery, keyframe creation, periodic PnP, loop closure) execute on EVERY
frame for the whole batch — the round-1 measurement collapsed to ~37 fps
aggregate. This module batches the step BY HAND instead:

  * the cheap always-on math (descriptor matmuls, 3D-3D RANSAC, EKF,
    local-map tracking, GN refine) is vmapped — these are exactly the ops
    that get FASTER per frame when batched on the MXU;
  * each rare expensive block is hoisted behind a SCALAR
    `lax.cond(jnp.any(mask), ...)`: when no sequence in the batch needs it
    (the common case) the block is skipped outright; when any does, it runs
    vmapped once and a per-member select applies it only where masked.

Semantics mirror `tracking.tracking_step` (same helpers, same key
derivation) — `tests/test_tracking_batched.py` pins the equivalence.
Reference behavior being batched: `/root/reference/src/Slam.cpp:809-1135`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vslam_tpu.config import SlamConfig
from vslam_tpu.core.state import FrameFeatures, StepOutputs, TrackState
from vslam_tpu.core import tracking as T
from vslam_tpu.ops import camera as cam
from vslam_tpu.ops import ekf as ekf_ops
from vslam_tpu.ops import matching
from vslam_tpu.ops import se3
from vslam_tpu.ops.linalg import f32_matmuls


def _select(mask, new, old):
    """Per-member pytree select: take `new` where mask (B,) else `old`."""

    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    return jax.tree.map(sel, new, old)


def _zero_outputs(B: int, dtype=jnp.float32) -> StepOutputs:
    f = dtype
    return StepOutputs(
        R=jnp.zeros((B, 3, 3), f),
        t=jnp.zeros((B, 3), f),
        timestamp=jnp.zeros(B, f),
        x_pred=jnp.zeros((B, 6), f),
        P_pred=jnp.zeros((B, 6, 6), f),
        x_filt=jnp.zeros((B, 6), f),
        P_filt=jnp.zeros((B, 6, 6), f),
        dt=jnp.zeros(B, f),
        num_matches=jnp.zeros(B, jnp.int32),
        num_inliers=jnp.zeros(B, jnp.int32),
        num_tracked=jnp.zeros(B, jnp.int32),
        is_keyframe=jnp.zeros(B, bool),
        used_3d3d=jnp.zeros(B, bool),
        tracking_ok=jnp.zeros(B, bool),
        epi_before=jnp.zeros(B, f),
        epi_after=jnp.zeros(B, f),
        bridged=jnp.zeros(B, bool),
        recovered=jnp.zeros(B, bool),
        num_depth_ok=jnp.zeros(B, jnp.int32),
    )


def _track_local_map_batched(st, frame, config, R_new, t_new):
    """Batched `tracking._track_local_map`: the projection math is vmapped
    (cheap elementwise) and the radius matcher — the dominant term of the
    batched step (862 of 1985 us/iter at B=4) — runs as ONE batched Pallas
    kernel (`matching.radius_descriptor_match_fused_batched`) instead of a
    vmapped per-member grid. Semantics identical (`src/Slam.cpp:380-469`,
    found counters `:1099-1104`).

    NOT on the hot path: measured on v5e at production shapes
    (B=4, M=16384, K=400, D=256) the single-launch kernel is SLIGHTLY
    SLOWER than vmap of the single kernel (766.8 vs 711.7 us/iter) —
    the pass is VMEM-stream bound on the 16 MB map-descriptor sweep,
    which batching the launch cannot reduce (BENCH_NOTES "Negative
    result: batched radius-match kernel"). Kept (with equivalence
    pinned by tests/test_pallas_matching.py) for attribution runs via
    scripts/bench_batched_step.py."""
    fx, fy, cx, cy = T._intr(config)

    def proj(s, R, t):
        Rcw, tcw = se3.inverse(R, t)
        p_c = se3.transform_points(Rcw, tcw, s.map.pos)
        uv_mp, front = cam.project(p_c, fx, fy, cx, cy)
        in_img = front & cam.in_image(
            uv_mp, config.camera.width, config.camera.height
        )
        return uv_mp, s.map.valid & in_img

    uv_mp, visible_mask = jax.vmap(proj)(st, R_new, t_new)
    mp_idx, kp_ok, _, min_pix_d2 = matching.radius_descriptor_match_fused_batched(
        frame.desc, frame.xy, frame.valid,
        st.map.desc, uv_mp, visible_mask,
        radius_px=config.map.track_search_radius_px,
        desc_thresh=config.map.track_desc_threshold,
    )
    r2 = config.map.track_visibility_radius_px**2
    found_inc = visible_mask & (min_pix_d2 < r2)
    map2 = st.map._replace(
        visible=st.map.visible + visible_mask.astype(jnp.int32),
        found=st.map.found + found_inc.astype(jnp.int32),
    )
    return mp_idx, kp_ok, map2


def _track_batched(st: TrackState, frame: FrameFeatures, config: SlamConfig, keys):
    """Batched equivalent of `tracking.tracking_step`'s track() body."""
    B = frame.timestamp.shape[0]
    ks = jax.vmap(lambda k: jax.random.split(k, 7))(keys)  # (B, 7, 2)
    k_match, k_motion, k_pnp, k_recover, k_loop, k_periodic, k_fgate = (
        ks[:, i] for i in range(7)
    )

    # ---- 1. Match vs the active keyframe (always; one batched matmul) ----
    m, uv_kf, uv_cur, gated, n_raw = jax.vmap(
        lambda s, f, k: T._match_to_keyframe(s, f, config, k)
    )(st, frame, k_match)

    # ---- 2. Bridge-keyframe promotion (rare; hoisted) ----
    can_bridge = (
        (n_raw < config.frontend.min_matches)
        & (st.prev_frame_id >= 0)
        & (st.prev_frame_id != st.kf_frame_id)
    )

    def do_bridge(args):
        st0, m0, uv_kf0, uv_cur0, gated0, n_raw0 = args
        new = jax.vmap(lambda s, f, k: T._bridge(s, f, config, k))(
            st0, frame, k_match
        )
        return _select(can_bridge, new, args)

    st, m, uv_kf, uv_cur, gated, n_raw = jax.lax.cond(
        jnp.any(can_bridge),
        do_bridge,
        lambda args: args,
        (st, m, uv_kf, uv_cur, gated, n_raw),
    )

    # ---- 2b. Main-path fundamental gate (always-on when enabled; it runs
    # every frame in the unbatched step too, so vmap — not hoist) ----
    if config.motion.fgate_main_path:
        gated, epi_before, epi_after = jax.vmap(
            lambda ukf, ucur, g, k: T._fundamental_gate(ukf, ucur, g, config, k)
        )(uv_kf, uv_cur, gated, k_fgate)
    else:
        epi_before = jnp.zeros(B, jnp.float32)
        epi_after = jnp.zeros(B, jnp.float32)
    n_matches = jnp.sum(gated, axis=-1)

    # ---- 3. Motion: 3D-3D always (batched small-matrix RANSAC) ----
    ks2 = jax.vmap(jax.random.split)(k_motion)  # (B, 2, 2)
    k1, k2 = ks2[:, 0], ks2[:, 1]
    R3, t3, res3, p_kf, p_cur, d_ok = jax.vmap(
        lambda s, f, mm, ukf, ucur, g, k: T._motion_3d3d(
            s, f, config, mm, ukf, ucur, g, k
        )
    )(st, frame, m, uv_kf, uv_cur, gated, k1)
    use_3d3d = res3.ok & jnp.asarray(config.rgbd)
    n_depth_ok = jnp.sum(gated & d_ok, axis=-1).astype(jnp.int32)

    # ---- 4. Essential fallback + scale (rare on RGB-D; hoisted) ----
    need_e = ~use_3d3d

    def do_essential(_):
        return jax.vmap(
            lambda s, f, ukf, ucur, g, pk, pc2, dk, k: T._motion_essential(
                s, f, config, ukf, ucur, g, pk, pc2, dk, k
            )
        )(st, frame, uv_kf, uv_cur, gated, p_kf, p_cur, d_ok, k2)

    def skip_essential(_):
        f = st.t.dtype
        return (
            jnp.zeros((B, 3, 3), f),
            jnp.zeros((B, 3), f),
            jnp.zeros(B, bool),
            jnp.zeros(B, res3.num_inliers.dtype),
            st.last_scale,
        )

    Re, te_s, e_ok, e_ninl, new_scale_e = jax.lax.cond(
        jnp.any(need_e), do_essential, skip_essential, None
    )

    R_rel = jnp.where(use_3d3d[:, None, None], R3, Re)
    t_rel = jnp.where(use_3d3d[:, None], t3, te_s)
    # Pose composition (`src/Slam.cpp:960-984`)
    R_mot = jnp.einsum("bij,bkj->bik", st.kf_R, R_rel)
    t_mot = st.kf_t - jnp.einsum("bij,bj->bi", R_mot, t_rel)
    motion_ok = use_3d3d | (need_e & e_ok)
    n_inl = jnp.where(use_3d3d, res3.num_inliers, e_ninl)
    new_scale = jnp.where(use_3d3d, st.last_scale, new_scale_e)
    enough = n_matches >= config.frontend.min_matches
    motion_ok = motion_ok & enough

    # ---- 5. PnP recovery (rare; hoisted) ----
    can_recover = (
        (~enough)
        & (st.recovery_cooldown <= 0)
        & (jnp.sum(st.map.valid, axis=-1) >= config.pnp.min_points)
    )

    def do_recover(_):
        return jax.vmap(lambda s, f, k: T._try_pnp_recovery(s, f, config, k))(
            st, frame, k_recover
        )

    def skip_recover(_):
        return st.R, st.t, jnp.zeros(B, bool)

    R_rec, t_rec, rec_ok = jax.lax.cond(
        jnp.any(can_recover), do_recover, skip_recover, None
    )
    recovered = can_recover & rec_ok

    # ---- 6. EKF fusion (cheap; vmapped every frame) ----
    R_new = jnp.where(motion_ok[:, None, None], R_mot, st.R)
    t_meas = jnp.where((motion_ok & ~frame.stationary)[:, None], t_mot, st.t)
    ekf_st, t_fused, snap = jax.vmap(
        lambda s, f, tm, u3, mo: T._fuse_ekf(s, f, config, tm, u3, mo)
    )(st, frame, t_meas, use_3d3d, motion_ok & ~frame.stationary)
    R_new = se3.renormalize_rotation(R_new)
    t_new = jnp.where(frame.stationary[:, None], st.t, t_fused)

    R_new = jnp.where(recovered[:, None, None], R_rec, R_new)
    t_new = jnp.where(recovered[:, None], t_rec, t_new)
    ekf_reset = jax.vmap(ekf_ops.initialize)(t_rec, frame.timestamp)
    ekf_st = _select(recovered, ekf_reset, ekf_st)

    # ---- 7. Local-map tracking + GN PnP refine (always; batched) ----
    mp_idx, kp_ok, map2 = jax.vmap(
        lambda s, f, R, t: T._track_local_map(s, f, config, R, t)
    )(st, frame, R_new, t_new)
    st = st._replace(map=map2)
    n_tracked = jnp.sum(kp_ok, axis=-1)
    R_ref, t_ref, n_pnp, R_full, t_full = jax.vmap(
        lambda s, f, R, t, mi, ko, k: T._refine_pnp(s, f, config, R, t, mi, ko, k)
    )(st, frame, R_new, t_new, mp_idx, kp_ok, k_pnp)
    R_fin = R_ref
    t_fin = jnp.where(frame.stationary[:, None], st.t, t_ref)
    # Keyframe registration pose (see PnPConfig.kf_refine_full).
    if config.pnp.kf_refine_full:
        R_kfp = R_full
        t_kfp = jnp.where(frame.stationary[:, None], st.t, t_full)
    else:
        R_kfp, t_kfp = R_fin, t_fin

    # ---- 8. Keyframe policy ----
    gap = frame.frame_id - st.kf_frame_id
    is_kf_normal = (
        ((gap >= config.map.kf_min_frame_gap) & (n_matches >= config.map.kf_min_matches))
        | ((gap >= config.map.kf_proactive_min_gap)
           & (n_matches < config.map.kf_proactive_max_matches))
    ) & motion_ok & ~frame.stationary & ~recovered
    rot_drift = jnp.linalg.norm(
        jax.vmap(se3.log_so3)(jnp.einsum("bij,bkj->bik", R_fin, st.kf_R)), axis=-1
    )
    is_kf_rot = (
        frame.stationary & (rot_drift > config.ekf.stationary_kf_rot_drift) & motion_ok
    )
    is_kf_post = st.was_stationary & ~frame.stationary & motion_ok
    is_kf = is_kf_normal | is_kf_rot | is_kf_post

    # ---- 9. Keyframe creation + reprojection cull (frequent-ish; hoisted) --
    def do_kf(st0):
        def one(s, f, R, t, mm, g, mi, ko):
            # Protect observed slots from eviction (see T._make_keyframe):
            # mi/ko are also consumed by the periodic PnP in step 10.
            M = s.map.valid.shape[0]
            protect = (
                jnp.zeros(M, dtype=bool)
                .at[jnp.where(ko, mi, M)]
                .set(True, mode="drop")
            )
            s2 = T._make_keyframe(s, f, config, R, t, mm, g, protect=protect)
            s2 = s2._replace(
                map=T._reproject_cull(s2.map, f, config, R, t, mi, ko)
            )
            return s2

        st2 = jax.vmap(one)(st0, frame, R_kfp, t_kfp, m, gated, mp_idx, kp_ok)
        return _select(is_kf, st2, st0)

    st_kf = jax.lax.cond(jnp.any(is_kf), do_kf, lambda s: s, st)

    # ---- 10. Periodic global PnP (rare; hoisted) ----
    do_pnp = is_kf & (jnp.mod(st_kf.kf_count, config.pnp.interval) == 0)

    def do_periodic(_):
        R_p, t_p = jax.vmap(
            lambda s, f, R, t, mi, ko, k: T._periodic_pnp(
                s, f, config, R, t, mi, ko, k
            )
        )(st_kf, frame, R_kfp, t_kfp, mp_idx, kp_ok, k_periodic)
        return (
            jnp.where(do_pnp[:, None, None], R_p, R_kfp),
            jnp.where(do_pnp[:, None], t_p, t_kfp),
        )

    R_kf, t_kf = jax.lax.cond(
        jnp.any(do_pnp), do_periodic, lambda _: (R_kfp, t_kfp), None
    )
    # Write the (possibly blended) pose into the active KF + ring slot for
    # members that made a keyframe (`Slam.cpp:1520`).
    KFC = st_kf.keyframes.valid.shape[0]
    slot = jnp.mod(st_kf.kf_count - 1, KFC)

    def write_ring(s, R, t, sl, on):
        dest = jnp.where(on, sl, KFC)
        return s._replace(
            kf_R=jnp.where(on, R, s.kf_R),
            kf_t=jnp.where(on, t, s.kf_t),
            keyframes=s.keyframes._replace(
                R=s.keyframes.R.at[dest].set(R, mode="drop"),
                t=s.keyframes.t.at[dest].set(t, mode="drop"),
                R_anchor=s.keyframes.R_anchor.at[dest].set(R, mode="drop"),
                t_anchor=s.keyframes.t_anchor.at[dest].set(t, mode="drop"),
            ),
        )

    st_kf = jax.vmap(write_ring)(st_kf, R_kf, t_kf, slot, is_kf)
    R_fin = jnp.where(is_kf[:, None, None], R_kf, R_fin)
    t_fin = jnp.where(is_kf[:, None], t_kf, t_fin)

    # ---- 11. Loop closure (very rare; hoisted) ----
    check_loop = is_kf & (
        jnp.mod(st_kf.kf_count, config.loop.check_interval_kfs) == 0
    )

    def do_loop(st0):
        st2 = jax.vmap(
            lambda s, f, R, t, k: T._handle_loop_closure(s, f, config, R, t, k)
        )(st0, frame, R_fin, t_fin, k_loop)
        return _select(check_loop, st2, st0)

    st_kf = jax.lax.cond(jnp.any(check_loop), do_loop, lambda s: s, st_kf)

    # ---- 12. Finalize (elementwise; batched) ----
    x_new = ekf_st.x.at[:, :3].set(t_fin)
    x_new = jnp.where(
        frame.stationary[:, None], x_new.at[:, 3:].set(0.0), x_new
    )
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
        used_3d3d=use_3d3d,
        tracking_ok=motion_ok,
        epi_before=epi_before,
        epi_after=epi_after,
        bridged=can_bridge,
        recovered=recovered,
        num_depth_ok=n_depth_ok,
    )
    return st_out, out


@f32_matmuls
def tracking_step_batched(
    states: TrackState, frames: FrameFeatures, config: SlamConfig, keys
) -> Tuple[TrackState, StepOutputs]:
    """One frame for B sequences at once; see module docstring."""
    B = frames.timestamp.shape[0]
    frames = frames._replace(desc=frames.desc.astype(states.kf_desc.dtype))
    need_boot = states.kf_frame_id < 0

    def do_boot(sts):
        new, outs = jax.vmap(lambda s, f: T._bootstrap(s, f, config))(sts, frames)
        return _select(need_boot, new, sts), _select(
            need_boot, outs, _zero_outputs(B)
        )

    st_b, out_b = jax.lax.cond(
        jnp.any(need_boot),
        do_boot,
        lambda sts: (sts, _zero_outputs(B)),
        states,
    )

    def do_track(sts):
        new, outs = _track_batched(sts, frames, config, keys)
        return _select(~need_boot, new, sts), _select(
            ~need_boot, outs, _zero_outputs(B)
        )

    st_t, out_t = jax.lax.cond(
        jnp.any(~need_boot),
        do_track,
        lambda sts: (sts, _zero_outputs(B)),
        st_b,
    )
    out = _select(need_boot, out_b, out_t)
    return st_t, out


def make_batched_scan_step(config: SlamConfig, seed: int = 42):
    """A `lax.scan`-compatible batched step: key = fold_in(seed, frame_id)
    per member, matching the unbatched scan's derivation exactly."""

    def scan_fn(states: TrackState, frames: FrameFeatures):
        keys = jax.vmap(
            lambda fid: jax.random.fold_in(jax.random.PRNGKey(seed), fid)
        )(frames.frame_id)
        return tracking_step_batched(states, frames, config, keys)

    return scan_fn


@functools.partial(jax.jit, static_argnames=("config", "seed"))
def batched_tracking_scan(
    states: TrackState, frames: FrameFeatures, config: SlamConfig, seed: int = 42
):
    """Scan the hand-batched step over (N, B, ...) frame stacks.

    `frames` leaves are (B, N, ...) like `parallel.mesh` produces; they are
    transposed to scan-major internally.
    """
    frames_t = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), frames)
    step = make_batched_scan_step(config, seed=seed)
    final, outs = jax.lax.scan(step, states, frames_t)
    return final, jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)
