"""Sequence runner: batched frontend + scanned tracking + post-hoc passes.

Rebuilds the reference's orchestration (`/root/reference/src/main.cpp:
1036-1478` slam_processing_thread + epilogue): the 3-thread mutex pipeline
becomes (a) a batched jitted SuperPoint frontend over frame chunks, (b) a
single `lax.scan` of the tracking step over the frame stream, (c) post-hoc
RTS smoothing (`main.cpp:1311`) and ATE evaluation (`:1333-1338`) — all
device-side except file I/O.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.config import SlamConfig
from vslam_tpu.core.state import FrameFeatures, StepOutputs, TrackState, init_state
from vslam_tpu.core.tracking import make_scan_step
from vslam_tpu.ops import ekf as ekf_ops


@dataclass
class RunResult:
    timestamps: np.ndarray  # (N,)
    R: np.ndarray  # (N, 3, 3) raw per-frame poses
    t: np.ndarray  # (N, 3)
    t_smoothed: np.ndarray  # (N, 3) RTS-smoothed positions
    outputs: StepOutputs  # stacked diagnostics
    final_state: TrackState


def features_from_synthetic(seq, stationary=None):
    """Pack a `SyntheticSequence` into stacked FrameFeatures arrays
    (the analogue of replaying the reference's feature cache)."""
    N = seq.kp_xy.shape[0]
    if stationary is None:
        stationary = np.zeros(N, dtype=bool)
    return FrameFeatures(
        xy=jnp.asarray(seq.kp_xy),
        desc=jnp.asarray(seq.kp_desc),
        depth=jnp.asarray(seq.kp_depth),
        valid=jnp.asarray(seq.kp_valid),
        timestamp=jnp.asarray(seq.timestamps, dtype=jnp.float32),
        stationary=jnp.asarray(stationary),
        frame_id=jnp.arange(N, dtype=jnp.int32),
    )


def compute_gravity_direction(accel, R0):
    """Mean accel -> world frame -> snap to nearest axis
    (`src/Slam.cpp:1587-1616`). Host-side (tiny)."""
    if accel is None or len(accel) == 0:
        return None, 0.0
    g_cam = np.mean(np.asarray(accel)[:, 1:4], axis=0)
    g_world = np.asarray(R0) @ g_cam
    n = np.linalg.norm(g_world)
    if n < 1e-6:
        return None, 0.0
    g_world = g_world / n
    axis = int(np.argmax(np.abs(g_world)))
    snapped = np.zeros(3, dtype=np.float32)
    snapped[axis] = np.sign(g_world[axis])
    return snapped, 0.0  # initial height = t0 . g (t0 = 0 in our runs)


def detect_stationary(accel, timestamps, window=0.1, threshold=0.15):
    """Per-frame stationarity from accel-magnitude std in a ±window
    (`src/Slam.cpp:1621-1651`). Host-side precompute, fully vectorized:
    windowed mean/variance come from prefix sums between per-frame
    searchsorted bounds — O(N + F) instead of a Python loop per frame."""
    if accel is None or len(accel) == 0:
        return np.zeros(len(timestamps), dtype=bool)
    a = np.asarray(accel)
    mags = np.linalg.norm(a[:, 1:4], axis=-1)
    ts = a[:, 0]
    t = np.asarray(timestamps)
    lo = np.searchsorted(ts, t - window)
    hi = np.searchsorted(ts, t + window)
    n = (hi - lo).astype(np.int64)
    c1 = np.concatenate([[0.0], np.cumsum(mags)])
    c2 = np.concatenate([[0.0], np.cumsum(mags * mags)])
    nn = np.maximum(n, 1)
    mean = (c1[hi] - c1[lo]) / nn
    var = np.maximum((c2[hi] - c2[lo]) / nn - mean * mean, 0.0)
    return (n >= 5) & (np.sqrt(var) < threshold)


@functools.partial(jax.jit, static_argnames=("config", "seed"))
def _scan_sequence(state: TrackState, frames: FrameFeatures, config: SlamConfig, seed: int):
    step = make_scan_step(config, seed=seed)
    return jax.lax.scan(step, state, frames)


@functools.partial(jax.jit, static_argnames=("config", "seed", "chunk"))
def _scan_sequence_chunked(
    state: TrackState, frames: FrameFeatures, config: SlamConfig,
    seed: int, chunk: int,
):
    """Chunked tracking scan with the SAME in-run loop-correction
    semantics as the coupled pixels-in program (`core.coupled`): after
    each chunk, a device-side cond runs `inrun_pgo_correct` iff the chunk
    accepted a new loop constraint. Feature-level counterpart for tests
    and diagnostics. N must be divisible by `chunk`."""
    step = make_scan_step(config, seed=seed)
    N = frames.xy.shape[0]
    S = N // chunk
    frames_c = jax.tree.map(
        lambda x: x.reshape((S, chunk) + x.shape[1:]), frames
    )

    def chunk_step(st, fr):
        n0 = jnp.sum(st.loops.valid)
        st, outs = jax.lax.scan(step, st, fr)
        if config.opt.inrun_pgo:
            st = jax.lax.cond(
                jnp.sum(st.loops.valid) > n0,
                lambda s: inrun_pgo_correct(s, config),
                lambda s: s,
                st,
            )
        return st, outs

    st, outs = jax.lax.scan(chunk_step, state, frames_c)
    outs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), outs)
    return st, outs


def result_from_outputs(
    final_state: TrackState, outs, smooth: bool = True,
    keep_refine: bool = True, rts_parallel: bool = True,
) -> RunResult:
    """Package scan outputs as a RunResult, applying the RTS backward
    smoother over the carried EKF snapshots (the reference always smooths
    before evaluating, `src/main.cpp:1311` -> `src/Slam.cpp:1761-1810`).
    Shared by the tracking-only runner and the coupled pixels-in program.

    `keep_refine` (EKFConfig.smooth_keep_refine semantics, NEW vs the
    reference): the snapshots are taken at the EKF update, BEFORE
    local-map PnP refinement — plain RTS therefore discards the
    refinement when its positions overwrite the poses. Adding the
    per-frame delta (t_raw - x_filt) back keeps it on top of the
    smoothed EKF component; False reproduces the reference smoother."""
    t_raw = np.asarray(outs.t)
    if smooth:
        snaps = ekf_ops.EKFSnapshot(
            x_pred=outs.x_pred,
            P_pred=outs.P_pred,
            x_filt=outs.x_filt,
            P_filt=outs.P_filt,
            dt=outs.dt,
            frame_id=jnp.arange(t_raw.shape[0], dtype=jnp.int32),
        )
        valid = jnp.asarray(np.ones(t_raw.shape[0], dtype=bool))
        # Parallel-in-time smoother by default (EKFConfig.rts_parallel):
        # log-depth associative scan, equivalent to the sequential
        # backward scan to float round-off (tests/test_ekf.py pins it).
        smoother = (
            ekf_ops.rts_smooth_assoc if rts_parallel else ekf_ops.rts_smooth
        )
        t_smooth = np.asarray(jax.jit(smoother)(snaps, valid))
        if keep_refine:
            t_smooth = t_smooth + (t_raw - np.asarray(outs.x_filt)[:, :3])
    else:
        t_smooth = t_raw

    return RunResult(
        timestamps=np.asarray(outs.timestamp, dtype=np.float64),
        R=np.asarray(outs.R),
        t=t_raw,
        t_smoothed=t_smooth,
        outputs=outs,
        final_state=final_state,
    )


def run_tracking(
    frames: FrameFeatures,
    config: SlamConfig,
    state: Optional[TrackState] = None,
    gravity=None,
    initial_height=0.0,
    seed: int = 42,
    smooth: bool = True,
    chunk: Optional[int] = None,
) -> RunResult:
    """Run the tracking scan over a packed frame stream + RTS smoothing.

    `chunk`: when set, scan in chunks with in-run loop correction between
    them (the coupled program's semantics, see `_scan_sequence_chunked`).
    """
    if state is None:
        state = init_state(config, gravity=gravity, initial_height=initial_height)
    if chunk:
        final_state, outs = _scan_sequence_chunked(
            state, frames, config, seed, chunk
        )
    else:
        final_state, outs = _scan_sequence(state, frames, config, seed)
    return result_from_outputs(
        final_state, outs, smooth=smooth,
        keep_refine=config.ekf.smooth_keep_refine,
        rts_parallel=config.ekf.rts_parallel,
    )


def pgo_ring_solve(st, gravity_opt, initial_height, config,
                   iterations=None, single_edge_floor=True):
    """Gain-gated PGO over the keyframe ring + loop constraints + height
    prior — the solve shared by the post-hoc backend (`_pgo_pass`) and
    the IN-RUN correction inside the coupled program
    (`core.coupled.run_coupled`). Pure traced function (callers jit).

    `single_edge_floor` applies the one-edge correction floor
    (OptimizerConfig.pgo_single_loop_min_correction_m) — on for the
    post-hoc backend, OFF for the in-run path: mid-run an uncorrected
    drift COMPOUNDS (later constraints fail the jump gate, tracking
    degrades), so acting on the first edge is worth the noise risk, and
    the in-run fold has its own floor at the newest keyframe on top.

    Returns (R_opt, t_opt): the current ring poses when the pass is
    skipped (not significant) or rejected (no chi^2 improvement).
    """
    from vslam_tpu.ops import pgo

    kfs = st.keyframes
    oc = config.opt
    if iterations is None:
        iterations = oc.pgo_iterations
    e_i, e_j, e_R, e_t, e_info, e_valid = pgo.build_odometry_edges(
        kfs.R, kfs.t, kfs.valid, kfs.frame_id,
        oc.pgo_odom_trans_sigma, oc.pgo_odom_rot_sigma,
    )
    loops = st.loops
    li = loops.kf_from
    lj = loops.kf_to
    # A wrapped keyframe ring may have overwritten a constraint's endpoint:
    # the constraint is only usable while both slots still hold the frames
    # recorded at creation.
    l_fresh = (
        loops.valid
        & (kfs.frame_id[jnp.clip(li, 0, None)] == loops.from_id)
        & (kfs.frame_id[jnp.clip(lj, 0, None)] == loops.to_id)
    )
    l_info = jnp.tile(
        jnp.concatenate(
            [
                jnp.full(3, 1.0 / oc.pgo_lc_trans_sigma**2, jnp.float32),
                jnp.full(3, 1.0 / oc.pgo_lc_rot_sigma**2, jnp.float32),
            ]
        )[None],
        (li.shape[0], 1),
    )
    prob = pgo.PGOProblem(
        R=kfs.R,
        t=kfs.t,
        v_valid=kfs.valid,
        e_i=jnp.concatenate([e_i, jnp.clip(li, 0, None)]),
        e_j=jnp.concatenate([e_j, jnp.clip(lj, 0, None)]),
        e_R=jnp.concatenate([e_R, loops.R_rel]),
        e_t=jnp.concatenate([e_t, loops.t_rel]),
        e_info=jnp.concatenate([e_info, l_info]),
        e_valid=jnp.concatenate([e_valid, l_fresh]),
        # DCS on LOOP edges only (odometry edges are trusted): a wrong
        # closure that slipped the detection gates is down-weighted
        # instead of dragging the whole graph (ops/pgo.py `_dcs_scale`).
        e_robust=jnp.concatenate(
            [jnp.zeros(e_i.shape[0], bool), jnp.ones(li.shape[0], bool)]
        ),
        dcs_phi=jnp.asarray(oc.pgo_loop_dcs_phi, jnp.float32),
        gravity=st.gravity if gravity_opt is None else gravity_opt,
        height=initial_height,
        height_info=jnp.asarray(1.0 / oc.pgo_height_sigma**2, jnp.float32),
        height_on=st.has_height,
    )
    # Gain gate (two conditions; see OptimizerConfig):
    # 1. SIGNIFICANCE — the loop/height constraints must be violated well
    #    beyond their sigmas (chi^2 per dof). Odometry edges are built
    #    from the current poses (zero residual), so chi2_before measures
    #    exactly the informative constraints; at noise level the global
    #    optimum just redistributes measurement noise and the pass is
    #    skipped outright.
    # 2. IMPROVEMENT — the optimized poses must strictly reduce the total
    #    constraint chi^2 (divergence guard).
    # Significance depends only on the INPUT poses, so it gates the GN
    # solve itself (lax.cond): a rejected-anyway solve is pure cost —
    # `pgo.optimize` is `pgo_iterations` jacrev + dense-Cholesky rounds.
    chi2_before = pgo.total_chi2(prob, kfs.R, kfs.t)
    n_height = jnp.sum(kfs.valid) * st.has_height
    dof = 6 * jnp.sum(l_fresh) + n_height
    significant = chi2_before > oc.pgo_min_chi2_per_dof * jnp.maximum(dof, 1)

    def _pgo_opt(_):
        R_opt, t_opt = pgo.optimize(prob, iterations=iterations)
        chi2_after = pgo.total_chi2(prob, R_opt, t_opt)
        acc = chi2_after < chi2_before * (1.0 - 1e-5)
        # Correction floor when LOOP edges participate (round-5,
        # measured): a loop edge carries ~pgo_lc_trans_sigma of noise,
        # so a solve whose correction is smaller than that floor mostly
        # injects measurement noise into the trajectory (stress world:
        # ATE 0.059 -> 0.0711 post-backend from one noisy edge). A
        # materially bent trajectory moves keyframes by decimeters;
        # below the floor, reject. Height-only passes are unaffected.
        # A SINGLE loop edge additionally has no consensus redundancy
        # (the DCS weights need >= 2 edges to cross-check), so one-edge
        # solves must clear the much larger single-edge floor — see
        # OptimizerConfig.pgo_single_loop_min_correction_m.
        max_dt = jnp.max(
            jnp.where(
                kfs.valid, jnp.linalg.norm(t_opt - kfs.t, axis=-1), 0.0
            )
        )
        n_loop = jnp.sum(l_fresh)
        single_floor = (
            oc.pgo_single_loop_min_correction_m if single_edge_floor
            else oc.pgo_loop_min_correction_m
        )
        floor = jnp.where(
            n_loop >= 2, oc.pgo_loop_min_correction_m, single_floor
        )
        acc = acc & ((n_loop == 0) | (max_dt >= floor))
        return jnp.where(acc, R_opt, kfs.R), jnp.where(acc, t_opt, kfs.t)

    def _pgo_noop(_):
        return kfs.R, kfs.t

    return jax.lax.cond(significant, _pgo_opt, _pgo_noop, None)


@functools.partial(jax.jit, static_argnames=("config",))
def _pgo_pass(st, res_R, res_t, res_t_smoothed, gravity_opt, initial_height, config):
    """Whole PGO pass (solve + trajectory/map corrections) as ONE jitted
    program — eager op-by-op construction costs a relay round trip per op
    on the axon backend."""
    from vslam_tpu.ops import pgo

    kfs = st.keyframes
    R_opt, t_opt = pgo_ring_solve(st, gravity_opt, initial_height, config)

    # Trajectory correction is measured from the ANCHOR (tracked) poses,
    # not the current ring poses: when in-run PGO already moved the ring
    # mid-sequence (core.coupled), frames emitted before that correction
    # still carry the anchor-era poses, so the cumulative anchor->final
    # delta is the right correction for every frame. With no in-run
    # events anchor == ring and this is the reference's single post-hoc
    # delta (`Optimizer.cpp:795-827`).
    frame_ids = jnp.arange(res_t.shape[0], dtype=jnp.float32)
    _, t_corr = pgo.correct_trajectory(
        frame_ids, res_R, res_t, kfs.frame_id, kfs.valid,
        kfs.R_anchor, kfs.t_anchor, R_opt, t_opt,
    )
    _, t_corr_s = pgo.correct_trajectory(
        frame_ids, res_R, res_t_smoothed, kfs.frame_id, kfs.valid,
        kfs.R_anchor, kfs.t_anchor, R_opt, t_opt,
    )
    moved = pgo.correct_map_points(
        st.map.pos, jnp.mod(st.map.first_kf, kfs.valid.shape[0]), kfs.valid,
        kfs.R, kfs.t, R_opt, t_opt,
    )
    return R_opt, t_opt, t_corr, t_corr_s, moved


def inrun_pgo_correct(st: TrackState, config: SlamConfig) -> TrackState:
    """IN-RUN pose-graph correction: gain-gated PGO over the ring, with
    the result folded back into the LIVE tracking state so subsequent
    frames track against loop-consistent keyframes and map points.

    The reference's design point is PGO immediately after a loop closure
    (`src/Slam.cpp:730-798` accumulates the constraint; the posthoc
    consumer is `Optimizer.cpp:654-863`); this is its streaming form —
    called from the coupled chunk scan (`core.coupled.run_coupled`) when
    a chunk accepted a new loop constraint, entirely device-side. Without
    it, a long run's drift keeps growing until later constraints fail the
    0.5 m jump gate; with it, drift resets at the first closure.

    Updates: keyframe ring poses (anchors untouched — see KeyframeStore),
    map points (moved rigidly with their owning keyframe), the current /
    previous / active-keyframe poses and the EKF mean (all by the newest
    keyframe's delta, since the tracker's state is relative to it).
    """
    from vslam_tpu.ops import pgo, se3

    kfs = st.keyframes
    R_opt, t_opt = pgo_ring_solve(
        st, None, st.initial_height, config,
        iterations=config.opt.inrun_pgo_iterations,
        single_edge_floor=False,
    )
    # Correction-size gate (round-5, measured): a fresh loop constraint
    # carries ~sigma_t of measurement noise, so on a LOW-drift run an
    # in-run relaxation mostly injects that noise into the live state —
    # the 2,560-frame feature rehearsal measured raw ATE 0.045 without
    # in-run corrections vs 0.073 with them applied unconditionally,
    # while the genuinely-drifted image-level long runs are exactly the
    # case the correction exists for. Fold the correction back only when
    # the newest keyframe actually MOVES by more than the constraint
    # noise floor; below that, the post-hoc backend polishes better.
    newest = jnp.argmax(jnp.where(kfs.valid, kfs.frame_id, -1))
    dt_corr = jnp.linalg.norm(t_opt[newest] - kfs.t[newest])
    apply = dt_corr >= config.opt.inrun_min_correction_m

    moved = pgo.correct_map_points(
        st.map.pos, jnp.mod(st.map.first_kf, kfs.valid.shape[0]), kfs.valid,
        kfs.R, kfs.t, R_opt, t_opt,
    )
    # Newest valid keyframe's rigid delta T_new ∘ T_old^{-1}.
    Rd, td = se3.compose(
        R_opt[newest], t_opt[newest],
        *se3.inverse(kfs.R[newest], kfs.t[newest]),
    )

    def move(R, t):
        return Rd @ R, (Rd @ t[..., None])[..., 0] + td

    R_cur, t_cur = move(st.R, st.t)
    R_prev, t_prev = move(st.prev_R, st.prev_t)
    x = st.ekf.x.at[:3].set(t_cur)
    x = x.at[3:].set(Rd @ st.ekf.x[3:])
    st_corr = st._replace(
        keyframes=kfs._replace(R=R_opt, t=t_opt),
        map=st.map._replace(pos=moved),
        R=R_cur,
        t=t_cur,
        kf_R=R_opt[newest],
        kf_t=t_opt[newest],
        prev_R=R_prev,
        prev_t=t_prev,
        ekf=st.ekf._replace(x=x),
        inrun_corrections=st.inrun_corrections + 1,
    )
    return jax.tree.map(
        lambda a, b: jnp.where(apply, a, b), st_corr, st
    )


def run_posthoc_pgo(result: RunResult, config: SlamConfig, gravity=None, initial_height=0.0):
    """Post-hoc pose-graph optimization over the keyframe ring + loop
    constraints + height prior (`Slam::run_posthoc_pgo`,
    `src/Slam.cpp:1748-1755` -> `Optimizer.cpp:654-863`), then the
    trajectory/map-point correction passes. Returns a new RunResult with
    corrected positions (raw + smoothed are both corrected)."""
    from vslam_tpu.ops import pgo

    st = result.final_state
    kfs = st.keyframes
    n_kf = int(np.asarray(jnp.sum(kfs.valid)))
    if n_kf < 2:
        return result

    R_opt, t_opt, t_corr, t_corr_s, moved = _pgo_pass(
        st, jnp.asarray(result.R), jnp.asarray(result.t),
        jnp.asarray(result.t_smoothed),
        None if gravity is None else jnp.asarray(gravity, jnp.float32),
        jnp.asarray(initial_height, jnp.float32),
        config,
    )
    new_state = st._replace(
        map=st.map._replace(pos=moved),
        keyframes=kfs._replace(R=R_opt, t=t_opt),
    )
    return RunResult(
        timestamps=result.timestamps,
        R=result.R,
        t=np.asarray(t_corr),
        t_smoothed=np.asarray(t_corr_s),
        outputs=result.outputs,
        final_state=new_state,
    )


@functools.partial(jax.jit, static_argnames=("config", "P"))
def _build_ba_obs(map_store, kfs, slots, config: SlamConfig, P: int):
    """Select top-P map points by observation count + associate them into
    every window keyframe — ONE device program (a per-KF host loop costs
    ~10 relay round trips). Module-level jit so the compilation caches
    across run_windowed_ba calls."""
    from vslam_tpu.ops import camera as cam
    from vslam_tpu.ops import matching

    c = config.camera
    score = jnp.where(map_store.valid, map_store.num_obs, -1)
    _, cand = jax.lax.top_k(score, P)
    X = map_store.pos[cand]
    desc_pts = map_store.desc[cand]
    pt_ok = map_store.valid[cand]

    def per_kf(s):
        R = kfs.R[s]
        t = kfs.t[s]
        Rcw = R.T
        tcw = -Rcw @ t
        p_c = X @ Rcw.T + tcw
        uv_proj, front = cam.project(p_c, c.fx, c.fy, c.cx, c.cy)
        in_img = front & cam.in_image(uv_proj, c.width, c.height) & pt_ok
        mp_idx, kp_ok, _ = matching.radius_descriptor_match(
            kfs.desc[s], kfs.xy[s], kfs.kp_valid[s],
            desc_pts, uv_proj, in_img,
            radius_px=config.opt.ba_obs_radius_px,
            desc_thresh=config.opt.ba_obs_desc_threshold,
        )
        # Scatter keypoint pixels onto their matched points.
        dest = jnp.where(kp_ok, mp_idx, P)
        uv_p = jnp.zeros((P, 2), jnp.float32).at[dest].set(kfs.xy[s], mode="drop")
        m_p = jnp.zeros(P, bool).at[dest].set(True, mode="drop")
        return uv_p, m_p

    uv, mask = jax.vmap(per_kf)(slots)
    return X, uv, mask, cand


@jax.jit
def _ba_finish(kfs, map_pos, slots, t0_win, R_opt, t_opt, X_opt, cand,
               point_valid, res_R, res_t, res_t_smoothed, max_jump):
    """BA epilogue as one program: per-KF jump gate (Config.h:100),
    keyframe write-back, trajectory correction, refined-point scatter."""
    from vslam_tpu.ops import pgo

    jump = jnp.linalg.norm(t_opt - t0_win, axis=-1)
    accept = jump < max_jump
    dest = jnp.where(accept, slots, kfs.R.shape[0])
    R_new = kfs.R.at[dest].set(R_opt, mode="drop")
    t_new = kfs.t.at[dest].set(t_opt, mode="drop")

    frame_ids = jnp.arange(res_t.shape[0], dtype=jnp.float32)
    _, t_corr = pgo.correct_trajectory(
        frame_ids, res_R, res_t, kfs.frame_id, kfs.valid, kfs.R, kfs.t,
        R_new, t_new,
    )
    _, t_corr_s = pgo.correct_trajectory(
        frame_ids, res_R, res_t_smoothed, kfs.frame_id, kfs.valid, kfs.R,
        kfs.t, R_new, t_new,
    )
    pdest = jnp.where(point_valid, cand, map_pos.shape[0])
    pos_new = map_pos.at[pdest].set(X_opt, mode="drop")
    return R_new, t_new, t_corr, t_corr_s, pos_new


def _ba_gated_solve(prob, config: SlamConfig, iterations: int):
    """BA LM solve wrapped in the full gate chain — shared by the fused
    backend (`_backend_pass`) and the sequential path (`run_windowed_ba`)
    so the two stay equivalent by construction. Pure traced function.

    Gates:
      1. significance pre-gate (skip the LM solve when the accept gate
         could only reject it — `ba_significant`);
      2. `ba_accept_window` (joint + pose-vs-original-points improvement);
      3. HOLDOUT VALIDATION (OptimizerConfig.ba_holdout_frac > 0): a
         deterministic ~10% of observations are withheld from the solve;
         the solution must also improve the Huber reprojection cost on
         the WITHHELD set. Internal-cost gates can accept steps that fit
         measurement noise (round-4 measured: stress-world ATE 0.059 ->
         0.0643 post-backend); generalization to unseen observations is
         the honest test — with too few withheld observations (< 32) the
         gate abstains rather than deciding on noise.

    Returns (R_opt, t_opt, X_opt, accept).
    """
    from vslam_tpu.ops import ba as ba_ops

    oc = config.opt
    frac = oc.ba_holdout_frac
    if frac > 0.0:
        W_, P_ = prob.obs_valid.shape
        ii = jnp.arange(W_, dtype=jnp.uint32)[:, None]
        jj = jnp.arange(P_, dtype=jnp.uint32)[None, :]
        h = (ii * jnp.uint32(2654435761) + jj * jnp.uint32(40503)) % jnp.uint32(1000)
        val_m = (h < jnp.uint32(int(frac * 1000))) & prob.obs_valid
        train_m = prob.obs_valid & ~val_m
        prob_train = prob._replace(
            obs_valid=train_m,
            point_valid=prob.point_valid & (jnp.sum(train_m, axis=0) >= 2),
        )
        prob_val = prob._replace(obs_valid=val_m)
    else:
        prob_train = prob
        prob_val = None

    sig = ba_ops.ba_significant(
        prob_train, huber_px=oc.ba_huber_px,
        min_cost_per_obs=oc.ba_chain_min_cost_per_obs,
    )

    def _opt(_):
        R_o, t_o, X_o, _ = ba_ops.bundle_adjust_robust(
            prob_train, iterations=iterations,
            huber_px=oc.ba_huber_px, gate2_px=oc.ba_gate_px,
            point_prior_weight=oc.ba_point_prior_weight,
            odo_trans_sigma=oc.ba_odom_trans_sigma,
            odo_rot_sigma=oc.ba_odom_rot_sigma,
            rtol=oc.ba_converge_rtol,
        )
        acc = ba_ops.ba_accept_window(
            prob_train, R_o, t_o, X_o, huber_px=oc.ba_huber_px,
            min_cost_per_obs=oc.ba_chain_min_cost_per_obs,
        )
        if prob_val is not None:
            n_val = jnp.sum(
                prob_val.obs_valid
                & prob_val.pose_valid[:, None]
                & prob_val.point_valid[None, :]
            )
            c_before = ba_ops.window_cost(
                prob_val, prob.R, prob.t, prob.X, huber_px=oc.ba_huber_px
            )
            c_after = ba_ops.window_cost(
                prob_val, R_o, t_o, X_o, huber_px=oc.ba_huber_px
            )
            acc = acc & ((n_val < 32) | (c_after < c_before))
        return R_o, t_o, X_o, acc

    def _noop(_):
        return prob.R, prob.t, prob.X, jnp.asarray(False)

    return jax.lax.cond(sig, _opt, _noop, None)


_ba_gated_solve_jit = jax.jit(
    _ba_gated_solve, static_argnames=("config", "iterations")
)


def run_windowed_ba(result: RunResult, config: SlamConfig, window: Optional[int] = None):
    """Post-hoc bundle adjustment over the keyframe chain (activates the
    reference's disabled local BA capability, C27: `Optimizer.cpp:187-599`,
    call site `Slam.cpp:699-725`).

    By default this solves the SAME whole-chain global problem as the
    fused backend (`_backend_pass`) — the sequential reference
    implementation it is tested against. Pass `window=k` for an explicit
    trailing-k-keyframe local window (the reference's local-BA shape).

    Observations are rebuilt by projecting map points into each
    keyframe and radius-matching descriptors (the same association the
    tracker uses). The refined keyframe poses are applied back to the
    trajectory via the interpolation pass, gated by BA_MAX_JUMP
    (`Config.h:100`).
    """
    import jax.numpy as jnp

    from vslam_tpu.ops import ba as ba_ops
    from vslam_tpu.ops import camera as cam
    from vslam_tpu.ops import matching, pgo

    st = result.final_state
    kfs = st.keyframes
    oc = config.opt
    c = config.camera

    kf_valid = np.asarray(kfs.valid)
    valid_slots = np.nonzero(kf_valid)[0]
    if len(valid_slots) < 3:
        return result
    iterations = oc.max_iterations
    if window is None:
        # Whole chain, mirroring _backend_pass exactly (same slot order
        # incl. invalid padding, same P, same iterations) so the fused
        # and sequential paths agree to float noise.
        # int32 max, NOT int64: np.where casts the scalar to frame_id's
        # int32 dtype, and an int64 max silently wraps to -1 — invalid
        # slots would sort FIRST and steal the gauge root.
        big = np.iinfo(np.int32).max
        order = np.argsort(
            np.where(kf_valid, np.asarray(kfs.frame_id), big)
        )
        slots = jnp.asarray(order.astype(np.int32))
        P = oc.ba_global_max_points
        iterations = oc.ba_global_iterations
    else:
        # last `window` valid keyframes by frame id
        order = np.argsort(np.asarray(kfs.frame_id)[valid_slots])
        slots = jnp.asarray(valid_slots[order][-window:])
        P = oc.ba_max_points
    if int(np.asarray(st.map.valid).sum()) < 16:
        return result

    X, uv, mask, cand = _build_ba_obs(st.map, kfs, slots, config, P)
    pose_ok = kfs.valid[slots]
    mask = mask & pose_ok[:, None]

    prob = ba_ops.BAProblem(
        R=kfs.R[slots],
        t=kfs.t[slots],
        pose_valid=pose_ok,
        X=X,
        point_valid=jnp.sum(mask, axis=0) >= 2,
        uv=uv,
        obs_valid=mask,
        fx=jnp.asarray(c.fx), fy=jnp.asarray(c.fy),
        cx=jnp.asarray(c.cx), cy=jnp.asarray(c.cy),
    )
    # Shared gate chain (significance pre-gate + accept + holdout
    # validation) — ONE implementation with the fused backend
    # (`_ba_gated_solve`), so the two paths stay equivalent by
    # construction. One device program, one result fetch.
    R_opt, t_opt, X_opt, accept = _ba_gated_solve_jit(
        prob, config, iterations
    )
    R_opt = jnp.where(accept, R_opt, prob.R)
    t_opt = jnp.where(accept, t_opt, prob.t)
    X_opt = jnp.where(accept, X_opt, prob.X)

    # Invalid padding rows must never write back to the ring.
    slots_wb = jnp.where(pose_ok, slots, kfs.R.shape[0])
    R_new, t_new, t_corr, t_corr_s, pos_new = _ba_finish(
        kfs, st.map.pos, slots_wb, prob.t, R_opt, t_opt, X_opt, cand,
        prob.point_valid, jnp.asarray(result.R), jnp.asarray(result.t),
        jnp.asarray(result.t_smoothed), oc.ba_max_jump,
    )

    return RunResult(
        timestamps=result.timestamps,
        R=result.R,
        t=np.asarray(t_corr),
        t_smoothed=np.asarray(t_corr_s),
        outputs=result.outputs,
        final_state=st._replace(
            map=st.map._replace(pos=pos_new),
            keyframes=kfs._replace(R=R_new, t=t_new),
        ),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _backend_pass(st, res_R, res_t, res_t_smoothed, gravity_opt, initial_height, config):
    """PGO + whole-chain global BA fused into ONE device program.

    The separate `run_posthoc_pgo` / `run_windowed_ba` passes each cost
    ~100 ms on the axon relay — almost entirely dispatch round trips and
    host readbacks for slot selection / validity counts (the compute is
    ~10-40 ms). Fusing the chain and moving every decision device-side
    (lax.cond guards, argsort slot selection) leaves one dispatch and one
    result fetch for the whole backend.
    """
    import jax.numpy as jnp

    from vslam_tpu.ops import ba as ba_ops
    from vslam_tpu.ops import pgo as pgo_ops

    kfs = st.keyframes
    oc = config.opt
    n_kf = jnp.sum(kfs.valid)

    # ---- PGO (guarded: needs >= 2 keyframes) ----
    def pgo_branch(_):
        return _pgo_pass(
            st, res_R, res_t, res_t_smoothed, gravity_opt, initial_height,
            config,
        )

    def pgo_skip(_):
        return kfs.R, kfs.t, res_t, res_t_smoothed, st.map.pos

    R1, t1, t_corr, t_corr_s, pos1 = jax.lax.cond(
        n_kf >= 2, pgo_branch, pgo_skip, None
    )
    kfs1 = kfs._replace(R=R1, t=t1)
    st1 = st._replace(keyframes=kfs1, map=st.map._replace(pos=pos1))

    # ---- Whole-chain GLOBAL BA ----
    # A single trailing window cannot correct accumulated drift; the
    # reference's (disabled) local BA ran per new keyframe and so
    # covered the chain incrementally (`src/Slam.cpp:699-725`). Here the
    # ENTIRE keyframe ring is one masked Schur problem — the pose block
    # is only (KFC*6)^2, trivial on the MXU, and one joint solve both
    # converges further and costs far less than a window sweep (probe:
    # random-walk chain drift 0.148 m -> 0.018 global vs 0.038 swept).
    # The metric point prior (ba_point_prior_weight) anchors scale and
    # stops points chasing drifted poses; the whole pass stays
    # gain-gated + per-KF jump-gated so it never hurts.
    KFC = kfs1.R.shape[0]
    big = jnp.iinfo(jnp.int32).max
    # Valid keyframes by frame id, OLDEST FIRST, invalid padding at the
    # END — bundle_adjust gauge-fixes the first pose, which must be a
    # real keyframe.
    order = jnp.argsort(
        jnp.where(kfs1.valid, kfs1.frame_id, big)
    ).astype(jnp.int32)
    n_valid = jnp.sum(kfs1.valid)
    can_ba = (
        (n_valid >= 3)
        & (jnp.sum(st1.map.valid) >= 16)
        & config.opt.enable_local_ba
    )

    def ba_branch(_):
        pose_ok = kfs1.valid[order]
        X, uv, mask, cand = _build_ba_obs(
            st1.map, kfs1, order, config, oc.ba_global_max_points
        )
        mask = mask & pose_ok[:, None]
        prob = ba_ops.BAProblem(
            R=kfs1.R[order],
            t=kfs1.t[order],
            pose_valid=pose_ok,
            X=X,
            point_valid=jnp.sum(mask, axis=0) >= 2,
            uv=uv,
            obs_valid=mask,
            fx=jnp.asarray(config.camera.fx),
            fy=jnp.asarray(config.camera.fy),
            cx=jnp.asarray(config.camera.cx),
            cy=jnp.asarray(config.camera.cy),
        )
        # Shared gate chain: significance pre-gate (skip the LM solve
        # when it cannot be accepted), accept gate, and the holdout
        # validation gate — one implementation with the sequential path
        # (`_ba_gated_solve`).
        R_opt, t_opt, X_opt, accept = _ba_gated_solve(
            prob, config, oc.ba_global_iterations
        )
        # Per-KF jump gate (Config.h:100) + padding guard.
        jump = jnp.linalg.norm(t_opt - prob.t, axis=-1)
        ok_vec = accept & pose_ok & (jump < oc.ba_max_jump)
        dest = jnp.where(ok_vec, order, KFC)
        R2 = kfs1.R.at[dest].set(R_opt, mode="drop")
        t2 = kfs1.t.at[dest].set(t_opt, mode="drop")
        pdest = jnp.where(accept & prob.point_valid, cand, st1.map.pos.shape[0])
        pos2 = st1.map.pos.at[pdest].set(X_opt, mode="drop")
        # Trajectory-correction passes vs the pre-BA keyframe poses.
        frame_ids = jnp.arange(res_t.shape[0], dtype=jnp.float32)
        _, t_corr2 = pgo_ops.correct_trajectory(
            frame_ids, res_R, t_corr, kfs1.frame_id, kfs1.valid,
            kfs1.R, kfs1.t, R2, t2,
        )
        _, t_corr2_s = pgo_ops.correct_trajectory(
            frame_ids, res_R, t_corr_s, kfs1.frame_id, kfs1.valid,
            kfs1.R, kfs1.t, R2, t2,
        )
        return R2, t2, t_corr2, t_corr2_s, pos2

    def ba_skip(_):
        return kfs1.R, kfs1.t, t_corr, t_corr_s, st1.map.pos

    R2, t2, t_corr2, t_corr2_s, pos2 = jax.lax.cond(
        can_ba, ba_branch, ba_skip, None
    )
    return R2, t2, t_corr2, t_corr2_s, pos2


def run_backend(result: RunResult, config: SlamConfig, gravity=None,
                initial_height=0.0):
    """Post-hoc PGO + windowed BA as one fused device program (see
    `_backend_pass`); equivalent to
    `run_windowed_ba(run_posthoc_pgo(result, config), config)` up to
    float noise, minus ~10 relay round trips."""
    st = result.final_state
    R2, t2, t_corr, t_corr_s, pos2 = _backend_pass(
        st, jnp.asarray(result.R), jnp.asarray(result.t),
        jnp.asarray(result.t_smoothed),
        None if gravity is None else jnp.asarray(gravity, jnp.float32),
        jnp.asarray(initial_height, jnp.float32),
        config,
    )
    R2, t2, t_corr, t_corr_s, pos2 = jax.device_get(
        (R2, t2, t_corr, t_corr_s, pos2)
    )
    return RunResult(
        timestamps=result.timestamps,
        R=result.R,
        t=np.asarray(t_corr),
        t_smoothed=np.asarray(t_corr_s),
        outputs=result.outputs,
        final_state=st._replace(
            map=st.map._replace(pos=jnp.asarray(pos2)),
            keyframes=st.keyframes._replace(R=jnp.asarray(R2), t=jnp.asarray(t2)),
        ),
    )


def run_synthetic(seq, config: SlamConfig, use_imu=True, seed: int = 42,
                  smooth=True, chunk=None):
    """End-to-end on a synthetic sequence: gravity init + stationarity +
    tracking + smoothing. Returns (RunResult, ate_result)."""
    from vslam_tpu.eval import ate as ate_mod

    R0 = seq.R[0]
    gravity, h0 = (None, 0.0)
    stationary = None
    if use_imu:
        gravity, h0 = compute_gravity_direction(seq.accel, np.eye(3, dtype=np.float32))
        stationary = detect_stationary(seq.accel, seq.timestamps)

    frames = features_from_synthetic(seq, stationary=stationary)
    result = run_tracking(
        frames, config, gravity=gravity, initial_height=h0, seed=seed,
        smooth=smooth, chunk=chunk,
    )

    # World frame == first camera frame in synthetic sequences, but the
    # sequence's own poses are already in that frame; ATE aligns anyway.
    ate_res = ate_mod.compute_ate(
        result.timestamps, result.t_smoothed, seq.timestamps, seq.t, with_scale=False
    )
    return result, ate_res
