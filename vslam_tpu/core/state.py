"""SLAM state pytrees: fixed-capacity, masked, scan-friendly.

The reference's mutable object graph (`Map` of `Frame*`/`MapPoint*`
vectors under a mutex, `/root/reference/include/Map.h:10-42`,
`include/MapPoint.h:20-35`, keyframe flags on frames) becomes a single
immutable `TrackState` pytree advanced by a jitted step function. Dynamic
growth (map points, keyframes) is replaced by capacity + validity masks;
"pointers" (observations, kp->map-point links) are int32 index arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vslam_tpu.config import SlamConfig
from vslam_tpu.ops.ekf import EKFState


class FrameFeatures(NamedTuple):
    """Per-frame inputs to the tracking step (the analogue of the
    reference's `Frame` after `detect_features` + `load_depth_image`)."""

    xy: jnp.ndarray  # (K, 2) keypoint pixels
    desc: jnp.ndarray  # (K, D) unit descriptors
    depth: jnp.ndarray  # (K,) sensor depth at keypoint, 0 = invalid
    valid: jnp.ndarray  # (K,) detection mask
    timestamp: jnp.ndarray  # () f32
    stationary: jnp.ndarray  # () bool — precomputed IMU stationarity
    frame_id: jnp.ndarray  # () int32


class KeyframeStore(NamedTuple):
    """Keyframe ring buffer (capacity KFC) for loop closure + PGO."""

    xy: jnp.ndarray  # (KFC, K, 2)
    desc: jnp.ndarray  # (KFC, K, D)
    depth: jnp.ndarray  # (KFC, K)
    kp_valid: jnp.ndarray  # (KFC, K)
    R: jnp.ndarray  # (KFC, 3, 3) camera-to-world
    t: jnp.ndarray  # (KFC, 3)
    # TRACKED pose at registration — the pose the surrounding frames were
    # estimated against. Set once per keyframe and never touched by
    # PGO/BA (in-run or post-hoc), so the final trajectory correction
    # (`pgo.correct_trajectory`) can apply the CUMULATIVE per-keyframe
    # delta (anchor -> final optimized pose) to the raw per-frame
    # outputs even after mid-run corrections moved the ring. When no
    # in-run optimization fired, anchor == ring pose and the correction
    # reduces to the reference's single post-hoc delta
    # (`Optimizer.cpp:795-827`).
    R_anchor: jnp.ndarray  # (KFC, 3, 3)
    t_anchor: jnp.ndarray  # (KFC, 3)
    frame_id: jnp.ndarray  # (KFC,) int32 source frame index
    valid: jnp.ndarray  # (KFC,) slot occupied


class MapStore(NamedTuple):
    """Fixed-capacity map points (replaces `MapPoint` vector).

    visible/found counters implement the ORB-SLAM3-style culling policy
    (`include/MapPoint.h:28-35`, `src/Slam.cpp:1089-1126`).
    """

    pos: jnp.ndarray  # (M, 3)
    desc: jnp.ndarray  # (M, D)
    valid: jnp.ndarray  # (M,)
    visible: jnp.ndarray  # (M,) int32 — times predicted visible
    found: jnp.ndarray  # (M,) int32 — times actually matched
    first_kf: jnp.ndarray  # (M,) int32 — keyframe index at creation
    num_obs: jnp.ndarray  # (M,) int32 — observation count


class LoopConstraints(NamedTuple):
    """Accumulated loop-closure constraints for PGO
    (`src/Slam.cpp:790-797` LoopConstraint)."""

    kf_from: jnp.ndarray  # (L,) int32 keyframe slot
    kf_to: jnp.ndarray  # (L,) int32
    # Source frame ids of the endpoints at constraint creation — used to
    # invalidate constraints whose ring slot has since been overwritten.
    from_id: jnp.ndarray  # (L,) int32
    to_id: jnp.ndarray  # (L,) int32
    R_rel: jnp.ndarray  # (L, 3, 3)
    t_rel: jnp.ndarray  # (L, 3)
    valid: jnp.ndarray  # (L,)


class TrackState(NamedTuple):
    """Full tracking state threaded through `lax.scan`."""

    # Current pose (camera-to-world)
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)

    ekf: EKFState

    # Active (latest) keyframe, duplicated out of the ring for fast access
    kf_xy: jnp.ndarray  # (K, 2)
    kf_desc: jnp.ndarray  # (K, D)
    kf_depth: jnp.ndarray  # (K,)
    kf_valid: jnp.ndarray  # (K,)
    kf_R: jnp.ndarray  # (3, 3)
    kf_t: jnp.ndarray  # (3,)
    kf_frame_id: jnp.ndarray  # () int32

    # Previous frame (for bridge-keyframe promotion, `src/Slam.cpp:847-872`)
    prev_xy: jnp.ndarray  # (K, 2)
    prev_desc: jnp.ndarray  # (K, D) bf16
    prev_depth: jnp.ndarray  # (K,)
    prev_valid: jnp.ndarray  # (K,)
    prev_R: jnp.ndarray  # (3, 3)
    prev_t: jnp.ndarray  # (3,)
    prev_frame_id: jnp.ndarray  # () int32 (-1 = none)

    keyframes: KeyframeStore
    map: MapStore
    loops: LoopConstraints

    frame_idx: jnp.ndarray  # () int32 processed-frame counter
    kf_count: jnp.ndarray  # () int32
    last_time: jnp.ndarray  # () f32
    last_scale: jnp.ndarray  # () f32 — mono scale memory
    recovery_cooldown: jnp.ndarray  # () int32
    tracking_ok: jnp.ndarray  # () bool
    was_stationary: jnp.ndarray  # () bool — previous frame stationary

    # Gravity / height prior (`src/Slam.cpp:1587-1616`)
    gravity: jnp.ndarray  # (3,)
    initial_height: jnp.ndarray  # ()
    has_height: jnp.ndarray  # () bool

    # IN-RUN loop-correction events actually folded back into the live
    # state (`pipeline.inrun_pgo_correct` correction-size gate) — bench
    # attribution counter.
    inrun_corrections: jnp.ndarray = None  # () int32


class StepOutputs(NamedTuple):
    """Per-frame scan outputs (poses, EKF snapshots, diagnostics)."""

    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    timestamp: jnp.ndarray
    # EKF snapshot for RTS
    x_pred: jnp.ndarray
    P_pred: jnp.ndarray
    x_filt: jnp.ndarray
    P_filt: jnp.ndarray
    dt: jnp.ndarray
    # Diagnostics (the reference HUD counters, `src/main.cpp:1220-1260`)
    num_matches: jnp.ndarray
    num_inliers: jnp.ndarray
    num_tracked: jnp.ndarray
    is_keyframe: jnp.ndarray
    used_3d3d: jnp.ndarray
    tracking_ok: jnp.ndarray
    # Mean symmetric epipolar error of KF matches before/after the
    # fundamental gate (`src/Slam.cpp:889-904`; 0 when the gate is off or
    # found no model).
    epi_before: jnp.ndarray
    epi_after: jnp.ndarray
    # Branch-execution flags (workload honesty for the bench: how often
    # the rare expensive paths actually fired).
    bridged: jnp.ndarray
    recovered: jnp.ndarray
    # KF matches with valid depth at BOTH views — the 3D-3D path's
    # support set (diagnoses essential-fallback frames: did 3D-3D starve
    # for points or fail its gates?).
    num_depth_ok: jnp.ndarray


def init_state(config: SlamConfig, R0=None, t0=None, gravity=None, initial_height=0.0) -> TrackState:
    """Initial state (reference `Slam::set_initial_pose` +
    `compute_gravity_direction`, `src/Slam.cpp:1580-1616`)."""
    K = config.frontend.max_keypoints
    D = config.frontend.descriptor_dim
    M = config.map.map_capacity
    KFC = config.map.keyframe_capacity
    L = config.opt.max_loop_constraints
    f32 = jnp.float32
    # Descriptors are stored bf16: they only feed relative-comparison
    # matmuls (ratio/threshold tests), and halving the carried map +
    # keyframe-ring bytes cuts per-frame HBM traffic in the scan.
    fdesc = jnp.bfloat16

    if R0 is None:
        R0 = jnp.eye(3, dtype=f32)
    if t0 is None:
        t0 = jnp.zeros(3, dtype=f32)
    has_g = gravity is not None
    if gravity is None:
        gravity = jnp.zeros(3, dtype=f32)

    return TrackState(
        R=jnp.asarray(R0, f32),
        t=jnp.asarray(t0, f32),
        ekf=EKFState(
            x=jnp.zeros(6, f32),
            P=jnp.eye(6, dtype=f32),
            initialized=jnp.asarray(False),
            last_time=jnp.asarray(0.0, f32),
        ),
        kf_xy=jnp.zeros((K, 2), f32),
        kf_desc=jnp.zeros((K, D), fdesc),
        kf_depth=jnp.zeros(K, f32),
        kf_valid=jnp.zeros(K, bool),
        kf_R=jnp.asarray(R0, f32),
        kf_t=jnp.asarray(t0, f32),
        kf_frame_id=jnp.asarray(-1, jnp.int32),
        prev_xy=jnp.zeros((K, 2), f32),
        prev_desc=jnp.zeros((K, D), fdesc),
        prev_depth=jnp.zeros(K, f32),
        prev_valid=jnp.zeros(K, bool),
        prev_R=jnp.asarray(R0, f32),
        prev_t=jnp.asarray(t0, f32),
        prev_frame_id=jnp.asarray(-1, jnp.int32),
        keyframes=KeyframeStore(
            xy=jnp.zeros((KFC, K, 2), f32),
            desc=jnp.zeros((KFC, K, D), fdesc),
            depth=jnp.zeros((KFC, K), f32),
            kp_valid=jnp.zeros((KFC, K), bool),
            R=jnp.tile(jnp.eye(3, dtype=f32), (KFC, 1, 1)),
            t=jnp.zeros((KFC, 3), f32),
            R_anchor=jnp.tile(jnp.eye(3, dtype=f32), (KFC, 1, 1)),
            t_anchor=jnp.zeros((KFC, 3), f32),
            frame_id=jnp.full(KFC, -1, jnp.int32),
            valid=jnp.zeros(KFC, bool),
        ),
        map=MapStore(
            pos=jnp.zeros((M, 3), f32),
            desc=jnp.zeros((M, D), fdesc),
            valid=jnp.zeros(M, bool),
            visible=jnp.zeros(M, jnp.int32),
            found=jnp.zeros(M, jnp.int32),
            first_kf=jnp.zeros(M, jnp.int32),
            num_obs=jnp.zeros(M, jnp.int32),
        ),
        loops=LoopConstraints(
            kf_from=jnp.full(L, -1, jnp.int32),
            kf_to=jnp.full(L, -1, jnp.int32),
            from_id=jnp.full(L, -1, jnp.int32),
            to_id=jnp.full(L, -1, jnp.int32),
            R_rel=jnp.tile(jnp.eye(3, dtype=f32), (L, 1, 1)),
            t_rel=jnp.zeros((L, 3), f32),
            valid=jnp.zeros(L, bool),
        ),
        frame_idx=jnp.asarray(0, jnp.int32),
        kf_count=jnp.asarray(0, jnp.int32),
        last_time=jnp.asarray(0.0, f32),
        last_scale=jnp.asarray(config.motion.motion_scale, f32),
        recovery_cooldown=jnp.asarray(0, jnp.int32),
        tracking_ok=jnp.asarray(True),
        was_stationary=jnp.asarray(False),
        gravity=jnp.asarray(gravity, f32),
        initial_height=jnp.asarray(initial_height, f32),
        has_height=jnp.asarray(has_g),
        inrun_corrections=jnp.asarray(0, jnp.int32),
    )
