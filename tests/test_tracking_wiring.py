"""Behavior tests for periodic global PnP, reprojection culling, and the
two-view scale chain (reference `src/Slam.cpp:1477-1522`, `:473-500`,
`:73-157`)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core import pipeline, tracking
from vslam_tpu.core.state import init_state
from vslam_tpu.data import synthetic

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def _make_world_frame(cfg, n_pts=48, offset=0.0, seed=0):
    """A camera at identity observing n_pts random points; returns
    (map_pos, frame_xy, mp_idx, kp_ok) with exact correspondences."""
    rng = np.random.default_rng(seed)
    c = cfg.camera
    K = cfg.frontend.max_keypoints
    M = cfg.map.map_capacity
    pts_c = np.stack(
        [
            rng.uniform(-1.0, 1.0, n_pts),
            rng.uniform(-0.8, 0.8, n_pts),
            rng.uniform(2.0, 5.0, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    u = c.fx * pts_c[:, 0] / pts_c[:, 2] + c.cx
    v = c.fy * pts_c[:, 1] / pts_c[:, 2] + c.cy
    xy = np.zeros((K, 2), np.float32)
    xy[:n_pts] = np.stack([u, v], -1)
    map_pos = np.zeros((M, 3), np.float32)
    map_pos[:n_pts] = pts_c  # camera at identity -> world == camera frame
    mp_idx = np.full(K, -1, np.int32)
    mp_idx[:n_pts] = np.arange(n_pts)
    kp_ok = np.zeros(K, bool)
    kp_ok[:n_pts] = True
    return map_pos, xy, mp_idx, kp_ok, n_pts


def _frame(cfg, xy, ts=1.0):
    from vslam_tpu.core.state import FrameFeatures

    K = cfg.frontend.max_keypoints
    D = cfg.frontend.descriptor_dim
    return FrameFeatures(
        xy=jnp.asarray(xy),
        desc=jnp.zeros((K, D), jnp.float32),
        depth=jnp.zeros(K, jnp.float32),
        valid=jnp.asarray(xy[:, 0] > 0),
        timestamp=jnp.asarray(ts, jnp.float32),
        stationary=jnp.asarray(False),
        frame_id=jnp.asarray(1, jnp.int32),
    )


def test_periodic_pnp_yanks_drifted_pose():
    """A fresh RANSAC-PnP from this frame's map associations must pull a
    drifted pose back by PNP_PERIODIC_BLEND (`Slam.cpp:1477-1522`)."""
    cfg = tiny_test_config()
    map_pos, xy, mp_idx, kp_ok, n = _make_world_frame(cfg)
    st = init_state(cfg)
    st = st._replace(
        map=st.map._replace(
            pos=jnp.asarray(map_pos),
            valid=jnp.asarray(np.arange(cfg.map.map_capacity) < n),
        )
    )
    frame = _frame(cfg, xy)
    # True pose is identity; drift the estimate by 0.3 m.
    R_drift = jnp.eye(3, dtype=jnp.float32)
    t_drift = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
    R_out, t_out = jax.jit(
        lambda: tracking._periodic_pnp(
            st, frame, cfg, R_drift, t_drift,
            jnp.asarray(mp_idx), jnp.asarray(kp_ok), jax.random.PRNGKey(0),
        )
    )()
    # blend 0.5 toward the true pose (origin): expect ~half the drift gone
    resid = float(jnp.linalg.norm(t_out))
    assert resid < 0.3 * 0.6, f"periodic PnP did not pull pose back: {resid}"

    # Jump gate: with an impossible gate the pose must be left alone.
    cfg_gate = dataclasses.replace(
        cfg, pnp=dataclasses.replace(cfg.pnp, periodic_max_jump=1e-6)
    )
    R2, t2 = jax.jit(
        lambda: tracking._periodic_pnp(
            st, frame, cfg_gate, R_drift, t_drift,
            jnp.asarray(mp_idx), jnp.asarray(kp_ok), jax.random.PRNGKey(0),
        )
    )()
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_drift), atol=1e-7)


def test_reprojection_cull_removes_bad_points():
    """Observed points reprojecting >CULL_REPROJ_PX away (or behind the
    camera) are invalidated; consistent points survive (`Slam.cpp:473-500`)."""
    cfg = tiny_test_config()
    map_pos, xy, mp_idx, kp_ok, n = _make_world_frame(cfg)
    # Corrupt points 0..9: move them 1 m sideways -> large reprojection err.
    map_pos = map_pos.copy()
    map_pos[:10, 0] += 1.0
    # Point 10: behind the camera.
    map_pos[10] = [0.0, 0.0, -1.0]
    st_map = init_state(cfg).map._replace(
        pos=jnp.asarray(map_pos),
        valid=jnp.asarray(np.arange(cfg.map.map_capacity) < n),
    )
    frame = _frame(cfg, xy)
    out = jax.jit(
        lambda: tracking._reproject_cull(
            st_map, frame, cfg, jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.asarray(mp_idx), jnp.asarray(kp_ok),
        )
    )()
    valid = np.asarray(out.valid)
    assert not valid[:11].any(), "bad-geometry points must be culled"
    assert valid[11:n].all(), "consistent points must survive"


def test_periodic_pnp_reduces_drift_ate():
    """Pipeline-level: perturb the tracking state mid-run (simulated
    accumulated drift), disable per-frame refinement, and check that
    periodic PnP measurably reduces final ATE vs. never running it."""
    from vslam_tpu.eval import ate as ate_mod

    cfg = tiny_test_config()
    c = cfg.camera
    # Noiseless observations: natural odometry drift ~0, so the injected
    # offset is the ONLY error source and the comparison is clean.
    seq = synthetic.make_sequence(
        num_frames=30, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=3, num_landmarks=1500,
        pixel_noise=0.0, desc_noise=0.01, depth_noise=0.0,
    )
    frames = pipeline.features_from_synthetic(seq)
    split = 12
    head = jax.tree.map(lambda x: x[:split], frames)
    tail = jax.tree.map(lambda x: x[split:], frames)

    def run_tail(interval):
        cfg_i = dataclasses.replace(
            cfg,
            pnp=dataclasses.replace(
                cfg.pnp, interval=interval, refine_max_jump=0.0
            ),
            # force frequent keyframes so periodic PnP gets chances to fire
            map=dataclasses.replace(cfg.map, kf_min_frame_gap=2, kf_min_matches=10),
        )
        r_head = pipeline.run_tracking(head, cfg_i, smooth=False)
        st = r_head.final_state
        # Inject 0.18 m of accumulated drift into every pose-carrying field
        # (current, active KF, EKF) — the map keeps its good positions.
        delta = jnp.asarray([0.18, 0.0, 0.0], jnp.float32)
        st = st._replace(
            t=st.t + delta,
            kf_t=st.kf_t + delta,
            prev_t=st.prev_t + delta,
            ekf=st.ekf._replace(x=st.ekf.x.at[:3].add(delta)),
        )
        r_tail = pipeline.run_tracking(tail, cfg_i, state=st, smooth=False)
        # UNALIGNED error (Umeyama would absorb the constant injected
        # offset): the estimate frame is the first camera frame, the
        # synthetic gt frame differs by the known R0/t0 — apply it.
        est_w = r_tail.t @ seq.R[0].T + seq.t[0]
        return float(np.linalg.norm(est_w - seq.t[split:], axis=-1).mean())

    err_with = run_tail(interval=1)
    err_without = run_tail(interval=10**6)
    assert err_with < err_without - 0.03, (err_with, err_without)


def test_mono_two_view_scale_recovers_metric_path():
    """Mono mode with valid depth at both views: the two-view scale chain
    (`Slam.cpp:73-157`) keeps per-step displacements metric — total path
    length must match ground truth closely."""
    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, rgbd=False)
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=24, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=0, num_landmarks=1500,
    )
    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
    assert int(np.asarray(result.outputs.used_3d3d).sum()) == 0
    est_len = float(np.linalg.norm(np.diff(result.t, axis=0), axis=-1).sum())
    gt_len = float(np.linalg.norm(np.diff(seq.t, axis=0), axis=-1).sum())
    assert 0.7 * gt_len < est_len < 1.3 * gt_len, (est_len, gt_len)
    assert ate_res.rmse < 0.15, ate_res


def test_kf_full_refine_returns_unblended_pose():
    """`_refine_pnp` returns both the reference's blended pose (output
    trajectory, `src/Slam.cpp:1373-1473`) and the fully-applied one used
    for keyframe registration (PnPConfig.kf_refine_full): with exact
    correspondences and a drifted initial pose, the blended result keeps
    ~(1-blend) of the drift while the full result removes ~all of it."""
    cfg = tiny_test_config()
    map_pos, xy, mp_idx, kp_ok, n = _make_world_frame(cfg)
    st = init_state(cfg)
    st = st._replace(
        map=st.map._replace(
            pos=jnp.asarray(map_pos),
            valid=jnp.asarray(np.arange(cfg.map.map_capacity) < n),
        )
    )
    frame = _frame(cfg, xy)
    R_drift = jnp.eye(3, dtype=jnp.float32)
    t_drift = jnp.asarray([0.08, 0.0, 0.0], jnp.float32)
    R_out, t_out, n_pnp, R_full, t_full = jax.jit(
        lambda: tracking._refine_pnp(
            st, frame, cfg, R_drift, t_drift,
            jnp.asarray(mp_idx), jnp.asarray(kp_ok), jax.random.PRNGKey(0),
        )
    )()
    assert int(n_pnp) >= n // 2
    d_blend = float(jnp.linalg.norm(t_out))
    d_full = float(jnp.linalg.norm(t_full))
    # Full application converges to the true pose (identity).
    assert d_full < 0.01, f"full refine left {d_full} m of drift"
    # Blended keeps 50-70% of the drift (adaptive blend 0.3-0.5).
    assert 0.3 * 0.08 < d_blend < 0.8 * 0.08, f"blend removed {d_blend}"
    # Gates: when the refine is rejected, full == blended == input.
    cfg_gate = dataclasses.replace(
        cfg, pnp=dataclasses.replace(cfg.pnp, refine_max_jump=1e-9)
    )
    _, t_b2, _, _, t_f2 = jax.jit(
        lambda: tracking._refine_pnp(
            st, frame, cfg_gate, R_drift, t_drift,
            jnp.asarray(mp_idx), jnp.asarray(kp_ok), jax.random.PRNGKey(0),
        )
    )()
    np.testing.assert_allclose(np.asarray(t_f2), np.asarray(t_drift), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t_b2), np.asarray(t_drift), atol=1e-7)


def test_ekf_scale_prior_gates_bad_mono_scale():
    """`_scale_with_ekf_prior` (MotionConfig.mono_scale_ekf_prior, NEW vs
    the reference chain): a fresh scale deviating >gate from the EKF's
    predicted distance-from-keyframe is replaced by the prediction; an
    agreeing one is averaged with it; an invalid prediction passes the
    fresh estimate through."""
    cfg = tiny_test_config()
    mc = cfg.motion
    st = init_state(cfg)
    # EKF at x=(1,0,0), v=(0.5,0,0); KF anchor at origin; dt=0.2
    # -> predicted distance from KF = 1.1
    st = st._replace(
        ekf=st.ekf._replace(
            x=jnp.asarray([1.0, 0.0, 0.0, 0.5, 0.0, 0.0], jnp.float32)
        ),
        kf_t=jnp.zeros(3, jnp.float32),
        last_time=jnp.asarray(1.0, jnp.float32),
        tracking_ok=jnp.asarray(True),
    )
    frame = _frame(cfg, np.zeros((cfg.frontend.max_keypoints, 2), np.float32),
                   ts=1.2)
    s_pred = 1.1
    # Wildly-off fresh scale (the measured small-baseline failure mode).
    s_bad = jnp.asarray(1.5 * s_pred, jnp.float32)
    out = tracking._scale_with_ekf_prior(s_bad, st, frame, mc)
    np.testing.assert_allclose(float(out), s_pred, rtol=1e-5)
    # Agreeing fresh scale: averaged.
    s_good = jnp.asarray(1.05 * s_pred, jnp.float32)
    out2 = tracking._scale_with_ekf_prior(s_good, st, frame, mc)
    np.testing.assert_allclose(float(out2), 1.025 * s_pred, rtol=1e-5)
    # Lost tracking invalidates the prediction: fresh estimate unchanged.
    st_lost = st._replace(tracking_ok=jnp.asarray(False))
    out3 = tracking._scale_with_ekf_prior(s_bad, st_lost, frame, mc)
    np.testing.assert_allclose(float(out3), float(s_bad), rtol=1e-6)
