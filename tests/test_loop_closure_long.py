"""Long-horizon loop closure at production gates (`src/Slam.cpp:730-798`,
`LoopCloser.cpp:16-100`): a ~520-frame circular revisit where only
`check_interval_kfs` is relaxed — the frame-gap (200), inlier (30),
stride (5) and jump gates all stay at reference values — and the
accumulated constraint must reduce post-PGO ATE on the drifted run."""

import dataclasses

import numpy as np

from vslam_tpu.config import (
    CameraConfig,
    FrontendConfig,
    LoopClosureConfig,
    MapConfig,
    MotionConfig,
    OptimizerConfig,
    PnPConfig,
    SlamConfig,
)
from vslam_tpu.core import pipeline
from vslam_tpu.data import synthetic
from vslam_tpu.eval import ate as ate_mod


def _loop_config():
    """Tiny shapes but a full-size keyframe ring (the 520-frame run makes
    ~100 keyframes; loop detection needs the old ones still resident)."""
    return SlamConfig(
        camera=CameraConfig(width=160, height=120, fx=120.0, fy=120.0,
                            cx=79.5, cy=59.5),
        frontend=FrontendConfig(max_keypoints=64, descriptor_dim=64),
        motion=MotionConfig(em_ransac_iters=32, fm_ransac_iters=32, r3d_iters=32),
        pnp=PnPConfig(ransac_iters=32),
        map=MapConfig(map_capacity=4096, keyframe_capacity=128),
        opt=OptimizerConfig(max_loop_constraints=16),
        # Production gates except the check interval (reference checks
        # every 200th keyframe, Config.h:93 — this run makes ~100).
        loop=dataclasses.replace(LoopClosureConfig(), check_interval_kfs=2),
    )


def _revisit_sequence(cfg, n_frames=520, seed=11):
    """Full circle: the camera returns to its start pose with the same
    heading, re-observing the start landmarks."""
    c = cfg.camera
    rng = np.random.default_rng(seed)
    world = synthetic.make_world(
        rng, num_landmarks=2500, desc_dim=cfg.frontend.descriptor_dim
    )
    dt = 0.1
    ts, R, t = synthetic.make_trajectory(
        n_frames, dt=dt, radius=2.5,
        angular_rate=2.0 * np.pi / (n_frames * dt),
    )
    obs = [
        synthetic.observe(
            world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width, c.height,
            max_keypoints=cfg.frontend.max_keypoints, rng=rng,
            # enough sensor noise that odometry actually drifts past the
            # loop accept gate's 1 cm minimum jump by the revisit
            pixel_noise=0.7, desc_noise=0.02, depth_noise=0.012,
        )
        for i in range(n_frames)
    ]
    seq = synthetic.SyntheticSequence(
        timestamps=ts,
        R=R,
        t=t,
        kp_xy=np.stack([o[0] for o in obs]),
        kp_desc=np.stack([o[1] for o in obs]),
        kp_depth=np.stack([o[2] for o in obs]),
        kp_valid=np.stack([o[3] for o in obs]),
        kp_landmark=np.stack([o[4] for o in obs]),
        accel=None,
        world=world,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
    )
    return seq


def test_loop_closure_fires_and_pgo_reduces_ate():
    cfg = _loop_config()
    seq = _revisit_sequence(cfg)
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=False, smooth=False)
    st = result.final_state

    outs = result.outputs
    assert float(np.asarray(outs.tracking_ok)[1:].mean()) > 0.8
    n_kf = int(np.asarray(st.kf_count))
    assert n_kf >= 20, f"expected many keyframes, got {n_kf}"

    loops_v = np.asarray(st.loops.valid)
    assert loops_v.sum() >= 1, "a genuine revisit must fire a loop constraint"
    # Constraint endpoints honor the production frame-gap gate.
    gaps = np.asarray(st.loops.to_id) - np.asarray(st.loops.from_id)
    assert (gaps[loops_v] >= cfg.loop.min_frame_gap).all(), gaps[loops_v]

    ate_pre = ate_mod.compute_ate(
        result.timestamps, result.t, seq.timestamps, seq.t, with_scale=False
    )
    r2 = pipeline.run_posthoc_pgo(result, cfg)
    ate_post = ate_mod.compute_ate(
        r2.timestamps, r2.t, seq.timestamps, seq.t, with_scale=False
    )

    # PGO must CLOSE THE LOOP GAP: unaligned error (known world-frame
    # transform) at the revisit end shrinks decisively. One loop edge
    # cannot repair mid-arc odometry shape error, so whole-trajectory
    # aligned RMSE is only required not to degrade.
    def unaligned_err(r):
        est_w = r.t @ seq.R[0].T + seq.t[0]
        return np.linalg.norm(est_w - seq.t, axis=-1)

    e_pre, e_post = unaligned_err(result), unaligned_err(r2)
    tail = slice(-20, None)
    assert e_post[tail].mean() < 0.6 * e_pre[tail].mean(), (
        e_pre[tail].mean(), e_post[tail].mean()
    )
    assert np.isfinite(ate_post.rmse)
    assert ate_post.rmse < ate_pre.rmse * 1.1, (ate_pre.rmse, ate_post.rmse)
