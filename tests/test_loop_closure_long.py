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

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


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

    # Constraint ACCURACY vs ground truth: the stored relative pose
    # (estimated old-KF pose -> PnP-verified revisit pose) must match the
    # GT relative pose to a few cm / ~1 deg — the constraint the reference
    # hands to g2o (`Slam.cpp:790-797`) is only useful if it is accurate.
    from vslam_tpu.ops import se3 as se3_ops

    for li in np.nonzero(loops_v)[0]:
        fid = int(np.asarray(st.loops.from_id)[li])
        tid = int(np.asarray(st.loops.to_id)[li])
        Rg, tg = se3_ops.relative(seq.R[fid], seq.t[fid], seq.R[tid], seq.t[tid])
        t_err = float(
            np.linalg.norm(np.asarray(st.loops.t_rel)[li] - np.asarray(tg))
        )
        R_err = float(
            np.linalg.norm(
                np.asarray(st.loops.R_rel)[li] @ np.asarray(Rg).T - np.eye(3)
            )
        )
        assert t_err < 0.12, (li, fid, tid, t_err)
        assert R_err < 0.06, (li, fid, tid, R_err)

    def unaligned_err(r):
        est_w = r.t @ seq.R[0].T + seq.t[0]
        return np.linalg.norm(est_w - seq.t, axis=-1)

    tail = slice(-20, None)

    # PGO must CLOSE THE LOOP GAP. The tracking core is accurate enough
    # on this workload that organic tail drift (~6 cm) sits at the
    # constraint's own accuracy floor, so gap-closing is exercised the
    # way a real loop closure encounters it: an accurate constraint
    # against a DRIFTED trajectory. Inject a smooth 0.5 m drift into the
    # estimated trajectory + keyframe ring (the constraint, map, and
    # odometry edge structure stay as tracked) and require PGO to pull
    # the revisit tail decisively back.
    n = len(result.t)
    prof = (np.arange(n, dtype=np.float32) / (n - 1)) ** 1.5
    ddir = np.asarray([0.6, -0.2, 0.3], np.float32)
    ddir /= np.linalg.norm(ddir)
    drift = 0.5 * prof[:, None] * ddir[None, :]
    kf_fid = np.asarray(st.keyframes.frame_id)
    kf_drift = (
        0.5 * np.clip(kf_fid / (n - 1), 0.0, 1.0)[:, None] ** 1.5 * ddir[None, :]
    ).astype(np.float32)

    drifted = dataclasses.replace(
        result,
        t=result.t + drift,
        t_smoothed=result.t_smoothed + drift,
        final_state=st._replace(
            # Drift the anchors too: "the tracker produced this drifted
            # trajectory" means the registration-time poses are drifted.
            keyframes=st.keyframes._replace(
                t=st.keyframes.t + kf_drift,
                t_anchor=st.keyframes.t_anchor + kf_drift,
            )
        ),
    )
    e_pre_d = unaligned_err(drifted)
    r2 = pipeline.run_posthoc_pgo(drifted, cfg)
    e_post_d = unaligned_err(r2)
    assert e_post_d[tail].mean() < 0.5 * e_pre_d[tail].mean(), (
        e_pre_d[tail].mean(), e_post_d[tail].mean()
    )

    # And on the UNDRIFTED run PGO must not degrade the trajectory.
    ate_pre = ate_mod.compute_ate(
        result.timestamps, result.t, seq.timestamps, seq.t, with_scale=False
    )
    r3 = pipeline.run_posthoc_pgo(result, cfg)
    ate_post = ate_mod.compute_ate(
        r3.timestamps, r3.t, seq.timestamps, seq.t, with_scale=False
    )
    assert np.isfinite(ate_post.rmse)
    # Gain gate: an accepted pass improves the constraint chi^2; a
    # rejected pass is the identity — never worse either way (0.1%
    # correction-interpolation wobble allowed).
    assert ate_post.rmse <= ate_pre.rmse * 1.001 + 1e-6, (
        ate_pre.rmse, ate_post.rmse
    )


def test_loop_cadence_at_production_interval():
    """The REAL 200-keyframe check cadence (`Config.h:93`, checked at
    `src/Slam.cpp:1084-1086`), with NO gate relaxed at all: a ~1060-frame
    run whose 64-kp frames keep matches below the proactive-KF threshold,
    so a keyframe lands every ~5 frames and the 200th keyframe arrives
    just after the camera completes a full circle. The single cadence
    firing must produce a loop constraint at exactly that keyframe's
    frame, and no constraint may exist before it."""
    cfg = SlamConfig(
        camera=CameraConfig(width=160, height=120, fx=120.0, fy=120.0,
                            cx=79.5, cy=59.5),
        frontend=FrontendConfig(max_keypoints=64, descriptor_dim=64),
        # The Essential VERIFY inside the loop check must run at full
        # RANSAC strength (the reference's findEssentialMat confidence is
        # 0.999, LoopCloser.cpp:70-87): at 32 hypotheses the >=30-inlier
        # gate becomes key-luck-dependent (observed 28 vs 37 across
        # seeds). fm/r3d stay reduced — they only shape the per-frame
        # motion path, not the gates under test.
        motion=MotionConfig(em_ransac_iters=256, fm_ransac_iters=32,
                            r3d_iters=32),
        pnp=PnPConfig(ransac_iters=64),
        map=MapConfig(map_capacity=16384, keyframe_capacity=256),
        opt=OptimizerConfig(max_loop_constraints=16),
        # Reference cadence pinned explicitly: the production default is
        # now a denser check interval (LoopClosureConfig docstring); this
        # test exercises the reference's exact every-200th-KF schedule.
        loop=LoopClosureConfig(check_interval_kfs=200),
    )
    c = cfg.camera
    n_frames = 1060
    rng = np.random.default_rng(23)
    world = synthetic.make_world(
        rng, num_landmarks=2500, desc_dim=cfg.frontend.descriptor_dim
    )
    dt = 0.1
    # Full circle completes at frame ~950; frames 950-1060 revisit the
    # start-of-run views, so the 200th keyframe (~frame 1000) sees a
    # genuine >=200-frame-old overlap when the check fires.
    ts, R, t = synthetic.make_trajectory(
        n_frames, dt=dt, radius=2.5,
        angular_rate=2.0 * np.pi / (950 * dt),
    )
    obs = [
        synthetic.observe(
            world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width, c.height,
            max_keypoints=cfg.frontend.max_keypoints, rng=rng,
            # 0.45 px keypoint noise = the subpixel regime the reference's
            # SuperPoint corners live in. At 0.7 px the production 1.0 px
            # epipolar threshold rejects ~40% of TRUE matches and the
            # >=30-inlier verify can't clear on 64-kp frames — the gate
            # stays at production strength, the sensor must too. Odometry
            # still drifts ~5 cm by the revisit (>> the 1 cm min-jump).
            pixel_noise=0.45, desc_noise=0.02, depth_noise=0.012,
        )
        for i in range(n_frames)
    ]
    seq = synthetic.SyntheticSequence(
        timestamps=ts, R=R, t=t,
        kp_xy=np.stack([o[0] for o in obs]),
        kp_desc=np.stack([o[1] for o in obs]),
        kp_depth=np.stack([o[2] for o in obs]),
        kp_valid=np.stack([o[3] for o in obs]),
        kp_landmark=np.stack([o[4] for o in obs]),
        accel=None, world=world,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
    )
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=False, smooth=False)
    st = result.final_state
    outs = result.outputs

    assert float(np.asarray(outs.tracking_ok)[1:].mean()) > 0.8
    n_kf = int(np.asarray(st.kf_count))
    assert n_kf >= 200, f"cadence never reached: {n_kf} keyframes"
    assert n_kf < 400, f"unexpected second cadence firing possible: {n_kf}"

    # Frame at which the 200th keyframe was created.
    kf_cum = np.cumsum(np.asarray(outs.is_keyframe).astype(int))
    frame200 = int(np.argmax(kf_cum >= cfg.loop.check_interval_kfs))
    assert kf_cum[frame200] == cfg.loop.check_interval_kfs

    loops_v = np.asarray(st.loops.valid)
    to_id = np.asarray(st.loops.to_id)
    from_id = np.asarray(st.loops.from_id)
    assert loops_v.sum() >= 1, (
        "the single production-cadence check at the 200th keyframe "
        f"(frame {frame200}) produced no constraint"
    )
    # The check fires ONLY at kf_count == 200 in this run: every valid
    # constraint's revisit endpoint is that exact frame, none earlier.
    assert (to_id[loops_v] == frame200).all(), (frame200, to_id[loops_v])
    # And the matched old keyframe honors the production frame gap.
    gaps = to_id[loops_v] - from_id[loops_v]
    assert (gaps >= cfg.loop.min_frame_gap).all(), gaps
