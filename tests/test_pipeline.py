"""End-to-end tracking pipeline on synthetic sequences with exact ground truth."""

import numpy as np

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core import pipeline
from vslam_tpu.data import synthetic

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def make_tiny_seq(num_frames=20, seed=0, rgbd=True):
    cfg = tiny_test_config()
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=num_frames,
        max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
        width=c.width, height=c.height,
        seed=seed,
        num_landmarks=1500,
        rgbd=rgbd,
    )
    return cfg, seq


def test_rgbd_tracking_ate():
    cfg, seq = make_tiny_seq(num_frames=24)
    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
    outs = result.outputs
    # Diagnostics sanity
    assert int(np.asarray(outs.is_keyframe).sum()) >= 2
    assert int(np.asarray(outs.used_3d3d)[1:].sum()) > 15  # RGB-D path dominates
    assert float(np.asarray(outs.num_matches)[1:].mean()) > 20
    # Trajectory accuracy: cm-level on a noisy synthetic sequence
    assert ate_res.rmse < 0.05, f"ATE RMSE too high: {ate_res}"


def test_tracking_is_deterministic():
    cfg, seq = make_tiny_seq(num_frames=10)
    r1, a1 = pipeline.run_synthetic(seq, cfg, use_imu=False)
    r2, a2 = pipeline.run_synthetic(seq, cfg, use_imu=False)
    np.testing.assert_array_equal(r1.t, r2.t)
    assert a1.rmse == a2.rmse


def test_smoother_does_not_hurt():
    cfg, seq = make_tiny_seq(num_frames=24)
    result, ate_s = pipeline.run_synthetic(seq, cfg, use_imu=True, smooth=True)
    from vslam_tpu.eval import ate as ate_mod

    ate_raw = ate_mod.compute_ate(
        result.timestamps, result.t, seq.timestamps, seq.t, with_scale=False
    )
    assert ate_s.rmse <= ate_raw.rmse * 1.5 + 1e-3


def test_map_grows_and_culls():
    cfg, seq = make_tiny_seq(num_frames=24)
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=False)
    n_map = int(np.asarray(result.final_state.map.valid).sum())
    assert 10 < n_map <= cfg.map.map_capacity
    # keyframes registered in ring
    assert int(np.asarray(result.final_state.keyframes.valid).sum()) >= 2


def test_posthoc_pgo_preserves_accuracy():
    from vslam_tpu.eval import ate as ate_mod

    cfg, seq = make_tiny_seq(num_frames=16)
    result, ate0 = pipeline.run_synthetic(seq, cfg, use_imu=True)
    r2 = pipeline.run_posthoc_pgo(result, cfg)
    a2 = ate_mod.compute_ate(
        r2.timestamps, r2.t_smoothed, seq.timestamps, seq.t, with_scale=False
    )
    assert np.isfinite(a2.rmse)
    # On a healthy drift-free run PGO must not damage the trajectory
    # (gain gate: rejected pass == identity; accepted pass improves the
    # constraint chi^2). A 0.1% relative margin covers the float-level
    # wobble of applying raw-keyframe deltas to the RTS-smoothed track —
    # the reference's +12% regression mode is structurally excluded.
    assert a2.rmse <= ate0.rmse * 1.001 + 1e-6, (ate0.rmse, a2.rmse)


def test_recovery_from_feature_dropout():
    """Blank out features mid-sequence: tracking must flag loss and the
    pipeline must survive (recovery path, `src/Slam.cpp:535-613`)."""
    cfg, seq = make_tiny_seq(num_frames=24)
    seq.kp_valid[10:12] = False  # total feature dropout for 2 frames
    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
    ok = np.asarray(result.outputs.tracking_ok)
    assert not ok[10] or not ok[11]  # loss detected
    assert np.isfinite(result.t_smoothed).all()
    # recovers to reasonable accuracy afterwards
    assert ate_res.rmse < 0.25


def test_monocular_mode():
    """Mono mode (`src/Slam.cpp:966-984`): Essential-matrix pose + depth-
    derived scale (reference: MiDaS/Kinect depth feeds the scale solve
    while 3D-3D is disabled)."""
    import dataclasses

    cfg, seq = make_tiny_seq(num_frames=24)
    cfg = dataclasses.replace(cfg, rgbd=False)
    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
    outs = result.outputs
    # 3D-3D path must never fire
    assert int(np.asarray(outs.used_3d3d).sum()) == 0
    assert float(np.asarray(outs.tracking_ok)[1:].mean()) > 0.7
    # Scale from depth keeps the trajectory metric to ~10 cm on this arc
    assert ate_res.rmse < 0.15, ate_res


def test_loop_closure_constraints_and_pgo():
    """Loop detection accumulates sane constraints and PGO consumes them
    without damaging a healthy trajectory (`src/Slam.cpp:730-798`)."""
    import dataclasses

    from vslam_tpu.config import LoopClosureConfig
    from vslam_tpu.eval import ate as ate_mod

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, loop=LoopClosureConfig(
        min_frame_gap=12, min_inliers=10, check_interval_kfs=2,
        max_jump=1.0, min_jump=-1.0, kf_stride=1,
        min_frames_between_accepts=0))
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=40, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=5, num_landmarks=1500, dt=0.1,
    )
    result, ate0 = pipeline.run_synthetic(seq, cfg, use_imu=True)
    st = result.final_state
    loops_v = np.asarray(st.loops.valid)
    assert loops_v.sum() >= 2, "loop closures should fire with relaxed gates"
    # constraints reference valid existing keyframe slots
    kf_valid = np.asarray(st.keyframes.valid)
    for a, b, v in zip(np.asarray(st.loops.kf_from), np.asarray(st.loops.kf_to), loops_v):
        if v:
            assert kf_valid[a] and kf_valid[b]
            assert a != b
    r2 = pipeline.run_posthoc_pgo(result, cfg)
    a2 = ate_mod.compute_ate(r2.timestamps, r2.t_smoothed, seq.timestamps, seq.t,
                             with_scale=False)
    # Gain gate: consuming the constraints must never hurt (0.1%
    # smoothed-track correction wobble allowed, see PGO test).
    assert a2.rmse <= ate0.rmse * 1.001 + 1e-6, (ate0.rmse, a2.rmse)


def test_windowed_ba_does_not_hurt():
    """Activated local BA (C27) preserves/improves a healthy trajectory."""
    from vslam_tpu.eval import ate as ate_mod

    cfg, seq = make_tiny_seq(num_frames=24)
    result, ate0 = pipeline.run_synthetic(seq, cfg, use_imu=True)
    r2 = pipeline.run_windowed_ba(result, cfg)
    a2 = ate_mod.compute_ate(
        r2.timestamps, r2.t_smoothed, seq.timestamps, seq.t, with_scale=False
    )
    assert np.isfinite(a2.rmse)
    # Gain gate: never worse than the input trajectory (0.1% float-level
    # smoothed-track correction wobble allowed, see PGO test).
    assert a2.rmse <= ate0.rmse * 1.001 + 1e-6, (ate0.rmse, a2.rmse)


def test_windowed_ba_fixes_noisy_poses():
    """The BA gain gate must OPEN when there is real pose error: perturb
    the tracked keyframe poses with accumulated RANDOM-WALK drift — the
    shape real tracking error takes, and the one the odometry-edge prior
    models (each consecutive relative stays near its measurement while
    absolute error grows) — well above the pixel-noise floor but within
    BA's design envelope (the association radius bounds how far a pose
    can be recovered from; beyond it, PGO/loop closure own the
    correction), and require an accepted pass that moves the keyframes
    back toward their true (unperturbed) poses."""
    import dataclasses

    import jax.numpy as jnp

    cfg, seq = make_tiny_seq(num_frames=24)
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=True)
    st = result.final_state
    kf_valid = np.asarray(st.keyframes.valid)
    kft_true = np.asarray(st.keyframes.t)
    rng = np.random.default_rng(3)
    # Gauge: BA fixes the first (oldest) keyframe — leave it true.
    order = np.argsort(np.asarray(st.keyframes.frame_id)[kf_valid])
    slots = np.nonzero(kf_valid)[0][order]
    walk = np.cumsum(
        rng.normal(0, 0.03, (len(slots), 3)).astype(np.float32), axis=0
    )
    walk -= walk[0]
    noise = np.zeros_like(kft_true)
    noise[slots] = walk
    perturbed = dataclasses.replace(
        result,
        final_state=st._replace(
            keyframes=st.keyframes._replace(t=jnp.asarray(kft_true + noise))
        ),
    )
    r2 = pipeline.run_windowed_ba(perturbed, cfg)
    kft_after = np.asarray(r2.final_state.keyframes.t)
    moved = slots[1:]
    err_before = np.linalg.norm(noise[moved], axis=-1)
    err_after = np.linalg.norm(kft_after[moved] - kft_true[moved], axis=-1)
    # Gate opened (poses changed) and the chain got closer to truth.
    assert not np.allclose(kft_after[moved], kft_true[moved] + noise[moved])
    assert err_after.mean() < 0.6 * err_before.mean(), (err_before, err_after)


def test_windowed_ba_never_worse_on_gross_noise():
    """Pose corruption far beyond the association radius starves BA of
    true observations (only spurious in-radius matches remain); the
    odometry-edge prior + gain gates must then keep the pass from making
    the chain (much) worse — gross errors are PGO / loop-closure / PnP-
    recovery territory, not BA's."""
    import dataclasses

    import jax.numpy as jnp

    cfg, seq = make_tiny_seq(num_frames=24)
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=True)
    st = result.final_state
    kf_valid = np.asarray(st.keyframes.valid)
    kft_true = np.asarray(st.keyframes.t)
    rng = np.random.default_rng(3)
    noise = rng.normal(0, 0.08, kft_true.shape).astype(np.float32)
    noise[~kf_valid] = 0.0
    order = np.argsort(np.asarray(st.keyframes.frame_id)[kf_valid])
    slots = np.nonzero(kf_valid)[0][order]
    noise[slots[0]] = 0.0
    perturbed = dataclasses.replace(
        result,
        final_state=st._replace(
            keyframes=st.keyframes._replace(t=jnp.asarray(kft_true + noise))
        ),
    )
    r2 = pipeline.run_windowed_ba(perturbed, cfg)
    kft_after = np.asarray(r2.final_state.keyframes.t)
    moved = slots[1:]
    err_before = np.linalg.norm(noise[moved], axis=-1)
    err_after = np.linalg.norm(kft_after[moved] - kft_true[moved], axis=-1)
    assert err_after.mean() < err_before.mean() * 1.05, (
        err_before.mean(), err_after.mean()
    )


def test_backend_ba_corrects_chain_drift():
    """The fused backend solves the WHOLE keyframe chain as one
    gain-gated global BA (the reference's disabled local BA ran per new
    keyframe, `src/Slam.cpp:699-725`, so it covered the chain
    incrementally) — accumulated random-walk drift on keyframes far
    BEFORE the trailing window must also shrink."""
    import dataclasses

    import jax.numpy as jnp

    cfg, seq = make_tiny_seq(num_frames=60)
    cfg = cfg.replace(
        map=dataclasses.replace(cfg.map, kf_min_frame_gap=4),
        opt=dataclasses.replace(cfg.opt, ba_window_kfs=4),
    )
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=True)
    st = result.final_state
    kf_valid = np.asarray(st.keyframes.valid)
    kft_true = np.asarray(st.keyframes.t)
    slots_all = np.nonzero(kf_valid)[0]
    order = np.argsort(np.asarray(st.keyframes.frame_id)[slots_all])
    chain = slots_all[order]  # oldest -> newest
    assert len(chain) >= cfg.opt.ba_window_kfs + 4, (
        "sequence too short to exercise beyond one window: %d KFs" % len(chain)
    )
    # Cumulative random-walk drift (the coupled-run failure mode), zero
    # at the oldest keyframe (BA gauge-fixes each window's first pose).
    rng = np.random.default_rng(7)
    walk = np.cumsum(
        rng.normal(0, 0.025, (len(chain), 3)).astype(np.float32), axis=0
    )
    walk -= walk[0]
    noise = np.zeros_like(kft_true)
    noise[chain] = walk
    perturbed = dataclasses.replace(
        result,
        final_state=st._replace(
            keyframes=st.keyframes._replace(t=jnp.asarray(kft_true + noise))
        ),
    )
    r2 = pipeline.run_backend(perturbed, cfg)
    kft_after = np.asarray(r2.final_state.keyframes.t)
    # Keyframes strictly before the trailing window: a single-window BA
    # cannot touch them; the sweep must.
    early = chain[1 : len(chain) - cfg.opt.ba_window_kfs]
    err_before = np.linalg.norm(noise[early], axis=-1)
    err_after = np.linalg.norm(kft_after[early] - kft_true[early], axis=-1)
    assert err_after.mean() < 0.6 * err_before.mean(), (
        err_before.mean(), err_after.mean()
    )
    # And the whole chain must never get worse.
    err_b_all = np.linalg.norm(noise[chain[1:]], axis=-1)
    err_a_all = np.linalg.norm(
        kft_after[chain[1:]] - kft_true[chain[1:]], axis=-1
    )
    assert err_a_all.mean() < err_b_all.mean()


def test_map_saturation_eviction_policy():
    """Full map: inserts evict the lowest found-ratio OLD points; young
    points are protected; counters reset on the recycled slots. (The
    reference's map grows unboundedly, `src/Map.cpp:20-30`; the bounded
    store must keep accepting new observations.)"""
    import jax.numpy as jnp

    from vslam_tpu.core.state import MapStore
    from vslam_tpu.core.tracking import _masked_free_slot_insert

    M, K, D = 16, 6, 8
    rng = np.random.default_rng(0)
    store = MapStore(
        pos=jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
        desc=jnp.zeros((M, D), jnp.float32),
        valid=jnp.ones(M, bool),
        visible=jnp.full(M, 10, jnp.int32),
        found=jnp.asarray(np.arange(M), jnp.int32),  # ratio ascends with slot
        # Slots 0-3 created at KF 50 (age 1 at insert time) -> protected.
        first_kf=jnp.asarray([50] * 4 + [0] * 12, jnp.int32),
        num_obs=jnp.full(M, 5, jnp.int32),
    )
    new_pos = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    store2, slots = _masked_free_slot_insert(
        store, new_pos, jnp.ones((K, D), jnp.float32), jnp.ones(K, bool),
        jnp.asarray(51, jnp.int32),
    )
    slots = np.asarray(slots)
    assert (slots >= 0).all(), slots  # all inserted despite a full map
    # Evicted: the six lowest-ratio old slots (4..9); young slots survive.
    assert set(slots.tolist()) == {4, 5, 6, 7, 8, 9}, slots
    np.testing.assert_array_equal(np.asarray(store2.pos)[:4], np.asarray(store.pos)[:4])
    np.testing.assert_array_equal(np.asarray(store2.pos)[slots], np.asarray(new_pos))
    assert (np.asarray(store2.num_obs)[slots] == 1).all()
    assert (np.asarray(store2.first_kf)[slots] == 51).all()
    assert np.asarray(store2.valid).all()


def test_map_saturation_eviction_respects_protect_mask():
    """Slots in the `protect` mask are never evicted: the keyframe step
    protects the points the current frame observes so its keypoint->slot
    associations (reprojection cull, periodic PnP) never dangle onto an
    evicted-and-refilled slot."""
    import jax.numpy as jnp

    from vslam_tpu.core.state import MapStore
    from vslam_tpu.core.tracking import _masked_free_slot_insert

    M, K, D = 8, 4, 4
    store = MapStore(
        pos=jnp.arange(M * 3, dtype=jnp.float32).reshape(M, 3),
        desc=jnp.ones((M, D), jnp.float32),
        valid=jnp.ones(M, bool),
        visible=jnp.full(M, 10, jnp.int32),
        found=jnp.arange(1, M + 1, dtype=jnp.int32),  # slot 0 weakest
        first_kf=jnp.zeros(M, jnp.int32),
        num_obs=jnp.ones(M, jnp.int32),
    )
    new_pos = jnp.full((K, 3), 99.0, jnp.float32)
    new_desc = jnp.zeros((K, D), jnp.float32)
    new_valid = jnp.asarray([True, True, False, False])
    # Unprotected: the two weakest (0, 1) are evicted.
    _, slots = _masked_free_slot_insert(
        store, new_pos, new_desc, new_valid, jnp.asarray(5, jnp.int32)
    )
    assert set(np.asarray(slots)[:2].tolist()) == {0, 1}
    # Protecting 0 and 1 shifts eviction to the next-weakest (2, 3).
    prot = jnp.zeros(M, bool).at[jnp.asarray([0, 1])].set(True)
    store3, slots3 = _masked_free_slot_insert(
        store, new_pos, new_desc, new_valid, jnp.asarray(5, jnp.int32),
        protect=prot,
    )
    assert set(np.asarray(slots3)[:2].tolist()) == {2, 3}
    np.testing.assert_array_equal(
        np.asarray(store3.pos)[:2], np.asarray(store.pos)[:2]
    )
    assert bool(np.asarray(store3.valid).all())


def test_map_saturation_tracking_survives():
    """Drive a sequence with a map capacity small enough to saturate
    within the first keyframes: tracking must survive and stay accurate
    (eviction keeps the freshest points near the camera)."""
    import dataclasses

    cfg, seq = make_tiny_seq(num_frames=24)
    cfg = dataclasses.replace(
        cfg, map=dataclasses.replace(cfg.map, map_capacity=160)
    )
    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
    n_map = int(np.asarray(result.final_state.map.valid).sum())
    # Saturated (eviction keeps it full up to the per-KF cull's churn).
    assert n_map >= 140, n_map
    ok = np.asarray(result.outputs.tracking_ok)
    assert ok[1:].mean() > 0.8, ok
    assert ate_res.rmse < 0.10, ate_res


def test_seed_robustness():
    """Five different worlds/noise draws: tracking never degrades badly
    (guards against RANSAC/matching flakiness)."""
    rmses = []
    for seed in range(5):
        cfg, seq = make_tiny_seq(num_frames=16, seed=seed)
        _, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
        rmses.append(ate_res.rmse)
    assert all(np.isfinite(r) for r in rmses), rmses
    assert max(rmses) < 0.08, rmses
    assert np.median(rmses) < 0.03, rmses


def test_bridge_keyframe_on_fast_rotation():
    """Fast pan with proactive keyframes disabled: matching vs the stale
    keyframe collapses, the bridge promotes the previous frame
    (`src/Slam.cpp:847-872`) and tracking survives."""
    import dataclasses

    from vslam_tpu.data.synthetic import make_trajectory

    cfg, seq = make_tiny_seq(num_frames=20)
    cfg = dataclasses.replace(
        cfg,
        map=dataclasses.replace(
            cfg.map, kf_proactive_max_matches=0, kf_min_frame_gap=50,
            kf_min_matches=10_000,
        ),
    )
    # fast pan: consecutive frames overlap, frame 0 vs frame 10 does not
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=20, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=7, num_landmarks=3000, dt=0.1,
    )
    ts, R, t = make_trajectory(20, dt=0.1, radius=0.8, angular_rate=1.2)
    seq2 = dataclasses.replace(seq, R=R, t=t)
    # re-observe with the fast trajectory
    from vslam_tpu.data.synthetic import observe

    rng = np.random.default_rng(7)
    obs = [
        observe(seq.world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width,
                c.height, max_keypoints=cfg.frontend.max_keypoints, rng=rng)
        for i in range(20)
    ]
    seq2 = dataclasses.replace(
        seq2,
        kp_xy=np.stack([o[0] for o in obs]),
        kp_desc=np.stack([o[1] for o in obs]),
        kp_depth=np.stack([o[2] for o in obs]),
        kp_valid=np.stack([o[3] for o in obs]),
        kp_landmark=np.stack([o[4] for o in obs]),
    )
    result, ate_res = pipeline.run_synthetic(seq2, cfg, use_imu=False)
    st = result.final_state
    # With normal+proactive keyframes disabled, only bridges create KFs
    # beyond the bootstrap one.
    assert int(np.asarray(st.kf_count)) >= 2, "bridge keyframes should fire"
    assert float(np.asarray(result.outputs.tracking_ok)[1:].mean()) > 0.6


def test_fused_backend_matches_sequential_passes():
    """run_backend (one device program) must reproduce
    run_windowed_ba(run_posthoc_pgo(...)) up to float noise — the fusion
    exists to delete relay round trips, not to change the math."""
    cfg = tiny_test_config()
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=24, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim, fx=c.fx, fy=c.fy, cx=c.cx,
        cy=c.cy, width=c.width, height=c.height, seed=0, num_landmarks=800,
    )
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=True)
    r_seq = pipeline.run_windowed_ba(pipeline.run_posthoc_pgo(result, cfg), cfg)
    r_fus = pipeline.run_backend(result, cfg)

    np.testing.assert_allclose(r_fus.t, r_seq.t, atol=2e-3)
    np.testing.assert_allclose(r_fus.t_smoothed, r_seq.t_smoothed, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(r_fus.final_state.keyframes.t),
        np.asarray(r_seq.final_state.keyframes.t), atol=2e-3,
    )
    # BA-refined map points: same set of valid points, cm-level agreement.
    v1 = np.asarray(r_seq.final_state.map.valid)
    v2 = np.asarray(r_fus.final_state.map.valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(
        np.asarray(r_fus.final_state.map.pos)[v2],
        np.asarray(r_seq.final_state.map.pos)[v1], atol=5e-2,
    )


def test_dense_fusion_frame_batching_exact():
    """frames_per_step batching must be EXACTLY equivalent to per-frame
    insertion: the lowest-index-wins slot election makes earlier frames
    win contested voxels and preserves append order."""
    import jax.numpy as jnp

    from vslam_tpu.ops import gridhash

    rng = np.random.default_rng(5)
    N, H, W = 8, 24, 32
    depths = jnp.asarray(rng.uniform(0.3, 4.0, (N, H, W)).astype(np.float32))
    rgbs = jnp.asarray(rng.integers(0, 255, (N, H, W, 3)), jnp.uint8)
    Rs = jnp.tile(jnp.eye(3, dtype=jnp.float32), (N, 1, 1))
    ts = jnp.asarray(rng.normal(0, 0.05, (N, 3)).astype(np.float32))

    outs = []
    for F in (1, 4):
        st = gridhash.init_dense_map(1 << 14, 4096)
        st = gridhash.fuse_chunk_scan(
            st, depths, rgbs, Rs, ts, 120.0, 120.0, 15.5, 11.5,
            pixel_step=2, frames_per_step=F,
        )
        outs.append(st)
    a, b = outs
    assert int(a.cloud_count) == int(b.cloud_count)
    n = int(a.cloud_count)
    np.testing.assert_array_equal(
        np.asarray(a.cloud_xyz)[:n], np.asarray(b.cloud_xyz)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(a.cloud_rgb)[:n], np.asarray(b.cloud_rgb)[:n]
    )


def test_smoother_keep_refine_variant():
    """EKFConfig.smooth_keep_refine (default, NEW vs the reference):
    smoothed positions keep the post-EKF refinement delta on top of the
    RTS output; the two variants differ by exactly (t_raw - x_filt),
    and the default must not be worse than the plain reference smoother
    on a healthy run."""
    cfg, seq = make_tiny_seq(num_frames=24)
    frames = pipeline.features_from_synthetic(seq)
    res_keep = pipeline.run_tracking(frames, cfg)
    res_plain = pipeline.result_from_outputs(
        res_keep.final_state, res_keep.outputs, keep_refine=False
    )
    delta = res_keep.t - np.asarray(res_keep.outputs.x_filt)[:, :3]
    np.testing.assert_allclose(
        res_keep.t_smoothed, res_plain.t_smoothed + delta, atol=1e-5
    )
    from vslam_tpu.eval import ate as ate_mod

    a_keep = ate_mod.compute_ate(
        res_keep.timestamps, res_keep.t_smoothed, seq.timestamps, seq.t,
        with_scale=False,
    )
    a_plain = ate_mod.compute_ate(
        res_plain.timestamps, res_plain.t_smoothed, seq.timestamps, seq.t,
        with_scale=False,
    )
    assert a_keep.rmse <= a_plain.rmse * 1.05 + 1e-4, (
        a_keep.rmse, a_plain.rmse,
    )


def _loopy_run(seed=5, num_frames=40):
    """Tracked run with relaxed loop gates -> a state holding >= 2 loop
    constraints (the `test_loop_closure_constraints_and_pgo` recipe)."""
    import dataclasses

    from vslam_tpu.config import LoopClosureConfig

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, loop=LoopClosureConfig(
        min_frame_gap=12, min_inliers=10, check_interval_kfs=2,
        max_jump=1.0, min_jump=-1.0, kf_stride=1,
        min_frames_between_accepts=0))
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=num_frames, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=seed, num_landmarks=1500, dt=0.1,
    )
    result, ate0 = pipeline.run_synthetic(seq, cfg, use_imu=True)
    assert np.asarray(result.final_state.loops.valid).sum() >= 2
    return cfg, seq, result, ate0


def test_inrun_pgo_correct_floor_and_fold():
    """`pipeline.inrun_pgo_correct` (the device-side streaming PGO fold,
    `src/Slam.cpp:730-798` design point): sub-floor corrections leave the
    state bit-exactly unchanged; a genuinely drifted ring is folded back,
    the event counter increments, and the live pose moves rigidly with
    the newest keyframe."""
    import dataclasses

    import jax.numpy as jnp

    cfg, seq, result, _ = _loopy_run()
    st = result.final_state

    # 1. Healthy run, absurd floor: the fold must be a bit-exact no-op.
    cfg_hi = dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, inrun_min_correction_m=1e9)
    )
    st_hi = pipeline.inrun_pgo_correct(st, cfg_hi)
    np.testing.assert_array_equal(np.asarray(st_hi.t), np.asarray(st.t))
    np.testing.assert_array_equal(
        np.asarray(st_hi.keyframes.t), np.asarray(st.keyframes.t)
    )
    assert int(st_hi.inrun_corrections) == int(st.inrun_corrections)

    # 2. Drifted ring (loop edges now violated): the fold fires.
    kfs = st.keyframes
    kf_fid = np.asarray(kfs.frame_id)
    n = len(result.t)
    ddir = np.asarray([0.6, -0.2, 0.3], np.float32)
    ddir /= np.linalg.norm(ddir)
    kf_drift = (
        0.5 * np.clip(kf_fid / (n - 1), 0.0, 1.0)[:, None] * ddir[None, :]
    ).astype(np.float32)
    newest = int(np.argmax(np.where(np.asarray(kfs.valid), kf_fid, -1)))
    st_d = st._replace(
        keyframes=kfs._replace(t=jnp.asarray(np.asarray(kfs.t) + kf_drift)),
        t=jnp.asarray(np.asarray(st.t) + kf_drift[newest]),
    )
    st2 = pipeline.inrun_pgo_correct(st_d, cfg)
    assert int(st2.inrun_corrections) == int(st.inrun_corrections) + 1
    valid = np.asarray(kfs.valid)
    err_before = np.linalg.norm(
        np.asarray(st_d.keyframes.t) - np.asarray(kfs.t), axis=-1
    )[valid]
    err_after = np.linalg.norm(
        np.asarray(st2.keyframes.t) - np.asarray(kfs.t), axis=-1
    )[valid]
    assert err_after.mean() < 0.5 * err_before.mean(), (
        err_before.mean(), err_after.mean()
    )
    # The live pose moved rigidly with the newest keyframe's delta.
    from vslam_tpu.ops import se3 as se3_ops

    Rd, td = se3_ops.compose(
        st2.keyframes.R[newest], st2.keyframes.t[newest],
        *se3_ops.inverse(st_d.keyframes.R[newest], st_d.keyframes.t[newest]),
    )
    t_expect = np.asarray(Rd) @ np.asarray(st_d.t) + np.asarray(td)
    np.testing.assert_allclose(np.asarray(st2.t), t_expect, atol=1e-5)


def test_posthoc_single_edge_floor():
    """A post-hoc PGO solve whose ONLY loop edge implies a small
    correction is rejected (no consensus redundancy -> the edge's noise
    would pass straight into the trajectory; the round-5 stress bench
    measured 0.059 -> 0.0657 ATE from exactly this), while a single edge
    against a genuinely drifted run still fires."""
    import dataclasses

    import jax.numpy as jnp

    from vslam_tpu.eval import ate as ate_mod

    cfg, seq, result, ate0 = _loopy_run()
    st = result.final_state
    loops_v = np.asarray(st.loops.valid)
    keep = int(np.nonzero(loops_v)[0][-1])  # newest accepted constraint
    one_hot = np.zeros_like(loops_v)
    one_hot[keep] = True
    st1 = st._replace(loops=st.loops._replace(valid=jnp.asarray(one_hot)))
    res1 = dataclasses.replace(result, final_state=st1)

    # Healthy run + single edge: identity (floor rejects the solve).
    r2 = pipeline.run_posthoc_pgo(res1, cfg)
    np.testing.assert_allclose(
        np.asarray(r2.t_smoothed), np.asarray(res1.t_smoothed), atol=1e-6
    )

    # GROSSLY drifted run + the same single edge: the correction clears
    # the single-edge floor and the revisit tail is pulled back. The
    # drift must be gross because a lone edge only corrects the RELATIVE
    # drift across its own span, and the floor is deliberately high:
    # magnitude cannot separate a genuine mid-size correction from a
    # wrong edge (the stress-world bench's single WRONG edge implies a
    # 0.22 m correction on a 0.059 m-drift run — measured), and with
    # odometry edges built from the current poses, PGO's internal costs
    # are structurally identical in both cases. One edge therefore only
    # justifies acting when the implied correction is unmissable.
    n = len(result.t)
    prof = (np.arange(n, dtype=np.float32) / (n - 1)) ** 1.5
    ddir = np.asarray([0.6, -0.2, 0.3], np.float32)
    ddir /= np.linalg.norm(ddir)
    drift = 1.0 * prof[:, None] * ddir[None, :]
    kf_fid = np.asarray(st.keyframes.frame_id)
    kf_drift = (
        1.0 * np.clip(kf_fid / (n - 1), 0.0, 1.0)[:, None] ** 1.5
        * ddir[None, :]
    ).astype(np.float32)
    drifted = dataclasses.replace(
        res1,
        t=result.t + drift,
        t_smoothed=result.t_smoothed + drift,
        final_state=st1._replace(
            keyframes=st.keyframes._replace(
                t=st.keyframes.t + kf_drift,
                t_anchor=st.keyframes.t_anchor + kf_drift,
            )
        ),
    )

    def unaligned_err(r):
        est_w = r.t @ seq.R[0].T + seq.t[0]
        return np.linalg.norm(est_w - seq.t, axis=-1)

    tail = slice(-10, None)
    e_pre = unaligned_err(drifted)
    r3 = pipeline.run_posthoc_pgo(drifted, cfg)
    e_post = unaligned_err(r3)
    # The solve was ACCEPTED (not the floor identity)...
    kf_move = np.linalg.norm(
        np.asarray(r3.final_state.keyframes.t)
        - np.asarray(drifted.final_state.keyframes.t), axis=-1
    )[np.asarray(st.keyframes.valid)]
    assert kf_move.max() >= cfg.opt.pgo_single_loop_min_correction_m, (
        kf_move.max()
    )
    # ...and the revisit tail improves (a lone edge can only fix the
    # relative drift across its span, so demand improvement, not
    # perfection).
    assert e_post[tail].mean() < 0.7 * e_pre[tail].mean(), (
        e_pre[tail].mean(), e_post[tail].mean()
    )
