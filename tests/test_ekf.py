"""EKF + RTS vs a NumPy reimplementation of the reference equations
(`/root/reference/src/Slam.cpp:1654-1744, 1761-1810`)."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import ekf as ekf_ops


def np_predict(x, P, dt, decay=0.95, sigma_a=1.0):
    F = np.eye(6)
    for i in range(3):
        F[i, i + 3] = dt
        F[i + 3, i + 3] = decay
    x = F @ x
    Q = np.zeros((6, 6))
    for i in range(3):
        Q[i, i] = 0.25 * dt**4 * sigma_a**2
        Q[i + 3, i + 3] = dt**2 * sigma_a**2
        Q[i, i + 3] = Q[i + 3, i] = 0.5 * dt**3 * sigma_a**2
    return x, F @ P @ F.T + Q


def np_update(x, P, z, sigma):
    H = np.zeros((3, 6))
    H[:3, :3] = np.eye(3)
    R = np.eye(3) * sigma**2
    y = z - H @ x
    S = H @ P @ H.T + R
    K = P @ H.T @ np.linalg.inv(S)
    x = x + K @ y
    IKH = np.eye(6) - K @ H
    return x, IKH @ P @ IKH.T + K @ R @ K.T


def test_predict_matches_reference_equations():
    st = ekf_ops.initialize(jnp.array([1.0, 2.0, 3.0]), 0.0)
    st = st._replace(x=st.x.at[3:].set(jnp.array([0.1, -0.2, 0.3])))
    x0, P0 = np.asarray(st.x, dtype=np.float64), np.asarray(st.P, dtype=np.float64)
    st2 = ekf_ops.predict(st, 0.1)
    x_ref, P_ref = np_predict(x0, P0, 0.1)
    np.testing.assert_allclose(np.asarray(st2.x), x_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.P), P_ref, atol=1e-5)


def test_update_matches_reference_equations():
    st = ekf_ops.initialize(jnp.zeros(3), 0.0)
    st = ekf_ops.predict(st, 0.1)
    z = np.array([0.05, -0.02, 0.01])
    x0, P0 = np.asarray(st.x, dtype=np.float64), np.asarray(st.P, dtype=np.float64)
    st2 = ekf_ops.update_visual(st, jnp.asarray(z, dtype=jnp.float32), 0.04)
    x_ref, P_ref = np_update(x0, P0, z, 0.04)
    np.testing.assert_allclose(np.asarray(st2.x), x_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.P), P_ref, atol=1e-5)


def test_innovation_gate_inflates_sigma():
    st = ekf_ops.initialize(jnp.zeros(3), 0.0)
    st = ekf_ops.predict(st, 0.1)
    z_far = jnp.array([1.0, 0.0, 0.0])  # innovation 1.0 > gate 0.3
    st_gated = ekf_ops.update_visual_gated(st, z_far, 0.04, gate=0.3)
    st_tight = ekf_ops.update_visual(st, z_far, 0.04)
    # Gated update must move less toward the outlier measurement
    assert float(st_gated.x[0]) < float(st_tight.x[0])


def test_height_update_pulls_along_gravity():
    st = ekf_ops.initialize(jnp.array([0.0, 0.5, 0.0]), 0.0)
    st = ekf_ops.predict(st, 0.1)
    g = jnp.array([0.0, 1.0, 0.0])
    st2 = ekf_ops.update_height(st, g, 0.0, 0.01)
    assert abs(float(st2.x[1])) < abs(float(st.x[1]))
    # Orthogonal components barely move
    assert abs(float(st2.x[0])) < 1e-5


def test_clamp_step():
    st = ekf_ops.initialize(jnp.array([1.0, 0.0, 0.0]), 0.0)
    prev = jnp.zeros(3)
    st2, pos = ekf_ops.clamp_step(st, prev, 0.1, max_step=0.1)
    np.testing.assert_allclose(float(jnp.linalg.norm(pos - prev)), 0.1, atol=1e-5)
    # velocity rewritten to delta/dt
    np.testing.assert_allclose(np.asarray(st2.x[3:]), np.asarray(pos - prev) / 0.1, atol=1e-5)


def test_rts_smoother_improves_over_filter():
    rng = np.random.default_rng(0)
    N = 60
    dt = 0.1
    # True constant-velocity trajectory
    v = np.array([0.2, -0.1, 0.05])
    pos_true = np.cumsum(np.tile(v * dt, (N, 1)), axis=0)
    st = ekf_ops.initialize(jnp.zeros(3), 0.0)
    snaps = []
    for k in range(N):
        st = ekf_ops.predict(st, dt)
        x_pred, P_pred = st.x, st.P
        z = pos_true[k] + rng.normal(0, 0.05, 3)
        st = ekf_ops.update_visual(st, jnp.asarray(z, dtype=jnp.float32), 0.05)
        snaps.append((x_pred, P_pred, st.x, st.P, dt, k))
    stacked = ekf_ops.EKFSnapshot(
        x_pred=jnp.stack([s[0] for s in snaps]),
        P_pred=jnp.stack([s[1] for s in snaps]),
        x_filt=jnp.stack([s[2] for s in snaps]),
        P_filt=jnp.stack([s[3] for s in snaps]),
        dt=jnp.asarray([s[4] for s in snaps], dtype=jnp.float32),
        frame_id=jnp.asarray([s[5] for s in snaps], dtype=jnp.int32),
    )
    smoothed = np.asarray(ekf_ops.rts_smooth(stacked, jnp.ones(N, dtype=bool)))
    filt = np.asarray(stacked.x_filt[:, :3])
    err_f = np.linalg.norm(filt - pos_true, axis=-1).mean()
    err_s = np.linalg.norm(smoothed - pos_true, axis=-1).mean()
    assert err_s < err_f  # smoothing strictly helps on this linear problem


def _make_snapshots(N, seed=1, drop=()):
    """Run the real filter to build a realistic snapshot stack."""
    rng = np.random.default_rng(seed)
    v = np.array([0.15, -0.08, 0.04])
    dts = 0.08 + 0.04 * rng.random(N)
    pos_true = np.cumsum(v[None, :] * dts[:, None], axis=0)
    st = ekf_ops.initialize(jnp.zeros(3), 0.0)
    snaps = []
    for k in range(N):
        st = ekf_ops.predict(st, float(dts[k]))
        x_pred, P_pred = st.x, st.P
        z = pos_true[k] + rng.normal(0, 0.05, 3)
        st = ekf_ops.update_visual(st, jnp.asarray(z, dtype=jnp.float32), 0.05)
        snaps.append((x_pred, P_pred, st.x, st.P, dts[k], k))
    stacked = ekf_ops.EKFSnapshot(
        x_pred=jnp.stack([s[0] for s in snaps]),
        P_pred=jnp.stack([s[1] for s in snaps]),
        x_filt=jnp.stack([s[2] for s in snaps]),
        P_filt=jnp.stack([s[3] for s in snaps]),
        dt=jnp.asarray([s[4] for s in snaps], dtype=jnp.float32),
        frame_id=jnp.asarray([s[5] for s in snaps], dtype=jnp.int32),
    )
    valid = np.ones(N, dtype=bool)
    valid[list(drop)] = False
    return stacked, jnp.asarray(valid)


def test_rts_assoc_matches_sequential():
    stacked, valid = _make_snapshots(97)
    seq = np.asarray(ekf_ops.rts_smooth(stacked, valid))
    par = np.asarray(ekf_ops.rts_smooth_assoc(stacked, valid))
    np.testing.assert_allclose(par, seq, atol=3e-4)


def test_rts_assoc_matches_sequential_with_invalid_frames():
    # Invalid frames break the smoothing chain exactly like the
    # sequential where(valid, ., x_filt) masking.
    stacked, valid = _make_snapshots(64, seed=3, drop=(0, 17, 18, 40))
    seq = np.asarray(ekf_ops.rts_smooth(stacked, valid))
    par = np.asarray(ekf_ops.rts_smooth_assoc(stacked, valid))
    np.testing.assert_allclose(par, seq, atol=3e-4)
    # The masked frames anchor at their filtered positions in both.
    np.testing.assert_allclose(
        par[17], np.asarray(stacked.x_filt[17, :3]), atol=3e-4
    )


def test_rts_assoc_matches_f64_reference_long_horizon():
    """Production smooths N~896 frames: bound the f32 round-off drift of
    the reassociated 6x6 compositions against an f64 NumPy reference of
    the sequential recursion (`Slam.cpp:1761-1810`). Hardening for the
    parallel path (ADVICE r3); the short-horizon tests pin assoc==seq."""
    import jax

    N = 896
    rng = np.random.default_rng(7)
    v = np.array([0.15, -0.08, 0.04])
    dts = (0.08 + 0.04 * rng.random(N)).astype(np.float32)
    pos_true = np.cumsum(v[None, :] * dts[:, None].astype(np.float64), axis=0)
    zs = (pos_true + rng.normal(0, 0.05, (N, 3))).astype(np.float32)

    def step(st, inp):
        dt, z = inp
        st = ekf_ops.predict(st, dt)
        x_pred, P_pred = st.x, st.P
        st = ekf_ops.update_visual(st, z, 0.05)
        return st, (x_pred, P_pred, st.x, st.P)

    st0 = ekf_ops.initialize(jnp.zeros(3), 0.0)
    _, (xp, Pp, xf, Pf) = jax.jit(
        lambda st, xs: jax.lax.scan(step, st, xs)
    )(st0, (jnp.asarray(dts), jnp.asarray(zs)))
    stacked = ekf_ops.EKFSnapshot(
        x_pred=xp, P_pred=Pp, x_filt=xf, P_filt=Pf,
        dt=jnp.asarray(dts), frame_id=jnp.arange(N, dtype=jnp.int32),
    )
    valid = jnp.ones(N, dtype=bool)

    # f64 sequential reference of the same recursion.
    x_pred64 = np.asarray(xp, np.float64)
    P_pred64 = np.asarray(Pp, np.float64)
    x_filt64 = np.asarray(xf, np.float64)
    P_filt64 = np.asarray(Pf, np.float64)
    xs64 = x_filt64.copy()
    Ps = P_filt64[N - 1]
    for k in range(N - 2, -1, -1):
        F = np.eye(6)
        F[:3, 3:] = np.eye(3) * dts[k + 1]
        F[3:, 3:] = np.eye(3) * 0.95
        C = P_filt64[k] @ F.T @ np.linalg.inv(P_pred64[k + 1])
        xs64[k] = x_filt64[k] + C @ (xs64[k + 1] - x_pred64[k + 1])
        Ps = P_filt64[k] + C @ (Ps - P_pred64[k + 1]) @ C.T
    ref = xs64[:, :3]

    par = np.asarray(ekf_ops.rts_smooth_assoc(stacked, valid), np.float64)
    seq = np.asarray(ekf_ops.rts_smooth(stacked, valid), np.float64)
    err_par = np.abs(par - ref).max()
    err_seq = np.abs(seq - ref).max()
    # Both f32 paths stay within millimeter-scale round-off of the f64
    # truth over the full horizon (positions reach ~10 m).
    assert err_seq < 5e-3, err_seq
    assert err_par < 5e-3, err_par


def test_rts_assoc_single_frame():
    stacked, valid = _make_snapshots(1)
    par = np.asarray(ekf_ops.rts_smooth_assoc(stacked, valid))
    np.testing.assert_allclose(par, np.asarray(stacked.x_filt[:, :3]))
