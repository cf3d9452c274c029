"""Pose-graph optimization: drift correction with loop closures."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from vslam_tpu.ops import pgo, se3


def make_drifting_loop(n=12, drift=0.03, seed=0):
    """Ground-truth square loop + odometry with accumulated drift."""
    rng = np.random.default_rng(seed)
    # GT: poses around a square in the xz plane
    thetas = np.linspace(0, 2 * np.pi, n, endpoint=False)
    t_gt = np.stack([np.sin(thetas), np.zeros(n), 1 - np.cos(thetas)], -1) * 2.0
    R_gt = np.stack(
        [Rotation.from_euler("y", th).as_matrix() for th in thetas]
    ).astype(np.float32)
    t_gt = t_gt.astype(np.float32)

    # Odometry measurements: true relative + noise/drift
    R_odo, t_odo = [], []
    for i in range(n - 1):
        Rr, tr = se3.relative(
            jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]),
            jnp.asarray(R_gt[i + 1]), jnp.asarray(t_gt[i + 1]),
        )
        tr = np.asarray(tr) + rng.normal(0, drift, 3)
        wr = np.asarray(se3.log_so3(Rr)) + rng.normal(0, drift * 0.3, 3)
        R_odo.append(np.asarray(se3.exp_so3(jnp.asarray(wr, dtype=jnp.float32))))
        t_odo.append(tr.astype(np.float32))

    # Integrate odometry -> drifted initial estimate
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    for i in range(n - 1):
        Rn, tn = se3.compose(
            jnp.asarray(R_est[-1]), jnp.asarray(t_est[-1]),
            jnp.asarray(R_odo[i]), jnp.asarray(t_odo[i]),
        )
        R_est.append(np.asarray(Rn))
        t_est.append(np.asarray(tn))
    return (
        np.stack(R_gt), t_gt,
        np.stack(R_est).astype(np.float32), np.stack(t_est).astype(np.float32),
        np.stack(R_odo), np.stack(t_odo),
    )


def test_pgo_closes_loop():
    n = 12
    R_gt, t_gt, R_est, t_est, R_odo, t_odo = make_drifting_loop(n)

    # Odometry edges from the measured relative transforms
    e_i = np.arange(n - 1, dtype=np.int32)
    e_j = e_i + 1
    info = np.tile(
        np.concatenate([np.full(3, 1 / 0.05**2), np.full(3, 1 / 0.02**2)])[None],
        (n - 1, 1),
    ).astype(np.float32)

    # One loop-closure edge: last -> first with the TRUE relative pose
    Rl, tl = se3.relative(
        jnp.asarray(R_gt[n - 1]), jnp.asarray(t_gt[n - 1]),
        jnp.asarray(R_gt[0]), jnp.asarray(t_gt[0]),
    )
    e_i = np.concatenate([e_i, [n - 1]]).astype(np.int32)
    e_j = np.concatenate([e_j, [0]]).astype(np.int32)
    e_R = np.concatenate([R_odo, np.asarray(Rl)[None]], axis=0)
    e_t = np.concatenate([t_odo, np.asarray(tl)[None]], axis=0)
    info = np.concatenate(
        [info, np.concatenate([np.full(3, 1 / 0.03**2), np.full(3, 1 / 0.01**2)])[None]],
        axis=0,
    ).astype(np.float32)

    prob = pgo.PGOProblem(
        R=jnp.asarray(R_est), t=jnp.asarray(t_est),
        v_valid=jnp.ones(n, dtype=bool),
        e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
        e_R=jnp.asarray(e_R), e_t=jnp.asarray(e_t),
        e_info=jnp.asarray(info), e_valid=jnp.ones(len(e_i), dtype=bool),
        gravity=jnp.array([0.0, 1.0, 0.0]),
        height=jnp.asarray(0.0), height_info=jnp.asarray(1 / 0.005**2),
        height_on=jnp.asarray(True),
    )
    R_opt, t_opt = pgo.optimize(prob, iterations=15)
    err_before = np.linalg.norm(t_est - t_gt, axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(t_opt) - t_gt, axis=-1).mean()
    assert err_after < err_before * 0.6, (err_before, err_after)
    # Height prior keeps y near 0
    assert np.abs(np.asarray(t_opt)[:, 1]).max() < 0.02
    # First vertex fixed
    np.testing.assert_allclose(np.asarray(t_opt)[0], t_gt[0], atol=1e-5)


def _square_problem(n, R_est, t_est, R_odo, t_odo, R_gt, t_gt,
                    extra_edges=(), e_robust=None):
    """PGO problem over the drifting square with the true last->first loop
    edge plus optional extra (i, j, R, t) edges."""
    e_i = np.arange(n - 1, dtype=np.int32)
    e_j = e_i + 1
    info = np.tile(
        np.concatenate([np.full(3, 1 / 0.05**2), np.full(3, 1 / 0.02**2)])[None],
        (n - 1, 1),
    ).astype(np.float32)
    Rl, tl = se3.relative(
        jnp.asarray(R_gt[n - 1]), jnp.asarray(t_gt[n - 1]),
        jnp.asarray(R_gt[0]), jnp.asarray(t_gt[0]),
    )
    loops = [(n - 1, 0, np.asarray(Rl), np.asarray(tl))] + list(extra_edges)
    l_info = np.concatenate(
        [np.full(3, 1 / 0.03**2), np.full(3, 1 / 0.01**2)]
    ).astype(np.float32)
    e_i = np.concatenate([e_i, [e[0] for e in loops]]).astype(np.int32)
    e_j = np.concatenate([e_j, [e[1] for e in loops]]).astype(np.int32)
    e_R = np.concatenate([R_odo] + [e[2][None] for e in loops], axis=0)
    e_t = np.concatenate([t_odo] + [e[3][None] for e in loops], axis=0)
    info = np.concatenate([info] + [l_info[None]] * len(loops), axis=0)
    kw = {}
    if e_robust is not None:
        kw = dict(
            e_robust=jnp.asarray(e_robust),
            dcs_phi=jnp.asarray(16.0, jnp.float32),
        )
    return pgo.PGOProblem(
        R=jnp.asarray(R_est), t=jnp.asarray(t_est),
        v_valid=jnp.ones(n, dtype=bool),
        e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
        e_R=jnp.asarray(e_R), e_t=jnp.asarray(e_t),
        e_info=jnp.asarray(info.astype(np.float32)),
        e_valid=jnp.ones(len(e_i), dtype=bool),
        gravity=jnp.array([0.0, 1.0, 0.0]),
        height=jnp.asarray(0.0), height_info=jnp.asarray(1 / 0.005**2),
        height_on=jnp.asarray(True),
        **kw,
    )


def test_pgo_dcs_rejects_wrong_loop_edge():
    """One WRONG loop edge (0.8 m off) alongside good ones: without the
    robust kernel it drags the solution WORSE than the drifted input;
    with the frozen consensus weights on the loop edges the good
    correction survives and the bad edge is crushed."""
    n = 12
    R_gt, t_gt, R_est, t_est, R_odo, t_odo = make_drifting_loop(n)

    def true_edge(i, j, off=0.0):
        Rr, tr = se3.relative(
            jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]),
            jnp.asarray(R_gt[j]), jnp.asarray(t_gt[j]),
        )
        return (i, j, np.asarray(Rr),
                np.asarray(tr) + np.array([off, 0, 0], np.float32))

    wrong = true_edge(6, 1, off=0.8)
    for goods in ([], [true_edge(8, 2), true_edge(9, 3), true_edge(10, 4)]):
        extra = goods + [wrong]
        robust = np.concatenate(
            [np.zeros(n - 1, bool), np.ones(1 + len(extra), bool)]
        )
        prob_plain = _square_problem(n, R_est, t_est, R_odo, t_odo, R_gt,
                                     t_gt, extra_edges=extra)
        prob_dcs = _square_problem(n, R_est, t_est, R_odo, t_odo, R_gt,
                                   t_gt, extra_edges=extra, e_robust=robust)
        _, t_plain = pgo.optimize(prob_plain, iterations=15)
        _, t_dcs = pgo.optimize(prob_dcs, iterations=15)
        err_before = np.linalg.norm(t_est - t_gt, axis=-1).mean()
        err_plain = np.linalg.norm(np.asarray(t_plain) - t_gt, axis=-1).mean()
        err_dcs = np.linalg.norm(np.asarray(t_dcs) - t_gt, axis=-1).mean()
        # The robust solve must beat the un-kerneled one substantially AND
        # still correct the drift (the plain solve makes it WORSE).
        assert err_dcs < err_plain * 0.6, (err_before, err_plain, err_dcs)
        assert err_dcs < err_before, (err_before, err_dcs)


def test_pgo_dcs_keeps_good_edges_at_full_weight():
    """With only CONSISTENT edges, the robust solve must match the plain
    solve (DCS weight 1 below phi)."""
    n = 12
    R_gt, t_gt, R_est, t_est, R_odo, t_odo = make_drifting_loop(n)
    robust = np.concatenate([np.zeros(n - 1, bool), np.ones(1, bool)])
    prob_plain = _square_problem(n, R_est, t_est, R_odo, t_odo, R_gt, t_gt)
    prob_dcs = _square_problem(n, R_est, t_est, R_odo, t_odo, R_gt, t_gt,
                               e_robust=robust)
    _, t_plain = pgo.optimize(prob_plain, iterations=15)
    _, t_dcs = pgo.optimize(prob_dcs, iterations=15)
    np.testing.assert_allclose(np.asarray(t_dcs), np.asarray(t_plain), atol=2e-3)


def test_correct_trajectory_interpolates():
    V = 4
    kf_ids = np.array([0, 10, 20, 30], dtype=np.int32)
    t_old = np.zeros((V, 3), np.float32)
    t_new = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    frame_ids = jnp.asarray(np.array([0, 5, 10, 15, 25, 30], np.float32))
    fR = jnp.tile(jnp.eye(3), (6, 1, 1))
    ft = jnp.zeros((6, 3))
    _, ft2 = pgo.correct_trajectory(
        frame_ids, fR, ft, jnp.asarray(kf_ids), jnp.ones(V, dtype=bool),
        R, jnp.asarray(t_old), R, jnp.asarray(t_new),
    )
    np.testing.assert_allclose(
        np.asarray(ft2)[:, 0], [0.0, 0.5, 1.0, 1.5, 2.5, 3.0], atol=1e-5
    )


def test_correct_map_points_rigid():
    V = 2
    R_old = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    t_old = np.zeros((V, 3), np.float32)
    R_new = R_old.copy()
    t_new = np.array([[0, 0, 0], [0.5, 0, 0]], np.float32)
    pts = jnp.asarray(np.array([[1, 1, 1], [2, 2, 2]], np.float32))
    pt_kf = jnp.asarray(np.array([0, 1], np.int32))
    moved = pgo.correct_map_points(
        pts, pt_kf, jnp.ones(V, dtype=bool),
        jnp.asarray(R_old), jnp.asarray(t_old), jnp.asarray(R_new), jnp.asarray(t_new),
    )
    np.testing.assert_allclose(np.asarray(moved), [[1, 1, 1], [2.5, 2, 2]], atol=1e-6)
