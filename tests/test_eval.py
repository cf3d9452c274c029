"""ATE / RPE evaluation correctness."""

import numpy as np
from scipy.spatial.transform import Rotation

from vslam_tpu.eval import ate


def test_ate_recovers_known_alignment(rng):
    n = 100
    ts = np.arange(n) * 0.1
    gt = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
    s = 1.7
    noise = rng.normal(0, 0.01, (n, 3))
    # est is gt expressed in a rotated/scaled/shifted frame + noise
    est = (gt + noise - np.array([1.0, 2.0, 3.0])) @ R / s
    res = ate.compute_ate(ts, est, ts, gt, with_scale=True)
    # after sim(3) alignment the residual is just the noise
    assert res.rmse < 0.03, res
    np.testing.assert_allclose(res.scale, s, rtol=0.05)
    assert res.num_pairs == n


def test_ate_timestamp_association(rng):
    ts_gt = np.arange(200) * 0.05
    gt = np.cumsum(rng.normal(0, 0.02, (200, 3)), axis=0)
    # estimates only at every 4th time, slightly offset (within 50 ms)
    ts_est = ts_gt[::4] + 0.01
    est = gt[::4]
    res = ate.compute_ate(ts_est, est, ts_gt, gt, with_scale=False)
    assert res.num_pairs == 50
    assert res.rmse < 0.03  # association picks the near-correct gt samples

    # out-of-window estimates are dropped
    res2 = ate.compute_ate(ts_est + 10.0, est, ts_gt, gt)
    assert res2.num_pairs < 3 or res2.rmse == float("inf")


def test_rpe_measures_drift(rng):
    n = 100
    ts = np.arange(n) * 0.1
    gt = np.cumsum(np.tile([0.1, 0.0, 0.0], (n, 1)), axis=0)
    est = gt * 1.05  # 5% scale drift -> per-step error 0.005
    res = ate.compute_rpe(ts, est, ts, gt, delta=1)
    np.testing.assert_allclose(res.mean, 0.005, atol=1e-3)


def test_rpe_counts_direction_errors():
    # Reference RPE (main.cpp:368-380) is the norm of the VECTOR difference
    # of displacements: a trajectory moving the right distance in the wrong
    # direction must NOT score zero.
    n = 50
    ts = np.arange(n) * 0.1
    gt = np.cumsum(np.tile([0.1, 0.0, 0.0], (n, 1)), axis=0)
    est = np.cumsum(np.tile([0.0, 0.1, 0.0], (n, 1)), axis=0)  # same speed, wrong axis
    res = ate.compute_rpe(ts, est, ts, gt, delta=1)
    np.testing.assert_allclose(res.mean, 0.1 * np.sqrt(2), atol=1e-6)
