import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from vslam_tpu.ops import scale as scale_ops


def test_two_view_scale_recovers(rng):
    n = 100
    p1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)], -1).astype(np.float32)
    R = Rotation.from_rotvec([0.02, -0.03, 0.01]).as_matrix().astype(np.float32)
    t_true = np.array([0.3, -0.1, 0.2], np.float32)
    s_true = np.linalg.norm(t_true)
    t_hat = t_true / s_true
    p2 = p1 @ R.T + t_true + rng.normal(0, 0.002, (n, 3)).astype(np.float32)
    s, ok = scale_ops.two_view_scale(
        jnp.asarray(R), jnp.asarray(t_hat), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(n, dtype=bool),
    )
    assert bool(ok)
    np.testing.assert_allclose(float(s), s_true, rtol=0.02)


def test_two_view_scale_iqr_rejects_outliers(rng):
    n = 80
    p1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)], -1).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    t_hat = np.array([1.0, 0.0, 0.0], np.float32)
    p2 = p1 + 0.25 * t_hat
    p2[:10] += rng.normal(0, 2.0, (10, 3))  # corrupt depths
    s, ok = scale_ops.two_view_scale(
        jnp.asarray(R), jnp.asarray(t_hat), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(n, dtype=bool),
    )
    assert bool(ok)
    np.testing.assert_allclose(float(s), 0.25, atol=0.02)


def test_two_view_scale_too_few():
    s, ok = scale_ops.two_view_scale(
        jnp.eye(3), jnp.array([1.0, 0, 0]),
        jnp.zeros((10, 3)), jnp.zeros((10, 3)), jnp.zeros(10, dtype=bool),
    )
    assert not bool(ok)
