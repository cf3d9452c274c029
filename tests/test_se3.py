import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from vslam_tpu.ops import se3


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(7)).as_matrix().astype(np.float32)


def test_exp_log_so3_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w))
    w2 = se3.log_so3(R)
    R2 = se3.exp_so3(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_exp_so3_matches_scipy(rng):
    w = rng.normal(size=(32, 3)).astype(np.float64) * 2.0
    ours = np.asarray(se3.exp_so3(jnp.asarray(w, dtype=jnp.float32)))
    ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_log_so3_small_and_pi():
    # Small angle
    w = jnp.array([[1e-7, -2e-7, 1e-7]], dtype=jnp.float32)
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(se3.log_so3(R)), np.asarray(w), atol=1e-6)
    # Near pi
    axis = np.array([0.6, -0.8, 0.0], dtype=np.float32)
    w = jnp.asarray(axis * (np.pi - 1e-4))
    R = se3.exp_so3(w[None])
    w2 = np.asarray(se3.log_so3(R))[0]
    ref = Rotation.from_matrix(np.asarray(R)[0]).as_rotvec()
    np.testing.assert_allclose(np.abs(w2), np.abs(ref), atol=1e-3)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 32)
    q = se3.quat_from_matrix(jnp.asarray(R))
    R2 = se3.matrix_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    # Against scipy (xyzw order matches)
    q_ref = Rotation.from_matrix(R).as_quat()
    q_ours = np.asarray(q)
    # sign ambiguity
    sign = np.sign(np.sum(q_ref * q_ours, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_ours, q_ref * sign, atol=1e-5)


def test_compose_inverse(rng):
    R = random_rotations(rng, 8)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    Ri, ti = se3.inverse(jnp.asarray(R), jnp.asarray(t))
    Rc, tc = se3.compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)


def test_exp_log_se3_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    R, t = se3.exp_se3(jnp.asarray(xi))
    xi2 = se3.log_se3(R, t)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-3)


def test_orthonormalize(rng):
    R = random_rotations(rng, 8) + rng.normal(size=(8, 3, 3)).astype(np.float32) * 0.05
    Ro = np.asarray(se3.orthonormalize(jnp.asarray(R)))
    I = np.einsum("nij,nkj->nik", Ro, Ro)
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    assert np.all(np.linalg.det(Ro) > 0.99)
