"""Custom batched Jacobi decompositions vs NumPy LAPACK."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import linalg


def test_eigh_small_sizes(rng):
    for n in [3, 4, 6, 9, 12]:
        A = rng.normal(size=(32, n, n)).astype(np.float32)
        A = A + A.transpose(0, 2, 1)
        w, V = linalg.eigh_small(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        np.testing.assert_allclose(w, w_ref, atol=2e-4 * n)
        # Eigen equation: A V = V diag(w)
        err = np.abs(np.einsum("bij,bjk->bik", A, V) - V * w[:, None, :]).max()
        assert err < 2e-3, err
        # Orthonormality
        I = np.einsum("bij,bik->bjk", V, V)
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(n), (32, n, n)), atol=1e-4)


def test_svd3x3_random(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    U, S, Vt = linalg.svd3x3(jnp.asarray(A))
    U, S, Vt = map(np.asarray, (U, S, Vt))
    rec = np.einsum("bij,bj,bjk->bik", U, S, Vt)
    np.testing.assert_allclose(rec, A, atol=5e-5)
    S_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(S, S_ref, atol=1e-4)
    # Orthonormal factors
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", U, U), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-4
    )


def test_svd3x3_rank_deficient(rng):
    # Rank-2 and rank-1 matrices (3-point Kabsch covariances are rank 2)
    a = rng.normal(size=(16, 3)).astype(np.float32)
    b = rng.normal(size=(16, 3)).astype(np.float32)
    A2 = np.einsum("bi,bj->bij", a, b) + np.einsum("bi,bj->bij", b, a)  # rank <= 2
    U, S, Vt = linalg.svd3x3(jnp.asarray(A2))
    rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(S), np.asarray(Vt))
    # The A^T A formulation floors tiny singular values at ~sqrt(eps_f32)
    # relative — fine for Kabsch/rank-2 uses where sigma_3 is zeroed.
    np.testing.assert_allclose(rec, A2, atol=2e-3)
    A1 = np.einsum("bi,bj->bij", a, b)  # rank 1
    U, S, Vt = linalg.svd3x3(jnp.asarray(A1))
    rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(S), np.asarray(Vt))
    np.testing.assert_allclose(rec, A1, atol=2e-3)


def test_polar3x3(rng):
    from scipy.spatial.transform import Rotation

    R_gt = Rotation.random(32, random_state=5).as_matrix().astype(np.float32)
    noisy = R_gt + rng.normal(0, 0.05, (32, 3, 3)).astype(np.float32)
    R = np.asarray(linalg.polar3x3(jnp.asarray(noisy)))
    I = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    assert np.all(np.linalg.det(R) > 0.999)
    # close to the original rotation
    assert np.abs(R - R_gt).max() < 0.15


def test_cholesky_solve_small(rng):
    # The 6x6 damped GN systems this solver exists for.
    for n in (3, 6):
        A = rng.normal(size=(64, n, n)).astype(np.float32)
        H = A @ A.transpose(0, 2, 1) + np.eye(n, dtype=np.float32)[None] * 0.1
        g = rng.normal(size=(64, n)).astype(np.float32)
        x = np.asarray(linalg.cholesky_solve_small(jnp.asarray(H), jnp.asarray(g)))
        x_ref = np.linalg.solve(H.astype(np.float64), g.astype(np.float64)[..., None])[..., 0]
        # Error relative to the solution's magnitude (pointwise relative
        # error is meaningless for near-zero components).
        rel = np.abs(x - x_ref).max(-1) / np.abs(x_ref).max(-1)
        assert rel.max() < 1e-4, rel.max()


def test_svd4x4_nullvec(rng):
    # Build rank-3 4x4 matrices with known null vector

    null = rng.normal(size=(8, 4)).astype(np.float32)
    null /= np.linalg.norm(null, axis=-1, keepdims=True)
    A = rng.normal(size=(8, 3, 4)).astype(np.float32)
    # Project out null direction from rows
    A = A - np.einsum("bij,bj,bk->bik", A, null, null)
    A4 = np.concatenate([A, np.zeros((8, 1, 4), np.float32)], axis=1)
    v = np.asarray(linalg.svd4x4_nullvec(jnp.asarray(A4)))
    dot = np.abs(np.sum(v * null, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-3)


def test_polar_newton3x3_near_orthogonal(rng):
    # Rotations drifted the way the tracking step drifts them: float
    # round-off from composing rotations, plus a deliberate 1e-2 bump.
    from scipy.spatial.transform import Rotation

    R_gt = Rotation.random(64, random_state=3).as_matrix().astype(np.float32)
    # Quadratic convergence: tolerance scales with eps^4 floored at f32
    # round-off. The hot call sites feed drift <= ~1e-5.
    for eps, tol in ((1e-6, 2e-5), (1e-3, 2e-5), (1e-2, 5e-5), (5e-2, 1e-3)):
        A = R_gt + rng.normal(size=R_gt.shape).astype(np.float32) * eps
        Rn = np.asarray(linalg.polar_newton3x3(jnp.asarray(A)))
        # Orthogonal, det +1
        I = Rn @ Rn.transpose(0, 2, 1)
        assert np.abs(I - np.eye(3, dtype=np.float32)).max() < tol, eps
        assert np.abs(np.linalg.det(Rn) - 1.0).max() < tol
        # Agrees with the full polar projection
        Rp = np.asarray(linalg.polar3x3(jnp.asarray(A)))
        assert np.abs(Rn - Rp).max() < 20 * tol, (eps, np.abs(Rn - Rp).max())
