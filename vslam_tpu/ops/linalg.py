"""Batched small-matrix decompositions tuned for TPU.

XLA's generic `jnp.linalg.eigh`/`svd` lower to sequential QR-style
algorithms that cost 1.5-5 ms for the (256, N<=12) batches our RANSAC
solvers need — 80% of the tracking step's frame time. These replacements
are classic batched cyclic Jacobi: a fixed, statically-unrolled rotation
schedule of pure VPU element-wise ops, identical work for every batch
element, no data-dependent control flow. They are also noticeably more
accurate than the TPU lowering of jnp.linalg.svd in float32 (measured
~1e-3 error on 3x3 problems vs ~1e-6 here).

Provided:
  eigh_small(A)  — symmetric NxN (N <= 16), ascending eigenpairs.
  svd3x3(A)      — full SVD of general 3x3 batches, descending sigma.
  polar3x3(A)    — nearest rotation (det +1), Kabsch-style.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_matmuls(fn):
    """Pin full-float32 matmul precision for everything traced inside.

    The TPU MXU lowers f32 matmuls to bf16 passes by default
    (`jax_default_matmul_precision`), which is fine for convolutions but
    destroys iterated Givens applications and 5-cm-threshold geometry.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def _eigvec_from_cross(M):
    """Largest-norm cross product of row pairs of M — the classic robust
    eigenvector extraction for 3x3 (rows of (A - lam I) span the orthogonal
    complement of the eigenvector). Returns (v_unnormalized, norm2)."""
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    v = jnp.where(
        use01[..., None], c01, jnp.where(use02[..., None], c02, c12)
    )
    n2 = jnp.where(use01, n01, jnp.where(use02, n02, n12))
    return v, n2


def eigh3x3(A):
    """Closed-form symmetric 3x3 eigendecomposition (ascending).

    The trigonometric solution of the characteristic cubic (Cardano) plus
    cross-product eigenvectors — zero iteration, pure element-wise VPU ops.
    On the per-frame tracking path this replaces 18 sequential Jacobi
    rounds (~0.2 ms/call on a v5e) with one fused element-wise block; it is
    also what makes 100k-point PCA normal estimation cheap.

    Degenerate handling: the eigenvector of the best-separated extreme
    eigenvalue is extracted first (its cross products are the most robust);
    the other extreme is orthogonalized against it; the middle one is their
    cross product. Near-multiple eigenvalues collapse to any orthonormal
    basis of the eigenspace, which is exactly eigh's contract.
    """
    dtype = A.dtype
    eye = jnp.eye(3, dtype=dtype)
    scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale < jnp.asarray(1e-30, dtype), 1.0, scale)
    S = A / scale
    a00, a11, a22 = S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]
    a01, a02, a12 = S[..., 0, 1], S[..., 0, 2], S[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    psafe = jnp.where(p < jnp.asarray(1e-25, dtype), 1.0, p)
    # det((S - qI)/p) via the symmetric 3x3 determinant.
    c00, c11, c22 = b00 / psafe, b11 / psafe, b22 / psafe
    c01, c02, c12 = a01 / psafe, a02 / psafe, a12 / psafe
    detB = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_p = 2.0 * p
    lam_max = q + two_p * jnp.cos(phi)
    lam_min = q + two_p * jnp.cos(phi + jnp.asarray(2.0943951023931953, dtype))
    lam_mid = 3.0 * q - lam_max - lam_min

    # Cross-product extraction is only reliable for the best-separated
    # extreme eigenvalue; the other two come from an EXACT closed-form 2x2
    # eigensolve in its orthogonal complement (Eigen's computeDirect
    # strategy) — that keeps the eigen-equation residual at ~eps*lam_max
    # even when the small eigenvalues are clustered.
    max_first = (lam_max - lam_mid) >= (lam_mid - lam_min)
    lam_a = jnp.where(max_first, lam_max, lam_min)

    eps2 = jnp.asarray(1e-20, dtype)
    va_raw, na2 = _eigvec_from_cross(S - lam_a[..., None, None] * eye)
    e0 = jnp.zeros_like(va_raw).at[..., 0].set(1.0)
    ok_a = na2 > eps2
    va = jnp.where(
        ok_a[..., None], va_raw / jnp.sqrt(jnp.where(ok_a, na2, 1.0))[..., None], e0
    )

    # Orthonormal basis {b1, b2} of the complement of va.
    k = jnp.argmin(jnp.abs(va), axis=-1)
    basis = jnp.broadcast_to(eye, va.shape[:-1] + (3, 3))
    ek = jnp.take_along_axis(basis, k[..., None, None], axis=-2)[..., 0, :]
    b1 = jnp.cross(va, ek)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(va, b1)

    # 2x2 restriction M = [b1 b2]^T S [b1 b2], diagonalized in closed form.
    Sb1 = jnp.einsum("...ij,...j->...i", S, b1)
    Sb2 = jnp.einsum("...ij,...j->...i", S, b2)
    m00 = jnp.sum(b1 * Sb1, axis=-1)
    m01 = jnp.sum(b1 * Sb2, axis=-1)
    m11 = jnp.sum(b2 * Sb2, axis=-1)
    half = 0.5 * jnp.arctan2(2.0 * m01, m00 - m11)
    c, sn = jnp.cos(half), jnp.sin(half)
    u1 = c[..., None] * b1 + sn[..., None] * b2
    u2 = -sn[..., None] * b1 + c[..., None] * b2
    mu1 = c * c * m00 + 2.0 * c * sn * m01 + sn * sn * m11
    mu2 = sn * sn * m00 - 2.0 * c * sn * m01 + c * c * m11
    # Ascending order within the pair.
    swap = mu1 > mu2
    lo = jnp.where(swap, mu2, mu1)
    hi = jnp.where(swap, mu1, mu2)
    vlo = jnp.where(swap[..., None], u2, u1)
    vhi = jnp.where(swap[..., None], u1, u2)
    # Rayleigh quotient for the extracted extreme (more accurate than the
    # Cardano root once va is known).
    Sva = jnp.einsum("...ij,...j->...i", S, va)
    lam_a_r = jnp.sum(va * Sva, axis=-1)

    s = scale[..., 0, 0]
    w = jnp.where(
        max_first[..., None],
        jnp.stack([lo, hi, lam_a_r], axis=-1),
        jnp.stack([lam_a_r, lo, hi], axis=-1),
    ) * s[..., None]
    V = jnp.where(
        max_first[..., None, None],
        jnp.stack([vlo, vhi, va], axis=-1),
        jnp.stack([va, vlo, vhi], axis=-1),
    )
    return w, V


def _jacobi_sweeps(n: int) -> int:
    # Cyclic Jacobi converges quadratically; these counts give < 1e-6
    # relative off-diagonal mass in f32 for random symmetric matrices.
    if n <= 4:
        return 6
    if n <= 9:
        return 8
    return 9


@f32_matmuls
def eigh_small(A, sweeps: int | None = None):
    """Batched symmetric eigendecomposition via cyclic Jacobi.

    Args:
      A: (..., N, N) symmetric, N <= 16 (static).

    Returns:
      (w, V): eigenvalues ascending (..., N) and eigenvectors as COLUMNS
      (..., N, N) — same convention as jnp.linalg.eigh.

    Implementation: PARALLEL (tournament-ordered) Jacobi. Each round
    rotates floor(N/2) disjoint pivot pairs simultaneously: the combined
    Givens-set matrix G (block rotation over disjoint 2x2 subspaces) is
    assembled from one-hots and applied as two batched (N x N) matmuls —
    N-1 rounds per sweep instead of N(N-1)/2 sequential rotations, driven
    by one `fori_loop` over a static schedule (compiles once).
    """
    N = A.shape[-1]
    if N == 3 and sweeps is None:
        return eigh3x3(A)
    if sweeps is None:
        sweeps = _jacobi_sweeps(N)
    dtype = A.dtype
    V = jnp.broadcast_to(jnp.eye(N, dtype=dtype), A.shape).astype(dtype)
    eps = jnp.asarray(1e-20, dtype)

    # Round-robin tournament schedule: N-1 rounds of disjoint pairs.
    players = list(range(N)) if N % 2 == 0 else list(range(N)) + [-1]
    Np = len(players)
    rounds = []
    for _ in range(Np - 1):
        pr = []
        for k in range(Np // 2):
            a, b = players[k], players[Np - 1 - k]
            if a >= 0 and b >= 0:
                pr.append((min(a, b), max(a, b)))
        rounds.append(pr)
        players = [players[0]] + [players[-1]] + players[1:-1]
    n_pairs = min(len(r) for r in rounds)
    rounds = [r[:n_pairs] for r in rounds]
    ps = jnp.asarray([[p for p, _ in r] for r in rounds] * sweeps, jnp.int32)
    qs = jnp.asarray([[q for _, q in r] for r in rounds] * sweeps, jnp.int32)
    eyeN = jnp.eye(N, dtype=dtype)

    def round_rotate(k, carry):
        A, V = carry
        EP = eyeN[ps[k]]  # (K, N) one-hots
        EQ = eyeN[qs[k]]

        app = jnp.einsum("...ij,ki,kj->...k", A, EP, EP)
        aqq = jnp.einsum("...ij,ki,kj->...k", A, EQ, EQ)
        apq = jnp.einsum("...ij,ki,kj->...k", A, EP, EQ)

        small = jnp.abs(apq) < eps
        denom = jnp.where(small, 1.0, 2.0 * apq)
        tau = (aqq - app) / denom
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)  # (..., K)
        s = t * c

        # G = I + sum_k [(c_k - 1)(ep epT + eq eqT) + s_k (ep eqT - eq epT)]
        # (Golub & Van Loan sign: G[p,q] = +s, G[q,p] = -s zeroes apq under
        # G^T A G.)
        cm1 = c - 1.0
        G = (
            jnp.broadcast_to(eyeN, A.shape)
            + jnp.einsum("...k,ki,kj->...ij", cm1, EP, EP)
            + jnp.einsum("...k,ki,kj->...ij", cm1, EQ, EQ)
            + jnp.einsum("...k,ki,kj->...ij", s, EP, EQ)
            - jnp.einsum("...k,ki,kj->...ij", s, EQ, EP)
        )
        A = jnp.swapaxes(G, -1, -2) @ A @ G
        V = V @ G
        return (A, V)

    A, V = jax.lax.fori_loop(0, ps.shape[0], round_rotate, (A, V))

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def _normalize_or(v, fallback, eps=1e-12):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = n2 > eps
    safe = v / jnp.sqrt(jnp.where(ok, n2, 1.0))
    return jnp.where(ok, safe, fallback), ok[..., 0]


@f32_matmuls
def svd3x3(A):
    """Batched full SVD of general (..., 3, 3): returns (U, S, Vt) with
    descending singular values, robust to rank deficiency (minimal-set
    Kabsch covariances are often rank 2)."""
    dtype = A.dtype
    AtA = jnp.swapaxes(A, -1, -2) @ A
    lam, V = eigh_small(AtA)  # ascending
    # Descending order
    lam = lam[..., ::-1]
    V = V[..., ::-1]

    B = A @ V  # columns: sigma_i * u_i
    # Singular values as COLUMN NORMS of A V rather than sqrt(eigenvalues):
    # forming A^T A in f32 floors eigenvalues at ~eps*sigma_max^2, so
    # sqrt(lam) cannot see sigma_3 below ~sqrt(eps)*sigma_max — but with an
    # accurate v_3 (the eigh residual is ~eps), ||A v_3|| recovers it.
    S = jnp.sqrt(jnp.sum(B * B, axis=-2))
    b0, b1 = B[..., :, 0], B[..., :, 1]
    e0 = jnp.zeros_like(b0).at[..., 0].set(1.0)
    u0, ok0 = _normalize_or(b0, e0)
    # u1: orthogonalize b1 against u0; fallback = any unit vector ⊥ u0
    b1o = b1 - jnp.sum(b1 * u0, axis=-1, keepdims=True) * u0
    # fallback: cross u0 with the basis vector least aligned with it
    k = jnp.argmin(jnp.abs(u0), axis=-1)
    basis = jnp.broadcast_to(jnp.eye(3, dtype=dtype), u0.shape[:-1] + (3, 3))
    ek = jnp.take_along_axis(basis, k[..., None, None], axis=-2)[..., 0, :]
    fb1 = jnp.cross(u0, ek)
    fb1 = fb1 / jnp.linalg.norm(fb1, axis=-1, keepdims=True)
    u1, _ = _normalize_or(b1o, fb1)
    u2 = jnp.cross(u0, u1)
    # Sign of u2: match A v2 when sigma2 is nonzero.
    s2 = jnp.sum(u2 * B[..., :, 2], axis=-1)
    flip = s2 < 0
    u2 = jnp.where(flip[..., None], -u2, u2)

    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)


@f32_matmuls
def polar3x3(A):
    """Nearest rotation matrix (det +1) to A — the Kabsch projection
    U diag(1, 1, det(U V^T)) V^T."""
    U, _, Vt = svd3x3(A)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]), det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


def polar_newton3x3(A, iters=2):
    """Nearest rotation to a NEAR-ORTHOGONAL (..., 3, 3) matrix via the
    Newton polar iteration X <- (X + X^{-T}) / 2.

    X^{-T} is the cofactor matrix over the determinant (nine cross
    products) — ~30 fused element-wise ops per iteration, no matmuls, no
    eigen chain. Quadratic convergence: an input within ~0.1 of SO(3)
    (any rotation drifted by float round-off, i.e. every R produced by
    composing rotations in the tracking step) reaches f32 machine
    precision in 2 iterations. NOT safe for far-from-orthogonal inputs
    (DLT outputs, descriptor covariances): the iteration preserves the
    sign of det, so det<0 inputs converge to a reflection — those call
    sites use the SVD-based `polar3x3`.
    """
    X = A
    for _ in range(iters):
        r0 = X[..., 0, :]
        r1 = X[..., 1, :]
        r2 = X[..., 2, :]
        c0 = jnp.cross(r1, r2)
        c1 = jnp.cross(r2, r0)
        c2 = jnp.cross(r0, r1)
        det = jnp.sum(r0 * c0, axis=-1)[..., None, None]
        # inv(X)^T = cofactor(X) / det; cofactor rows are the cross
        # products of the OTHER two rows.
        inv_T = jnp.stack([c0, c1, c2], axis=-2) / jnp.where(
            jnp.abs(det) < 1e-30, 1e-30, det
        )
        X = 0.5 * (X + inv_T)
    return X


def _cholesky_factor_small(H, eps=1e-20):
    """Unrolled batched Cholesky factor of (..., N, N) SPD; returns the
    lower factor as a list-of-lists of (...,) scalars (N static)."""
    N = H.shape[-1]
    L = [[None] * N for _ in range(N)]
    for j in range(N):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        for i in range(j + 1, N):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / d
    return L


def _cholesky_solve_factored(L, g):
    """Solve L L^T x = g given the unrolled factor; g (..., N)."""
    N = len(L)
    y = [None] * N
    for i in range(N):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * N
    for i in reversed(range(N)):
        s = y[i]
        for k in range(i + 1, N):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


@f32_matmuls
def smallest_eigvec_psd(AtA, iters=3, shift_rel=1e-5):
    """Unit eigenvector of the smallest eigenvalue of a PSD (..., N, N)
    matrix via shift-and-invert iteration with one unrolled Cholesky.

    Replaces full Jacobi eigendecompositions on the DLT/8-point paths
    where ONLY the null vector is needed: their A^T A matrices have an
    exact one-dimensional nullspace (2N rows vs N+? unknowns at the
    minimal sample size), so the spectral gap after the tiny shift is
    enormous and 2 iterations converge to f32 accuracy. Cyclic Jacobi on
    9x9/12x12 costs 72-99 SEQUENTIAL rotation rounds (~1-1.3 ms on a
    v5e inside the tracking scan); this is ~N^3/3 fused element-wise ops
    plus 2 triangular solves.
    """
    N = AtA.shape[-1]
    dtype = AtA.dtype
    # Shift proportional to the matrix scale keeps the factor well-posed.
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    shift = (shift_rel * jnp.maximum(tr, 1e-30) / N)[..., None, None]
    H = AtA + shift * jnp.eye(N, dtype=dtype)
    L = _cholesky_factor_small(H)
    # Deterministic start: a fixed dense direction (never exactly
    # orthogonal to the null vector in float).
    v0 = jnp.full(AtA.shape[:-1], 1.0, dtype) / jnp.sqrt(jnp.asarray(N, dtype))
    v0 = v0 + jax.lax.broadcasted_iota(dtype, v0.shape, v0.ndim - 1) * (0.1 / N)
    v = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    for _ in range(iters):
        v = _cholesky_solve_factored(L, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def inv_spd_small(H, eps=1e-20, shift_rel=0.0):
    """Batched inverse of small SPD (..., N, N) via the unrolled Cholesky:
    factor once, solve the N identity columns (pure element-wise ops,
    N static). TPU's batched `jnp.linalg.pinv` lowers to the slow +
    inaccurate small-batched SVD custom call (CLAUDE.md) — on the RTS
    smoother's (N-1, 6, 6) P_pred inverses the SVD dominated the whole
    pass (~33 ms of the parallel smoother, BENCH_NOTES). `shift_rel` adds
    a trace-relative diagonal shift for near-singular inputs."""
    N = H.shape[-1]
    dtype = H.dtype
    if shift_rel:
        tr = jnp.trace(H, axis1=-2, axis2=-1)
        H = H + (shift_rel * jnp.maximum(tr, 1e-30) / N)[..., None, None] * jnp.eye(
            N, dtype=dtype
        )
    L = _cholesky_factor_small(H, eps)
    eye = jnp.eye(N, dtype=dtype)
    cols = [_cholesky_solve_factored(L, eye[j]) for j in range(N)]
    return jnp.stack(cols, axis=-1)


def cholesky_solve_small(H, g, eps=1e-20):
    """Solve H x = g for small SPD H (..., N, N) with N <= ~8, batched.

    Fully unrolled Cholesky + triangular solves as pure element-wise ops:
    XLA's `linalg.solve` lowers tiny systems to a sequential LU custom
    call whose latency (not FLOPs) dominates — inside the 8-iteration GN
    pose refine that runs every frame, the unrolled form is the cheap one.
    N is static (from the shape); ~N^3/3 scalar ops total.
    """
    return _cholesky_solve_factored(_cholesky_factor_small(H, eps), g)


@f32_matmuls
def svd4x4_nullvec(A):
    """Smallest right singular vector of (..., 4, 4) via shift-and-invert
    on A^T A (triangulation DLT only needs the null vector; the two-view
    DLT system has an exact null direction — the homogeneous point)."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    return smallest_eigvec_psd(AtA)
