"""SO(3)/SE(3) utilities: hat/vee, exp/log, quaternions, composition.

The reference leans on `cv::Rodrigues` and ad-hoc 3x3 `cv::Mat` algebra
(e.g. `/root/reference/src/Optimizer.cpp:26-52`, `src/main.cpp:404-430`
rotation->quaternion). Here the group ops are closed-form, batched
(leading axes broadcast) and differentiable.

Conventions:
- Rotations are 3x3 matrices `R`, translations are 3-vectors `t`.
- A pose `(R, t)` is camera-to-world: `x_w = R @ x_c + t`.
- Quaternions are `(qx, qy, qz, qw)` (TUM trajectory order,
  `src/main.cpp:432-446`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp_so3(w):
    """Rodrigues formula: axis-angle (..., 3) -> rotation (..., 3, 3).

    Taylor-safe at theta -> 0 (matches cv::Rodrigues semantics).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    # Wide series window: f32 loses (1-cos) entirely below theta ~ 3e-4 and
    # to cancellation below ~3e-2; series are MORE accurate there.
    small = theta2 < 1e-3
    # Double-where: sqrt sees only safe values so its grad stays finite.
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2; (1-cos) via the cancellation-free
    # half-angle identity 2 sin^2(t/2).
    a = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    sh = jnp.sin(theta * 0.5)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
        2.0 * sh * sh / jnp.where(small, 1.0, theta2)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Gradient-safe formulation (used under `jax.jacrev` by the PGO/BA
    solvers, where residuals sit at theta ~ 0): theta from atan2 instead
    of arccos, and every `where` branch evaluates finite on both sides
    (double-where guards) so reverse-mode AD never sees inf * 0.
    """
    a = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # sin(theta) * axis
    s2 = jnp.sum(a * a, axis=-1)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    s_safe = jnp.sqrt(jnp.where(s2 < 1e-3, 1.0, s2))
    sin_t = jnp.where(s2 < 1e-3, jnp.sqrt(jnp.maximum(s2, 0.0) + 1e-20), s_safe)
    theta = jnp.arctan2(sin_t, cos_t)
    # sin(theta) is also tiny near theta = pi: only treat as "small angle"
    # when cos(theta) > 0.
    small = (s2 < 1e-3) & (cos_t > 0.0)
    # theta/sin(theta) = 1 + s^2/6 + 3 s^4/40 + ... (series in s = sin theta)
    factor = jnp.where(small, 1.0 + s2 / 6.0 + 0.075 * s2 * s2, theta / s_safe)
    w_generic = a * factor[..., None]
    w_small = a
    # Near pi: use diagonal of (R + I)/2 = w w^T / theta^2 trick
    B = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis = jnp.sqrt(jnp.maximum(diag, 1e-12))  # floored: finite grad at 0
    # Fix signs from off-diagonals relative to the largest-axis component
    k = jnp.argmax(axis, axis=-1)

    def _sign_fix(axis, B, k):
        s01 = jnp.sign(B[0, 1])
        s02 = jnp.sign(B[0, 2])
        s12 = jnp.sign(B[1, 2])
        s01 = jnp.where(s01 == 0, 1.0, s01)
        s02 = jnp.where(s02 == 0, 1.0, s02)
        s12 = jnp.where(s12 == 0, 1.0, s12)
        branches = jnp.stack(
            [
                jnp.stack([axis[0], s01 * axis[1], s02 * axis[2]]),
                jnp.stack([s01 * axis[0], axis[1], s12 * axis[2]]),
                jnp.stack([s02 * axis[0], s12 * axis[1], axis[2]]),
            ]
        )
        return branches[k]

    fix = _sign_fix
    for _ in range(R.ndim - 2):
        fix = jax.vmap(fix)
    axis_fixed = fix(axis, B, k)
    w_pi = axis_fixed * theta[..., None]

    near_pi = theta > jnp.pi - 1e-3
    return jnp.where(
        small[..., None], w_small, jnp.where(near_pi[..., None], w_pi, w_generic)
    )


def quat_from_matrix(R):
    """(..., 3, 3) -> quaternion (..., 4) as (qx, qy, qz, qw), qw >= 0.

    Shepperd's method (branch-free via where), matching the conversion used
    for TUM export in the reference (`src/main.cpp:404-430`).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], axis=-1) / (
        4.0 * qw0[..., None]
    )

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q1 = jnp.stack(
        [4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx1[..., None])

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy2[..., None])

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], axis=-1
    ) / (4.0 * qz3[..., None])

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def matrix_from_quat(q):
    """Quaternion (qx, qy, qz, qw) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


# ----------------------------------------------------------------------------
# Rigid transforms as (R, t) pairs
# ----------------------------------------------------------------------------


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) ∘ (Rb, tb): apply b then a. x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t):
    """Inverse rigid transform."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def rotate_rows(R, pts):
    """pts @ R^T (i.e. R applied to each row) as explicit broadcast
    arithmetic. Exact f32 on the VPU — under the tracking step's f32
    matmul pin, a tiny (N, 3) x (3, 3) MXU matmul costs 6 bf16 passes of
    pure latency; the elementwise form is both cheaper and exact.
    Broadcasts batched R (..., 3, 3) against (..., N, 3) points."""
    return (
        pts[..., 0:1] * R[..., None, :, 0]
        + pts[..., 1:2] * R[..., None, :, 1]
        + pts[..., 2:3] * R[..., None, :, 2]
    )


def transform_points(R, t, pts):
    """Apply (R, t) to points (..., N, 3)."""
    return rotate_rows(R, pts) + t[..., None, :]


def relative(Ra, ta, Rb, tb):
    """T_a^{-1} ∘ T_b : pose of b expressed in a's frame."""
    Rai, tai = inverse(Ra, ta)
    return compose(Rai, tai, Rb, tb)


def exp_se3(xi):
    """se(3) exp: (..., 6) [rho, phi] -> (R, t). Left Jacobian closed form.

    Gradient-safe at theta = 0 (double-where on the sqrt)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-3
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    W = hat(phi)
    W2 = W @ W
    sh = jnp.sin(theta * 0.5)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
        2.0 * sh * sh / jnp.where(small, 1.0, theta2)
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    return R, (V @ rho[..., None])[..., 0]


def log_se3(R, t):
    """(R, t) -> se(3) vector (..., 6) [rho, phi]."""
    phi = log_so3(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    # f32: (1 - a/(2b)) cancels catastrophically for theta < ~0.03; the
    # series 1/12 + theta^2/720 is exact to 1e-9 there.
    small = theta2 < 1e-3
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    W = hat(phi)
    W2 = W @ W
    # V^{-1} = I - W/2 + coef W^2; a = sin/theta, b = 2 sin^2(t/2)/theta^2
    a = jnp.sin(theta) / theta
    sh = jnp.sin(theta * 0.5)
    b = 2.0 * sh * sh / jnp.where(small, 1.0, theta2)
    b = jnp.where(small, 0.5, b)  # placeholder, unused in small branch
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / jnp.where(small, 1.0, theta2),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def orthonormalize(R):
    """Project a near-rotation onto SO(3) (det +1 enforced) via the
    batched polar decomposition (ops.linalg.polar3x3). Safe for any
    input (handles det<0 by flipping the smallest singular direction)."""
    from vslam_tpu.ops import linalg

    return linalg.polar3x3(R)


def renormalize_rotation(R):
    """Cheap SO(3) re-projection for rotations that are ALREADY near-
    orthogonal (float drift from composing rotations): 2 Newton polar
    iterations, ~60 fused element-wise ops, no eigen chain — ~4x cheaper
    in scan latency than the analytic SVD. Use `orthonormalize` for
    anything that might be far from a rotation (DLT/Kabsch raw output)."""
    from vslam_tpu.ops import linalg

    return linalg.polar_newton3x3(R)


def identity_pose(dtype=jnp.float32, batch=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch, 3, 3))
    t = jnp.zeros((*batch, 3), dtype=dtype)
    return R, t
