"""6-state (position + velocity) EKF and RTS backward smoother.

TPU-native rebuild of the reference filter (`/root/reference/src/Slam.cpp:
1654-1744` predict/update/height, `:986-1047` gating/clamp/snapshots,
`:1761-1810` RTS). The per-frame filter is a pure function suitable for
`lax.scan`; the smoother ships in two equivalent forms: a backward
`lax.scan` (reference parity) and a parallel-in-time `associative_scan`
composition of the affine backward recursion (`rts_smooth_assoc`, the
default — log-depth batched 6x6 matmuls, SURVEY §5's long-sequence
formulation). All 6x6 algebra is closed-form f32 — no host round trips.

State layout: x = [px, py, pz, vx, vy, vz], P (6, 6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EKFState(NamedTuple):
    x: jnp.ndarray  # (6,)
    P: jnp.ndarray  # (6, 6)
    initialized: jnp.ndarray  # () bool
    last_time: jnp.ndarray  # () f32


class EKFSnapshot(NamedTuple):
    """Per-frame snapshot for the RTS smoother (`Slam.h:215-223`)."""

    x_pred: jnp.ndarray  # (6,)
    P_pred: jnp.ndarray  # (6, 6)
    x_filt: jnp.ndarray  # (6,)
    P_filt: jnp.ndarray  # (6, 6)
    dt: jnp.ndarray  # ()
    frame_id: jnp.ndarray  # () int32


def initialize(pos, timestamp, dtype=jnp.float32):
    """`ekf_initialize` (`Slam.cpp:1654-1665`): P = diag(1e-3 x3, 1e-2 x3)."""
    x = jnp.concatenate([pos.astype(dtype), jnp.zeros(3, dtype)])
    P = jnp.diag(jnp.array([1e-3] * 3 + [1e-2] * 3, dtype=dtype))
    return EKFState(x, P, jnp.asarray(True), jnp.asarray(timestamp, dtype))


def _transition(dt, decay, dtype):
    F = jnp.eye(6, dtype=dtype)
    F = F.at[:3, 3:].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[3:, 3:].set(jnp.eye(3, dtype=dtype) * decay)
    return F


def _bmm(a, b):
    """Small-matrix matmul as broadcast arithmetic (exact f32, VPU).

    The tracking step pins f32 matmul precision, under which a tiny MXU
    matmul costs ~6 bf16 passes of pure latency (CLAUDE.md); the EKF
    chain strings ~15 of them back to back. The elementwise form fuses
    into the surrounding ops and never touches the MXU."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _mv(a, v):
    """Matrix-vector product in broadcast arithmetic: (m, k) @ (k,)."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def _inv_spd_small(S):
    """Analytic inverse for the (1,1)/(3,3) innovation covariances —
    closed form, no LU/solve kernel launch."""
    if S.shape[-1] == 1:
        return 1.0 / S
    a, b, c = S[0, 0], S[0, 1], S[0, 2]
    d, e, f = S[1, 0], S[1, 1], S[1, 2]
    g, h, i = S[2, 0], S[2, 1], S[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack(
        [jnp.stack([A, B, C]), jnp.stack([D, E, F]), jnp.stack([G, H, I])]
    )
    return adj / det


def predict(state: EKFState, dt, sigma_a=1.0, decay=0.95):
    """Constant-velocity predict with velocity decay (`Slam.cpp:1668-1695`).

    Skipped (identity) when dt <= 0 or dt >= 1 (`Slam.cpp:993-996`).
    """
    dtype = state.x.dtype
    do = (dt > 0.0) & (dt < 1.0) & state.initialized
    dts = jnp.where(do, dt, 0.0).astype(dtype)

    F = _transition(dts, jnp.where(do, decay, 1.0).astype(dtype), dtype)
    x_new = _mv(F, state.x)
    I3 = jnp.eye(3, dtype=dtype)
    q11 = 0.25 * dts**4 * sigma_a**2
    q12 = 0.5 * dts**3 * sigma_a**2
    q22 = dts**2 * sigma_a**2
    Q = jnp.block([[q11 * I3, q12 * I3], [q12 * I3, q22 * I3]])
    P_new = _bmm(_bmm(F, state.P), F.T) + Q
    return state._replace(x=x_new, P=P_new)


def _joseph_update(x, P, y, H, Rm):
    """Joseph-form measurement update (`Slam.cpp:1701-1720`).

    All products in broadcast arithmetic (`_bmm`) with the analytic
    small-matrix inverse — the update is exact f32 and MXU-free."""
    S = _bmm(_bmm(H, P), H.T) + Rm
    K = _bmm(_bmm(P, H.T), _inv_spd_small(S))
    x_new = x + _mv(K, y)
    IKH = jnp.eye(6, dtype=x.dtype) - _bmm(K, H)
    P_new = _bmm(_bmm(IKH, P), IKH.T) + _bmm(_bmm(K, Rm), K.T)
    return x_new, P_new


def update_visual(state: EKFState, z_pos, sigma_vis, enabled=True):
    """3D position measurement update with scalar sigma."""
    dtype = state.x.dtype
    H = jnp.zeros((3, 6), dtype=dtype).at[:, :3].set(jnp.eye(3, dtype=dtype))
    Rm = jnp.eye(3, dtype=dtype) * (sigma_vis**2)
    y = z_pos - state.x[:3]
    x_new, P_new = _joseph_update(state.x, state.P, y, H, Rm)
    on = enabled & state.initialized
    return state._replace(
        x=jnp.where(on, x_new, state.x), P=jnp.where(on, P_new, state.P)
    )


def update_visual_gated(state: EKFState, z_pos, sigma_vis, gate=0.3, enabled=True):
    """Innovation gating (`Slam.cpp:1005-1013`): past the gate, the update
    still runs but with sigma = innovation * 0.5 (soft deweighting)."""
    innovation = jnp.linalg.norm(z_pos - state.x[:3])
    sigma = jnp.where(innovation < gate, sigma_vis, innovation * 0.5)
    return update_visual(state, z_pos, sigma, enabled=enabled)


def update_height(state: EKFState, gravity_world, h_target, sigma_h, enabled=True):
    """Scalar height update along gravity (`Slam.cpp:1724-1744`)."""
    dtype = state.x.dtype
    H = jnp.zeros((1, 6), dtype=dtype).at[0, :3].set(gravity_world)
    Rm = jnp.array([[sigma_h**2]], dtype=dtype)
    h_pred = jnp.dot(gravity_world, state.x[:3])
    y = jnp.array([h_target], dtype=dtype) - h_pred
    x_new, P_new = _joseph_update(state.x, state.P, y, H, Rm)
    on = enabled & state.initialized
    return state._replace(
        x=jnp.where(on, x_new, state.x), P=jnp.where(on, P_new, state.P)
    )


def clamp_step(state: EKFState, prev_pos, dt, max_step=0.10):
    """Per-frame position step clamp + velocity rewrite (`Slam.cpp:1026-1037`).

    Returns (state, clamped_pos).
    """
    delta = state.x[:3] - prev_pos
    step = jnp.linalg.norm(delta)
    clamp = (step > max_step) & (step > 1e-6)
    scale = jnp.where(clamp, max_step / jnp.maximum(step, 1e-9), 1.0)
    delta_c = delta * scale
    pos_c = prev_pos + delta_c
    dt_frame = jnp.maximum(0.01, dt)
    vel_c = delta_c / dt_frame
    x_new = jnp.where(
        clamp, jnp.concatenate([pos_c, vel_c]), state.x
    )
    return state._replace(x=x_new), x_new[:3]


def rts_smooth(snapshots: EKFSnapshot, valid, decay=0.95):
    """Rauch-Tung-Striebel backward smoother over stacked snapshots.

    Reference: `Slam.cpp:1761-1810`. Arrays are (N, ...) stacked scan
    outputs; `valid` masks frames that produced a snapshot. Runs as one
    backward `lax.scan`; the SVD-based inverse of P_pred becomes a
    pseudo-inverse via `jnp.linalg.pinv` for parity with cv::DECOMP_SVD.

    Returns smoothed positions (N, 3) (velocity rows are smoothed too but
    only positions are written back to poses, as in the reference).
    """
    N = snapshots.dt.shape[0]
    dtype = snapshots.x_filt.dtype

    def backward(carry, inp):
        x_next_s, P_next_s = carry
        snap_k, snap_next, valid_k = inp
        F = _transition(snap_next.dt, jnp.asarray(decay, dtype), dtype)
        P_pred_inv = jnp.linalg.pinv(snap_next.P_pred)
        C = snap_k.P_filt @ F.T @ P_pred_inv
        x_s = snap_k.x_filt + C @ (x_next_s - snap_next.x_pred)
        P_s = snap_k.P_filt + C @ (P_next_s - snap_next.P_pred) @ C.T
        x_s = jnp.where(valid_k, x_s, snap_k.x_filt)
        P_s = jnp.where(valid_k, P_s, snap_k.P_filt)
        return (x_s, P_s), (x_s, P_s)

    # Elements k = N-2 .. 0, each paired with snapshot k+1.
    snap_k = jax.tree.map(lambda a: a[: N - 1], snapshots)
    snap_next = jax.tree.map(lambda a: a[1:], snapshots)
    init = (snapshots.x_filt[N - 1], snapshots.P_filt[N - 1])
    (_, _), (xs, _) = jax.lax.scan(
        backward, init, (snap_k, snap_next, valid[: N - 1]), reverse=True
    )
    x_smooth = jnp.concatenate([xs, snapshots.x_filt[N - 1 :]], axis=0)
    return x_smooth[:, :3]


def rts_smooth_assoc(snapshots: EKFSnapshot, valid, decay=0.95):
    """Parallel-in-time RTS smoother via `lax.associative_scan`.

    Same recursion as `rts_smooth` (`Slam.cpp:1761-1810`), exploited as an
    affine map: with gain C_k = P_filt[k] F_{k+1}^T pinv(P_pred[k+1]), the
    smoothed mean obeys

        x_s[k] = a_k + A_k x_s[k+1],
        A_k = valid[k] ? C_k : 0,   a_k = x_filt[k] - A_k x_pred[k+1]

    (A_k = 0 reproduces the sequential smoother's `where(valid, ., x_filt)`
    masking exactly). Affine maps compose associatively, so the backward
    recursion becomes a suffix `associative_scan` of 6x6 compositions:
    log-depth batched MXU matmuls instead of an N-step sequential scan —
    the long-sequence formulation SURVEY §5 calls for. The gains (batched
    pinv + two batched matmuls) are computed once, outside the scan.

    Returns smoothed positions (N, 3), matching `rts_smooth` to float
    round-off (the composition reassociates the float ops).
    """
    N = snapshots.dt.shape[0]
    if N == 1:
        return snapshots.x_filt[:, :3]
    dtype = snapshots.x_filt.dtype

    F = jax.vmap(lambda dt: _transition(dt, jnp.asarray(decay, dtype), dtype))(
        snapshots.dt[1:]
    )
    # P_pred is SPD by construction (Joseph-form updates + Q >= 0), so the
    # gains use the unrolled batched Cholesky inverse: TPU's batched
    # small-matrix SVD (what pinv lowers to) is slow AND inaccurate
    # (CLAUDE.md) and dominated this pass (~33 ms of the 896-frame
    # smoother, BENCH_NOTES). The sequential `rts_smooth` keeps SVD-pinv
    # for cv::DECOMP_SVD parity (`Slam.cpp:1761-1810`).
    #
    # STRICT-PD REQUIREMENT (ADVICE r4): unlike pinv — which zeroes a
    # (near-)singular P_pred's null subspace and so produces zero gain
    # along it — the clamped Cholesky inverse yields a huge gain there,
    # amplifying noise instead of suppressing it. The predict step's
    # process noise keeps every state dimension strictly positive
    # (Q = sigma_a^2 * [dt^4/4, dt^2] blocks with the EKFConfig default
    # sigma_a = 1.0 and dt > 0; dt == 0 frames reuse the previous P
    # plus the identity-decay term), so P_pred stays comfortably PD in
    # this filter. The gain clamp below is the belt-and-braces guard: a
    # conditioning regression degrades toward the plain filtered track
    # (|C| bounded) rather than exploding.
    from vslam_tpu.ops.linalg import inv_spd_small

    P_pred_inv = inv_spd_small(snapshots.P_pred[1:], shift_rel=1e-7)
    C = jnp.einsum(
        "nij,nkj,nkl->nil", snapshots.P_filt[: N - 1], F, P_pred_inv
    )
    # Smoother gains of a sane CV filter have spectral radius <~ 1; a
    # blown-up inverse (near-singular P_pred) shows up as entries far
    # above that. Clamp elementwise so failure degrades gracefully.
    C = jnp.clip(C, -8.0, 8.0)
    A = jnp.where(valid[: N - 1, None, None], C, jnp.zeros((), dtype))
    a = snapshots.x_filt[: N - 1] - jnp.einsum(
        "nij,nj->ni", A, snapshots.x_pred[1:]
    )

    def combine(hi, lo):
        # Under reverse=True the scan order is descending index, so the
        # FIRST argument is the composition of higher-index maps and the
        # second is the lower-index element; result = lo ∘ hi (the
        # higher-index map feeds the lower one, as in the backward
        # recursion). Function composition is associative.
        A_hi, a_hi = hi
        A_lo, a_lo = lo
        return (
            jnp.einsum("...ij,...jk->...ik", A_lo, A_hi),
            a_lo + jnp.einsum("...ij,...j->...i", A_lo, a_hi),
        )

    A_cum, a_cum = jax.lax.associative_scan(combine, (A, a), reverse=True)
    x_term = snapshots.x_filt[N - 1]
    xs = a_cum + jnp.einsum("nij,j->ni", A_cum, x_term)
    x_smooth = jnp.concatenate([xs, snapshots.x_filt[N - 1 :]], axis=0)
    return x_smooth[:, :3]
