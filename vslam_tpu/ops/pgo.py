"""SE(3) pose-graph optimization — the g2o replacement.

Rebuilds `Optimizer::pose_graph_optimize` (`/root/reference/src/
Optimizer.cpp:654-863`): SE3 vertex per keyframe (first fixed), odometry
edges between consecutive keyframes with sigma-derived information,
loop-closure edges, and the custom unary gravity-height prior edge
(`EdgeHeightPrior`, `Optimizer.cpp:604-621`). g2o's sparse LM becomes a
dense damped Gauss-Newton on TPU: residuals are batched closed-form se(3)
logs, Jacobians come from one `jax.jacrev` over the stacked perturbation
array, and the (6V x 6V) normal system (V <= 128 keyframes) is a single
Cholesky solve — small enough that dense beats sparse bookkeeping on the
MXU by a wide margin.

Also provides the trajectory / map-point correction passes
(`Optimizer.cpp:795-859`): non-keyframe poses move by time-interpolated
keyframe deltas; map points by their owning keyframe's delta.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.ops import se3


class PGOProblem(NamedTuple):
    # Vertices
    R: jnp.ndarray  # (V, 3, 3) initial keyframe rotations (cam-to-world)
    t: jnp.ndarray  # (V, 3)
    v_valid: jnp.ndarray  # (V,)
    # Binary edges: measurement T_ij (pose of j in i's frame)
    e_i: jnp.ndarray  # (E,) int32
    e_j: jnp.ndarray  # (E,) int32
    e_R: jnp.ndarray  # (E, 3, 3)
    e_t: jnp.ndarray  # (E, 3)
    e_info: jnp.ndarray  # (E, 6) diagonal information (trans x3, rot x3)
    e_valid: jnp.ndarray  # (E,)
    # Height prior
    gravity: jnp.ndarray  # (3,)
    height: jnp.ndarray  # ()
    height_info: jnp.ndarray  # ()
    height_on: jnp.ndarray  # () bool


def build_odometry_edges(R, t, valid, frame_id, trans_sigma, rot_sigma):
    """Consecutive-keyframe odometry edges with measured relative poses
    (`Optimizer.cpp:703-719`).

    Keyframes live in a RING buffer: once the ring wraps, slot order no
    longer equals temporal order, so vertices are sorted by source frame
    id first — otherwise a tight-sigma odometry edge would link the newest
    and oldest keyframes and corrupt the whole graph.
    """
    V = R.shape[0]
    big = jnp.iinfo(jnp.int32).max
    order = jnp.argsort(jnp.where(valid, frame_id, big)).astype(jnp.int32)
    i = order[:-1]
    j = order[1:]
    Ri, ti = R[i], t[i]
    Rj, tj = R[j], t[j]
    R_rel, t_rel = se3.relative(Ri, ti, Rj, tj)
    info = jnp.tile(
        jnp.concatenate(
            [
                jnp.full(3, 1.0 / trans_sigma**2, R.dtype),
                jnp.full(3, 1.0 / rot_sigma**2, R.dtype),
            ]
        )[None],
        (V - 1, 1),
    )
    e_valid = valid[i] & valid[j]
    return i, j, R_rel, t_rel, info, e_valid


def _residuals(xi, prob: PGOProblem):
    """All stacked residuals given per-vertex perturbations xi (V, 6).

    Perturbed vertex: T_v' = exp(xi_v) ∘ T_v (left perturbation).
    Edge residual: log( T_meas^{-1} ∘ (T_i'^{-1} T_j') )  (6,)
    Height residual: g·t_i' - h  (1,)
    """
    dR, dt = se3.exp_se3(xi)
    R_new = dR @ prob.R
    t_new = (dR @ prob.t[..., None])[..., 0] + dt

    Ri = R_new[prob.e_i]
    ti = t_new[prob.e_i]
    Rj = R_new[prob.e_j]
    tj = t_new[prob.e_j]
    R_ij, t_ij = se3.relative(Ri, ti, Rj, tj)
    R_err, t_err = se3.compose(*se3.inverse(prob.e_R, prob.e_t), R_ij, t_ij)
    r_edge = se3.log_se3(R_err, t_err)  # (E, 6)
    r_edge = r_edge * jnp.sqrt(prob.e_info) * prob.e_valid[:, None]

    r_h = (t_new @ prob.gravity - prob.height) * jnp.sqrt(prob.height_info)
    r_h = r_h * prob.height_on * prob.v_valid  # (V,)
    return jnp.concatenate([r_edge.reshape(-1), r_h])


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize(prob: PGOProblem, iterations: int = 20, damping: float = 1e-6):
    """Damped Gauss-Newton over all vertices; vertex 0 fixed
    (`Optimizer.cpp:668-700` fixes the first KF). Returns (R, t) optimized."""
    V = prob.R.shape[0]
    dtype = prob.R.dtype

    def body(_, carry):
        R_cur, t_cur = carry
        p = prob._replace(R=R_cur, t=t_cur)
        xi0 = jnp.zeros((V, 6), dtype)
        r = _residuals(xi0, p)
        J = jax.jacrev(_residuals)(xi0, p)  # (Nr, V, 6)
        Nr = r.shape[0]
        J = J.reshape(Nr, V * 6)
        # Gauge fix: zero out vertex 0 columns
        mask = jnp.ones(V * 6, dtype).at[:6].set(0.0)
        # Also freeze invalid vertices
        vmask = jnp.repeat(prob.v_valid.astype(dtype), 6)
        mask = mask * vmask
        J = J * mask[None, :]
        H = J.T @ J + (damping + 1e-8) * jnp.eye(V * 6, dtype=dtype)
        g = J.T @ r
        # Fixed/invalid rows get identity to stay zero.
        delta = -jnp.linalg.solve(H + jnp.diag(1.0 - mask), g)
        delta = (delta * mask).reshape(V, 6)
        dR, dt = se3.exp_se3(delta)
        R_next = dR @ R_cur
        t_next = (dR @ t_cur[..., None])[..., 0] + dt
        return (se3.orthonormalize(R_next), t_next)

    R_out, t_out = jax.lax.fori_loop(0, iterations, body, (prob.R, prob.t))
    return R_out, t_out


@jax.jit
def correct_trajectory(frame_ids, frame_R, frame_t, kf_frame_ids, kf_valid,
                       kf_R_old, kf_t_old, kf_R_new, kf_t_new):
    """Apply keyframe deltas to all frames, interpolating between keyframes
    (`Optimizer.cpp:795-827`): for a frame between KF a and b (by frame
    id), delta translation is lerped; the frame's own pose shifts by it.

    All arrays are device arrays; frames exactly at keyframes receive the
    full delta. Frames before the first / after the last keyframe use the
    nearest keyframe's delta.
    """
    d_t = kf_t_new - kf_t_old  # (V, 3)
    big = jnp.iinfo(jnp.int32).max
    kf_ids = jnp.where(kf_valid, kf_frame_ids, big)
    order = jnp.argsort(kf_ids)
    kf_ids_s = kf_ids[order]
    d_t_s = d_t[order]
    n_kf = jnp.sum(kf_valid)

    idx = jnp.searchsorted(kf_ids_s, frame_ids, side="right") - 1
    lo = jnp.clip(idx, 0, n_kf - 1)
    hi = jnp.clip(idx + 1, 0, n_kf - 1)
    id_lo = kf_ids_s[lo]
    id_hi = kf_ids_s[hi]
    denom = jnp.maximum(id_hi - id_lo, 1)
    alpha = jnp.clip((frame_ids - id_lo) / denom, 0.0, 1.0)
    delta = d_t_s[lo] * (1.0 - alpha[:, None]) + d_t_s[hi] * alpha[:, None]
    return frame_R, frame_t + delta


@jax.jit
def correct_map_points(points, point_kf, kf_valid, kf_R_old, kf_t_old, kf_R_new, kf_t_new):
    """Move map points rigidly with their owning keyframe
    (`Optimizer.cpp:829-859`): X' = T_new ∘ T_old^{-1} ∘ X."""
    Ro_inv, to_inv = se3.inverse(kf_R_old, kf_t_old)
    Rd, td = se3.compose(kf_R_new, kf_t_new, Ro_inv, to_inv)  # (V, 3, 3)
    k = jnp.clip(point_kf, 0, kf_R_old.shape[0] - 1)
    moved = (Rd[k] @ points[..., None])[..., 0] + td[k]
    use = kf_valid[k]
    return jnp.where(use[:, None], moved, points)
