"""Sliding-window bundle adjustment with sparse Schur complement.

Rebuilds the reference's hand-rolled Schur BA (`/root/reference/src/
Optimizer.cpp:187-599`): last-W keyframes + covisible points, Huber
delta = 5 px, LM damping, Schur reduction S = Hpp - Hpm Hmm^-1 Hpm^T,
pose solve + point back-substitution, first pose fixed.

TPU-native formulation: observations live in a dense (W, P) grid with a
validity mask (W <= 10 poses, P <= 2048 points — the reference's sparse
bookkeeping, `Optimizer.cpp:297-380`, is replaced by masked batched
einsums that map straight onto the MXU). All Jacobians are analytic; the
block structure is exploited exactly as in the reference:

  Hpp: (W, 6, 6) block-diagonal     Hmm: (P, 3, 3) block-diagonal
  Hpm: (W, P, 6, 3) dense blocks    S: (6W, 6W) dense Cholesky solve

The LM loop runs a fixed iteration count with accept/reject damping in
the carry (jit-stable control flow).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.ops import se3


class BAProblem(NamedTuple):
    # Poses: camera-to-world (window of keyframes)
    R: jnp.ndarray  # (W, 3, 3)
    t: jnp.ndarray  # (W, 3)
    pose_valid: jnp.ndarray  # (W,)
    # Points
    X: jnp.ndarray  # (P, 3)
    point_valid: jnp.ndarray  # (P,)
    # Dense observation grid
    uv: jnp.ndarray  # (W, P, 2)
    obs_valid: jnp.ndarray  # (W, P)
    # Intrinsics
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def _odo_residual(xi_i, xi_j, Rcw_i, tcw_i, Rcw_j, tcw_j, mR, mt, sqinfo):
    """Weighted relative-pose (odometry) residual between two poses under
    BA's delta convention (dp[:3] = rotation w, dp[3:] = translation dt,
    perturbing the WORLD->CAM transform — see bundle_adjust.apply_delta).

    Reprojection alone leaves long-wavelength bending modes of a keyframe
    chain nearly unconstrained — pixel noise then moves whole pose runs
    coherently by centimeters. The tracker's frame-to-frame odometry is
    the measurement that pins those modes (the reference fuses the same
    information through its PGO odometry edges, `Optimizer.cpp:700-737`);
    here it enters the BA normal equations directly as a relative-pose
    prior toward the initial chain geometry.
    """
    dRi = se3.exp_so3(xi_i[:3])
    Ri2 = dRi @ Rcw_i
    ti2 = (dRi @ tcw_i[..., None])[..., 0] + xi_i[3:]
    dRj = se3.exp_so3(xi_j[:3])
    Rj2 = dRj @ Rcw_j
    tj2 = (dRj @ tcw_j[..., None])[..., 0] + xi_j[3:]
    # Current relative transform T_j ∘ T_i^{-1} vs the measured one.
    R_rel, t_rel = se3.compose(Rj2, tj2, *se3.inverse(Ri2, ti2))
    R_err, t_err = se3.compose(*se3.inverse(mR, mt), R_rel, t_rel)
    return se3.log_se3(R_err, t_err) * sqinfo


def _odo_chi2(R, t, mR, mt, edge_w, sqinfo):
    """Weighted odometry-edge chi^2 at (R, t) — no Jacobians (for LM
    candidate evaluation)."""
    Wn = R.shape[0]
    Rcw = jnp.swapaxes(R, -1, -2)
    tcw = -(Rcw @ t[..., None])[..., 0]
    zeros6 = jnp.zeros((Wn - 1, 6), t.dtype)
    sq = jnp.broadcast_to(sqinfo, (Wn - 1, 6))
    r_o = jax.vmap(_odo_residual)(
        zeros6, zeros6, Rcw[:-1], tcw[:-1], Rcw[1:], tcw[1:], mR, mt, sq
    )
    return jnp.sum(r_o**2 * edge_w[:, None])


def _odo_system(R, t, mR, mt, edge_w, sqinfo):
    """Linearize the consecutive-pose odometry edges at the CURRENT poses
    and assemble their dense (W, W, 6, 6) Hessian + (W, 6) gradient
    contributions (added to the Schur-reduced pose system)."""
    Wn = R.shape[0]
    dtype = t.dtype
    Rcw = jnp.swapaxes(R, -1, -2)
    tcw = -(Rcw @ t[..., None])[..., 0]
    zeros6 = jnp.zeros((Wn - 1, 6), dtype)
    args = (zeros6, zeros6, Rcw[:-1], tcw[:-1], Rcw[1:], tcw[1:], mR, mt)
    sq = jnp.broadcast_to(sqinfo, (Wn - 1, 6))
    r_o = jax.vmap(_odo_residual)(*args, sq)
    Ji, Jj = jax.vmap(jax.jacrev(_odo_residual, argnums=(0, 1)))(*args, sq)
    H_ii = jnp.einsum("eri,erj,e->eij", Ji, Ji, edge_w)
    H_jj = jnp.einsum("eri,erj,e->eij", Jj, Jj, edge_w)
    H_ij = jnp.einsum("eri,erj,e->eij", Ji, Jj, edge_w)
    g_i = jnp.einsum("eri,er,e->ei", Ji, r_o, edge_w)
    g_j = jnp.einsum("eri,er,e->ei", Jj, r_o, edge_w)
    idx = jnp.arange(Wn - 1)
    H = jnp.zeros((Wn, Wn, 6, 6), dtype)
    H = H.at[idx, idx].add(H_ii)
    H = H.at[idx + 1, idx + 1].add(H_jj)
    H = H.at[idx, idx + 1].add(H_ij)
    H = H.at[idx + 1, idx].add(jnp.swapaxes(H_ij, -1, -2))
    g = jnp.zeros((Wn, 6), dtype)
    g = g.at[:-1].add(g_i)
    g = g.at[1:].add(g_j)
    chi2 = jnp.sum(r_o**2 * edge_w[:, None])
    return H, g, chi2


def _project_residuals(R, t, X, prob: BAProblem):
    """Residuals r (W, P, 2), plus camera-frame points for Jacobians.

    Behind-camera points keep a (huge, z-clamped) residual instead of
    being masked: the LM accept test must compare costs over the SAME
    observation set, otherwise a step that pushes points behind the
    camera "wins" by dropping their residuals (`Optimizer.cpp:331-336`
    skips z<=0 during linearization, but its cost uses fixed chi2 too).
    """
    R_cw = jnp.swapaxes(R, -1, -2)
    t_cw = -(R_cw @ t[..., None])[..., 0]
    # p[w, p] = R_cw[w] X[p] + t_cw[w]
    p = jnp.einsum("wij,pj->wpi", R_cw, X) + t_cw[:, None, :]
    z = jnp.maximum(p[..., 2], 1e-2)
    u = prob.fx * p[..., 0] / z + prob.cx
    v = prob.fy * p[..., 1] / z + prob.cy
    r = jnp.stack([u - prob.uv[..., 0], v - prob.uv[..., 1]], axis=-1)
    in_front = p[..., 2] > 1e-2
    return r, p, in_front


def _huber_weights(r, obs_mask, delta):
    rn = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(rn <= delta, 1.0, delta / jnp.maximum(rn, 1e-9))
    return w * obs_mask


def _cost(r, w):
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


def _build_jacobians(p, prob: BAProblem, R):
    """Analytic Jacobians on the dense grid.

    J_pose: (W, P, 2, 6) — left perturbation of the world->cam transform
            (p' = exp(w) p + dt).
    J_point: (W, P, 2, 3) — d r / d X = J_proj @ R_cw.
    """
    z = jnp.maximum(p[..., 2], 1e-6)
    zi = 1.0 / z
    fx, fy = prob.fx, prob.fy
    zeros = jnp.zeros_like(zi)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * zi, zeros, -fx * p[..., 0] * zi * zi], -1),
            jnp.stack([zeros, fy * zi, -fy * p[..., 1] * zi * zi], -1),
        ],
        axis=-2,
    )  # (W, P, 2, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    Jp = jnp.concatenate([-se3.hat(p), eye], axis=-1)  # (W, P, 3, 6)
    J_pose = J_proj @ Jp  # (W, P, 2, 6)
    R_cw = jnp.swapaxes(R, -1, -2)  # (W, 3, 3)
    J_point = jnp.einsum("wpij,wjk->wpik", J_proj, R_cw)  # (W, P, 2, 3)
    return J_pose, J_point


def _schur_solve(J_pose, J_point, r, w, pose_valid, point_valid, lam, fix_first_n=1,
                 prior_w=0.0, prior_xi=None, prior_w_pt=0.0, prior_dx=None,
                 H_odo=None, g_odo=None):
    """One damped Schur-complement normal-equation solve.

    Returns (delta_pose (W, 6), delta_point (P, 3)).

    Gauge: the first `fix_first_n` poses are held fixed. One fixed pose
    removes the 6-dof rigid gauge; reprojection-only BA additionally has a
    free global SCALE, so windows without metric anchoring need
    fix_first_n=2 (the reference fixes only its first KF,
    `Optimizer.cpp:414-419`, and correspondingly gates BA output with a
    max-jump check — we pin the gauge instead).
    """
    W_, P_ = w.shape
    dtype = r.dtype
    fix = jnp.arange(W_) >= fix_first_n
    pose_mask = (pose_valid & fix).astype(dtype)
    point_mask = point_valid.astype(dtype)
    Jp = J_pose * pose_mask[:, None, None, None]
    Jx = J_point * point_mask[None, :, None, None]

    # Blocks
    Hpp = jnp.einsum("wpri,wprj,wp->wij", Jp, Jp, w)  # (W, 6, 6)
    Hmm = jnp.einsum("wpri,wprj,wp->pij", Jx, Jx, w)  # (P, 3, 3)
    Hpm = jnp.einsum("wpri,wprj,wp->wpij", Jp, Jx, w)  # (W, P, 6, 3)
    g_pose = jnp.einsum("wpri,wpr,wp->wi", Jp, r, w)  # (W, 6)
    g_point = jnp.einsum("wpri,wpr,wp->pi", Jx, r, w)  # (P, 3)

    # Soft pose prior toward initialization (removes the remaining scale
    # gauge of reprojection-only BA without hard-fixing noisy poses; the
    # reference instead jump-gates + blends BA output, Slam.cpp:709-722).
    if prior_xi is not None:
        Hpp = Hpp + prior_w * jnp.eye(6, dtype=dtype)[None]
        g_pose = g_pose + prior_w * prior_xi

    # Soft point prior toward initialization (map points carry METRIC
    # anchoring from sensor-depth back-projection — Kinect depth noise
    # ~cm maps to a prior weight comparable to the reprojection
    # information, so points resist being dragged to chase drifted
    # poses: the overfit mode that made the reference disable local BA).
    if prior_dx is not None:
        Hmm = Hmm + prior_w_pt * jnp.eye(3, dtype=dtype)[None]
        g_point = g_point + prior_w_pt * prior_dx

    # LM damping (additive on the diagonal)
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    Hpp = Hpp + lam * eye6[None]
    Hmm_d = Hmm + lam * eye3[None]
    # Guard unobserved points: make their block identity so inversion is safe.
    seen = jnp.einsum("wp->p", w) > 1e-9
    Hmm_d = jnp.where(seen[:, None, None], Hmm_d, eye3[None])
    Hmm_inv = jnp.linalg.inv(Hmm_d)
    Hmm_inv = jnp.where(seen[:, None, None], Hmm_inv, 0.0)

    # Schur complement S (W, W, 6, 6) = Hpp diag - sum_p Hpm Hmm^-1 Hpm^T
    HpmHinv = jnp.einsum("wpij,pjk->wpik", Hpm, Hmm_inv)  # (W, P, 6, 3)
    S_off = jnp.einsum("apik,bpjk->abij", HpmHinv, Hpm)  # (a, b, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(W_), jnp.arange(W_)].add(Hpp)
    rhs = g_pose - jnp.einsum("wpik,pk->wi", HpmHinv, g_point)  # (W, 6)

    # Odometry (relative-pose) edges: dense pose-pose blocks added after
    # the point Schur reduction (they touch no points).
    if H_odo is not None:
        S = S + H_odo
        rhs = rhs + g_odo

    Sd = S.transpose(0, 2, 1, 3).reshape(W_ * 6, W_ * 6)
    rd = rhs.reshape(W_ * 6)
    # Fixed/invalid pose rows -> identity
    mask6 = jnp.repeat(pose_mask, 6)
    Sd = Sd * mask6[:, None] * mask6[None, :] + jnp.diag(1.0 - mask6)
    rd = rd * mask6
    delta_pose = -jnp.linalg.solve(Sd, rd).reshape(W_, 6)

    # Back-substitute points: Hmm dX = -(g_point + Hpm^T delta_pose)
    rhs_pt = g_point + jnp.einsum("wpij,wi->pj", Hpm, delta_pose)
    delta_point = -jnp.einsum("pij,pj->pi", Hmm_inv, rhs_pt)
    delta_point = delta_point * point_mask[:, None]
    return delta_pose, delta_point


@functools.partial(jax.jit, static_argnames=("iterations", "rtol"))
def bundle_adjust(prob: BAProblem, iterations: int = 10, huber_px: float = 5.0,
                  init_lambda: float = 1e-3, fix_first_n=1,
                  pose_prior_weight: float = 30.0,
                  point_prior_weight: float = 0.0,
                  odo_trans_sigma=None, odo_rot_sigma=None,
                  rtol: float = 0.0):
    """LM loop with accept/reject damping (`Optimizer.cpp:408-570`).

    `rtol > 0` enables convergence-based early exit: the loop stops after
    two consecutive iterations that fail to improve the cost by a
    relative `rtol` (a single LM reject can recover at higher damping, so
    one stall is not convergence). A problem already at its optimum —
    the healthy-run case, where the accept gate will reject the result
    anyway — exits in 2 iterations instead of paying all `iterations`
    Schur solves. `rtol == 0.0` keeps the exact fixed-count loop.

    Returns (R, t, X, final_cost)."""
    dtype = prob.R.dtype

    def apply_delta(R, t, X, dp, dx):
        # Delta layout matches the Jacobian model p' = exp(w) p + dt:
        # dp[:, :3] = rotation w, dp[:, 3:] = translation dt (plain, not
        # the V-coupled se(3) exp). Perturbs the world->cam transform.
        dR = se3.exp_so3(dp[:, :3])
        dt_ = dp[:, 3:]
        R_cw = jnp.swapaxes(R, -1, -2)
        t_cw = -(R_cw @ t[..., None])[..., 0]
        R_cw2 = dR @ R_cw
        t_cw2 = (dR @ t_cw[..., None])[..., 0] + dt_
        R2 = jnp.swapaxes(R_cw2, -1, -2)
        t2 = -(R2 @ t_cw2[..., None])[..., 0]
        return se3.orthonormalize(R2), t2, X + dx

    # Static observation mask — identical across LM iterations so that
    # accept/reject compares like with like.
    static_mask = prob.obs_valid & prob.pose_valid[:, None] & prob.point_valid[None, :]

    def eval_cost(R, t, X):
        r, p, front = _project_residuals(R, t, X, prob)
        w = _huber_weights(r, static_mask.astype(dtype), huber_px)
        c = _cost(r, w) + pose_prior_weight * jnp.sum(
            prior_residual(R, t) ** 2 * prob.pose_valid[:, None]
        ) + point_prior_weight * jnp.sum(
            (X - prob.X) ** 2 * prob.point_valid[:, None]
        )
        if use_odo:
            c = c + _odo_chi2(R, t, odo_mR, odo_mt, odo_w, odo_sq)
        return r, w, c, p, front

    # Prior anchors: world->cam transforms of the initial poses.
    R_cw0 = jnp.swapaxes(prob.R, -1, -2)
    t_cw0 = -(R_cw0 @ prob.t[..., None])[..., 0]

    # Odometry edges: measured relatives between consecutive poses come
    # from the initial chain (the tracker's odometry), acting as a
    # relative-pose prior that pins the chain's reprojection-blind
    # bending modes (see _odo_residual).
    use_odo = odo_trans_sigma is not None and odo_rot_sigma is not None
    if use_odo:
        odo_mR, odo_mt = se3.compose(
            R_cw0[1:], t_cw0[1:], *se3.inverse(R_cw0[:-1], t_cw0[:-1])
        )
        odo_w = (prob.pose_valid[1:] & prob.pose_valid[:-1]).astype(dtype)
        odo_sq = jnp.concatenate(
            [
                jnp.full(3, 1.0 / odo_trans_sigma),
                jnp.full(3, 1.0 / odo_rot_sigma),
            ]
        ).astype(dtype)

    def prior_residual(R, t):
        """xi such that exp(xi) T_init = T_cur (in (w, dt) layout)."""
        R_cw = jnp.swapaxes(R, -1, -2)
        t_cw = -(R_cw @ t[..., None])[..., 0]
        dRm = R_cw @ jnp.swapaxes(R_cw0, -1, -2)
        wv = se3.log_so3(dRm)
        dtv = t_cw - (dRm @ t_cw0[..., None])[..., 0]
        return jnp.concatenate([wv, dtv], axis=-1)  # (W, 6)

    def body(_, carry):
        R, t, X, lam, cost = carry
        r, w, _, p, front = eval_cost(R, t, X)
        # Linearize only healthy (in-front) observations.
        w_lin = w * front
        J_pose, J_point = _build_jacobians(p, prob, R)
        if use_odo:
            H_odo, g_odo, _ = _odo_system(R, t, odo_mR, odo_mt, odo_w, odo_sq)
        else:
            H_odo, g_odo = None, None
        dp, dx = _schur_solve(
            J_pose, J_point, r, w_lin,
            prob.pose_valid, prob.point_valid, lam, fix_first_n=fix_first_n,
            prior_w=pose_prior_weight, prior_xi=prior_residual(R, t),
            prior_w_pt=point_prior_weight, prior_dx=X - prob.X,
            H_odo=H_odo, g_odo=g_odo,
        )
        R2, t2, X2 = apply_delta(R, t, X, dp, dx)
        _, _, cost2, _, _ = eval_cost(R2, t2, X2)
        accept = cost2 < cost
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e3))
        R_next = jnp.where(accept, R2, R)
        t_next = jnp.where(accept, t2, t)
        X_next = jnp.where(accept, X2, X)
        cost_next = jnp.where(accept, cost2, cost)
        return (R_next, t_next, X_next, lam_next, cost_next)

    _, _, cost0, _, _ = eval_cost(prob.R, prob.t, prob.X)
    init = (prob.R, prob.t, prob.X, jnp.asarray(init_lambda, dtype), cost0)
    if rtol == 0.0:
        R, t, X, _, cost = jax.lax.fori_loop(0, iterations, body, init)
    else:
        def wcond(carry):
            _, i, stall = carry
            return (i < iterations) & (stall < 2)

        def wbody(carry):
            state, i, stall = carry
            cost_prev = state[4]
            state2 = body(i, state)
            improved = state2[4] < cost_prev * (1.0 - rtol)
            stall2 = jnp.where(improved, 0, stall + 1)
            return (state2, i + 1, stall2)

        (R, t, X, _, cost), _, _ = jax.lax.while_loop(
            wcond, wbody,
            (init, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
        )
    return R, t, X, cost


def window_cost(prob: BAProblem, R, t, X, huber_px: float = 5.0):
    """Huber reprojection chi^2 of (R, t, X) over the problem's FULL
    observation set (pose/point/obs validity; behind-camera points keep
    their z-clamped residual). Evaluating candidate solutions on the same
    fixed set makes whole-pass accept/reject comparisons fair — the
    gain-gate metric for the backend (`Optimizer.cpp:568-599` applies the
    same discipline per LM iteration)."""
    mask = (
        prob.obs_valid & prob.pose_valid[:, None] & prob.point_valid[None, :]
    ).astype(R.dtype)
    r, _, _ = _project_residuals(R, t, X, prob._replace(R=R, t=t, X=X))
    w = _huber_weights(r, mask, huber_px)
    return _cost(r, w)


def ba_significant(prob: BAProblem, huber_px: float = 5.0,
                   min_cost_per_obs: float = 4.0):
    """Condition 1 of `ba_accept_window` alone: is the window's INITIAL
    Huber reprojection cost significantly above the pixel-noise floor?

    Evaluating this BEFORE `bundle_adjust_robust` lets callers skip the
    whole LM solve when the answer is no — the accept gate would reject
    the solution anyway (significance is a conjunct), so pre-gating is
    output-identical and saves the dominant backend cost on healthy runs
    (measured: 0.75 s -> the problem-build + one residual pass).
    Returns a scalar bool."""
    c0 = window_cost(prob, prob.R, prob.t, prob.X, huber_px=huber_px)
    n_obs = jnp.maximum(
        jnp.sum(
            prob.obs_valid & prob.pose_valid[:, None] & prob.point_valid[None, :]
        ),
        1,
    )
    return c0 > min_cost_per_obs * n_obs



def ba_accept_window(prob: BAProblem, R_opt, t_opt, X_opt,
                     huber_px: float = 5.0, min_cost_per_obs: float = 4.0):
    """Whole-window gain gate for a BA solution. Three conditions:

    1. SIGNIFICANCE: the initial Huber reprojection cost must exceed
       `min_cost_per_obs` px^2 per observation. Below ~2 px RMS the
       window is already at the pixel-noise floor and "optimizing" it
       only transfers map-point noise into the keyframe poses — the
       regression mode that made the reference ship local BA disabled
       (`include/Config.h:98-99`).
    2. JOINT improvement: cost(R', t', X') < cost(R, t, X) on the full
       fixed observation set (divergence guard).
    3. POSE improvement vs ORIGINAL points: cost(R', t', X) < cost(R, t,
       X). A solution that only looks better because the points moved to
       chase the poses (overfit) fails this; a genuine pose correction
       reduces residuals against the unmoved (noisy but unbiased) map.

    Returns a scalar bool."""
    c0 = window_cost(prob, prob.R, prob.t, prob.X, huber_px=huber_px)
    c_joint = window_cost(prob, R_opt, t_opt, X_opt, huber_px=huber_px)
    c_pose = window_cost(prob, R_opt, t_opt, prob.X, huber_px=huber_px)
    significant = ba_significant(
        prob, huber_px=huber_px, min_cost_per_obs=min_cost_per_obs
    )
    return significant & (c_joint < c0 * (1.0 - 1e-5)) & (c_pose < c0)


@functools.partial(jax.jit, static_argnames=("iterations", "rtol"))
def bundle_adjust_robust(prob: BAProblem, iterations: int = 10, huber_px: float = 5.0,
                         gate_px: float = 15.0, fix_first_n=1,
                         point_prior_weight: float = 0.0,
                         odo_trans_sigma=None, odo_rot_sigma=None,
                         gate2_px=None, rtol: float = 0.0):
    """Outlier-gated BA: drop observations whose INITIAL residual exceeds
    `gate_px` (BA starts from tracked poses, so gross outliers are already
    visible — the same spirit as the reference gating every input through
    RANSAC masks before optimization), optimize, re-gate at the OPTIMUM
    with `gate2_px` (defaults to gate_px), and polish.

    The gates are asymmetric on purpose: legitimate pose error makes TRUE
    observations carry large initial residuals, so the first gate must be
    loose enough to keep the evidence (Huber + the odometry/point priors
    handle the admitted outliers); at the stage-1 optimum true residuals
    have collapsed, so the re-gate can be tight. Static shapes
    throughout."""
    if gate2_px is None:
        gate2_px = gate_px
    r0, _, front0 = _project_residuals(prob.R, prob.t, prob.X, prob)
    ok0 = jnp.linalg.norm(r0, axis=-1) < gate_px
    p1 = prob._replace(obs_valid=prob.obs_valid & ok0 & front0)
    R, t, X, _ = bundle_adjust(
        p1, iterations=iterations, huber_px=huber_px, fix_first_n=fix_first_n,
        point_prior_weight=point_prior_weight,
        odo_trans_sigma=odo_trans_sigma, odo_rot_sigma=odo_rot_sigma,
        rtol=rtol,
    )

    r1, _, front1 = _project_residuals(R, t, X, prob)
    ok1 = jnp.linalg.norm(r1, axis=-1) < gate2_px
    p2 = prob._replace(R=R, t=t, X=X, obs_valid=prob.obs_valid & ok1 & front1)
    return bundle_adjust(
        p2, iterations=max(iterations // 2, 2), huber_px=huber_px,
        fix_first_n=fix_first_n, point_prior_weight=point_prior_weight,
        odo_trans_sigma=odo_trans_sigma, odo_rot_sigma=odo_rot_sigma,
        rtol=rtol,
    )
