"""Per-component latency of the tracking step on the current device.

Each component is wrapped in a `lax.scan` over N iterations with a scalar
carry folded into its inputs — reproducing the sequential, latency-bound
execution of the real tracking scan (one frame depends on the previous) —
and timed with a final host readback as the completion barrier (the axon
relay's `block_until_ready` returns at dispatch; CLAUDE.md).

Usage: python scripts/bench_step_components.py [--cpu] [--n 256] [--only pat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=256, help="scan length")
    ap.add_argument("--only", type=str, default="", help="substring filter")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.core import pipeline, tracking as T
    from vslam_tpu.core.state import init_state
    from vslam_tpu.data import synthetic
    from vslam_tpu.ops import ekf as ekf_ops
    from vslam_tpu.ops import linalg, matching, pnp as pnp_ops
    from vslam_tpu.ops import ransac as rs
    from vslam_tpu.ops import se3
    from vslam_tpu.ops.linalg import f32_matmuls

    cfg = SlamConfig()
    c = cfg.camera
    N = args.n

    # Representative state: run the real scan for 64 frames first so the
    # map is populated like mid-sequence tracking.
    seq = synthetic.make_sequence(
        num_frames=64,
        max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
        width=c.width, height=c.height,
        seed=0, num_landmarks=6000,
    )
    frames = pipeline.features_from_synthetic(seq)
    gravity, h0 = pipeline.compute_gravity_direction(
        seq.accel, np.eye(3, dtype=np.float32)
    )
    state0 = init_state(cfg, gravity=gravity, initial_height=h0)
    from vslam_tpu.core.pipeline import _scan_sequence

    state, _ = jax.jit(lambda s, f: _scan_sequence(s, f, cfg, 42))(state0, frames)
    frame = jax.tree.map(lambda x: x[-1], frames)
    frame = frame._replace(desc=frame.desc.astype(state.kf_desc.dtype))
    n_map = int(jnp.sum(state.map.valid))
    print(f"device={jax.devices()[0]}  map points={n_map}  N={N}")

    key0 = jax.random.PRNGKey(7)
    fx, fy, cx, cy = c.fx, c.fy, c.cx, c.cy

    def timed_scan(name, body):
        """body(carry_scalar) -> new_carry_scalar; scanned N times."""
        if args.only and not any(p in name for p in args.only.split(",")):
            return

        @jax.jit
        @f32_matmuls
        def prog(carry0):
            def step(cr, _):
                return body(cr), ()

            out, _ = jax.lax.scan(step, carry0, None, length=N)
            return out

        r = float(prog(jnp.asarray(0.0, jnp.float32)))  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog(jnp.asarray(r % 1.0, jnp.float32)))
            reps.append(time.perf_counter() - t0)
        dt = float(np.median(reps)) / N
        print(f"{name:36s} {dt*1e6:9.1f} us/iter")

    # Perturb inputs by the carry so nothing constant-folds across steps.
    # BOTH xy and desc must depend on the carry: XLA hoists loop-invariant
    # subgraphs out of the scan, so a constant descriptor array would let
    # every descriptor matmul run once instead of per iteration.
    def jitter_xy(cr):
        return frame.xy + cr * 1e-6

    def jitter_frame(cr):
        return frame._replace(
            xy=frame.xy + cr * 1e-6,
            desc=frame.desc + (cr * 1e-6).astype(frame.desc.dtype),
        )

    # ---- full step ----
    def full_step(cr):
        key = jax.random.fold_in(key0, (cr * 1e6).astype(jnp.int32))
        f2 = jitter_frame(cr)
        st2, out = T.tracking_step(state, f2, cfg, key)
        return jnp.sum(out.t) * 1e-9 + cr * 0.5

    timed_scan("full tracking_step", full_step)

    # ---- full step with the TrackState THREADED through the carry ----
    # (isolates the scan-carry cost of the 30+ MB state pytree vs the
    # scalar-carry variant above)
    if not args.only or "threaded" in args.only:

        @jax.jit
        def prog_threaded(st0):
            def step(st, _):
                f2 = frame._replace(xy=frame.xy + st.t[0] * 1e-12,
                    desc=frame.desc + (st.t[0] * 1e-12).astype(frame.desc.dtype))
                key = jax.random.fold_in(key0, st.frame_idx)
                st2, out = T.tracking_step(st, f2, cfg, key)
                return st2, out.t

            stN, ts_ = jax.lax.scan(step, st0, None, length=N)
            return jnp.sum(ts_)

        r = float(prog_threaded(state))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog_threaded(state))
            reps.append(time.perf_counter() - t0)
        print(f"{'full step (state threaded)':36s} {float(np.median(reps))/N*1e6:9.1f} us/iter")

    # ---- the real bench scan on N frames (real data, real branches) ----
    if not args.only or "realscan" in args.only:
        seqN = synthetic.make_sequence(
            num_frames=N,
            max_keypoints=cfg.frontend.max_keypoints,
            desc_dim=cfg.frontend.descriptor_dim,
            fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
            width=c.width, height=c.height,
            seed=3, num_landmarks=6000,
        )
        framesN = pipeline.features_from_synthetic(seqN)

        @jax.jit
        def prog_real(st0, fs):
            stN, outs = _scan_sequence(st0, fs, cfg, 42)
            return jnp.sum(outs.t)

        r = float(prog_real(state0, framesN))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog_real(state0, framesN))
            reps.append(time.perf_counter() - t0)
        print(f"{'real scan (fresh state, N frames)':36s} {float(np.median(reps))/N*1e6:9.1f} us/iter")

    # ---- KF descriptor match ----
    def kf_match(cr):
        f2 = jitter_frame(cr)
        m, uv_kf, uv_cur, gated, n_raw = T._match_to_keyframe(
            state, f2, cfg, key0
        )
        return jnp.sum(m.dist) * 1e-9 + cr * 0.5

    timed_scan("match_to_keyframe (400x400)", kf_match)

    # ---- 3D-3D RANSAC ----
    m0, uv_kf0, uv_cur0, gated0, _ = T._match_to_keyframe(state, frame, cfg, key0)

    def r3d(cr):
        key = jax.random.fold_in(key0, (cr * 1e6).astype(jnp.int32))
        R3, t3, res3, p_kf, p_cur, d_ok = T._motion_3d3d(
            state, frame, cfg, m0, uv_kf0, uv_cur0 + cr * 1e-6, gated0, key
        )
        return jnp.sum(t3) * 1e-9 + cr * 0.5

    timed_scan("3d3d RANSAC (128 hyp)", r3d)

    # ---- svd3x3 / orthonormalize ----
    A128 = jax.random.normal(jax.random.PRNGKey(1), (128, 3, 3))

    def svd_b(cr):
        U, S, Vt = linalg.svd3x3(A128 + cr * 1e-6)
        return jnp.sum(S) * 1e-9 + cr * 0.5

    timed_scan("svd3x3 batch-128", svd_b)

    def ortho1(cr):
        R = se3.orthonormalize(state.R + cr * 1e-6)
        return jnp.sum(R) * 1e-9 + cr * 0.5

    timed_scan("orthonormalize (single)", ortho1)

    # ---- local-map tracking (fused dispatch; Pallas on TPU) ----
    def local_map(cr):
        mp_idx, kp_ok, map2 = T._track_local_map(
            state, jitter_frame(cr), cfg, state.R, state.t
        )
        return jnp.sum(kp_ok) * 1e-9 + cr * 0.5

    timed_scan("track_local_map (fused)", local_map)

    # ---- local-map tracking, forced XLA path ----
    def local_map_xla(cr):
        f2 = jitter_frame(cr)
        Rcw = state.R.T
        tcw = -Rcw @ state.t
        from vslam_tpu.ops import camera as cam

        p_c = state.map.pos @ Rcw.T + tcw
        uv_mp, front = cam.project(p_c, fx, fy, cx, cy)
        vis = state.map.valid & front & cam.in_image(uv_mp, c.width, c.height)
        pix_d2 = matching.pixel_dist2_matrix(uv_mp, f2.xy)
        mp_idx, kp_ok, _ = matching.radius_descriptor_match(
            f2.desc, f2.xy, f2.valid, state.map.desc, uv_mp, vis,
            radius_px=cfg.map.track_search_radius_px,
            desc_thresh=cfg.map.track_desc_threshold,
            pix_d2=pix_d2,
        )
        mn = jnp.min(jnp.where(f2.valid[None, :], pix_d2, jnp.inf), axis=-1)
        return (jnp.sum(kp_ok) + jnp.sum(mn)) * 1e-9 + cr * 0.5

    timed_scan("track_local_map (XLA blocks)", local_map_xla)

    # ---- GN PnP refine ----
    mp_idx0, kp_ok0, _ = T._track_local_map(state, frame, cfg, state.R, state.t)

    def gn(cr):
        R_o, t_o, n, R_f, t_f = T._refine_pnp(
            state, frame._replace(xy=jitter_xy(cr)), cfg, state.R, state.t,
            mp_idx0, kp_ok0, key0,
        )
        return (jnp.sum(t_o) + jnp.sum(t_f)) * 1e-9 + cr * 0.5

    timed_scan("refine_pnp (GN + full)", gn)

    # ---- EKF chain ----
    def ekf_c(cr):
        st2, fused, snap = T._fuse_ekf(
            state, frame, cfg, state.t + cr * 1e-6, jnp.asarray(True),
            jnp.asarray(True),
        )
        return jnp.sum(fused) * 1e-9 + cr * 0.5

    timed_scan("fuse_ekf", ekf_c)

    # ---- keyframe creation (the cond branch body) ----
    def mkkf(cr):
        st2 = T._make_keyframe(
            state, frame._replace(xy=jitter_xy(cr)), cfg, state.R, state.t,
            m0, gated0,
        )
        return jnp.sum(st2.kf_t) * 1e-9 + cr * 0.5

    timed_scan("make_keyframe (KF branch)", mkkf)

    # ---- RANSAC-PnP (recovery/periodic/loop branch body) ----
    X0 = state.map.pos[jnp.clip(mp_idx0, 0, state.map.pos.shape[0] - 1)]

    def rpnp(cr):
        key = jax.random.fold_in(key0, (cr * 1e6).astype(jnp.int32))
        res = pnp_ops.ransac_pnp(
            key, X0, frame.xy + cr * 1e-6, kp_ok0, fx, fy, cx, cy,
            num_hypotheses=cfg.pnp.ransac_iters,
            threshold_px=cfg.pnp.ransac_threshold_px,
            min_inliers=cfg.pnp.min_points,
            gn_iters=cfg.pnp.gn_iters,
        )
        return jnp.sum(res.t) * 1e-9 + cr * 0.5

    timed_scan("ransac_pnp (cond branches)", rpnp)

    # ---- Essential branch body ----
    p_kf0, p_cur0, d_ok0 = (
        jnp.zeros((frame.xy.shape[0], 3)),
        jnp.zeros((frame.xy.shape[0], 3)),
        jnp.zeros(frame.xy.shape[0], bool),
    )

    def ess(cr):
        key = jax.random.fold_in(key0, (cr * 1e6).astype(jnp.int32))
        out = T._motion_essential(
            state, frame, cfg, uv_kf0, uv_cur0 + cr * 1e-6, gated0,
            p_kf0, p_cur0, d_ok0, key,
        )
        return jnp.sum(out[1]) * 1e-9 + cr * 0.5

    timed_scan("essential branch body", ess)


if __name__ == "__main__":
    main()
