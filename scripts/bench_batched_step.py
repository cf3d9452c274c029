"""Per-component latency of the HAND-BATCHED tracking step at batch B.

Round-3 data shows the multi-coupled B=4 step costs ~4x the single-step
latency — i.e. the vmapped tracking gets NO latency amortization from
batching, capping the per-chip aggregate at ~520 fps when the frontend's
compute floor alone would allow ~1400. This script attributes the batched
step cost component by component (same scan-harness methodology as
bench_step_components.py: sequential lax.scan, scalar carry jitter,
host-readback barrier).

Usage: python scripts/bench_batched_step.py [--cpu] [--n 256] [--b 4]
       [--only pat]
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
    ap.add_argument("--b", type=int, default=4, help="batch size")
    ap.add_argument("--only", type=str, default="", help="substring filter")
    ap.add_argument("--bs", type=str, default="1,2,4,8",
                    help="batch sizes for the full-step sweep")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.core import pipeline, tracking as T
    from vslam_tpu.core import tracking_batched as TB
    from vslam_tpu.core.state import init_state
    from vslam_tpu.data import synthetic
    from vslam_tpu.ops.linalg import f32_matmuls

    cfg = SlamConfig()
    c = cfg.camera
    N = args.n
    B = args.b

    # Representative mid-sequence state, replicated to batch (each member
    # gets its own 64-frame warm-up world so maps differ).
    def warm_state(seed):
        seq = synthetic.make_sequence(
            num_frames=64,
            max_keypoints=cfg.frontend.max_keypoints,
            desc_dim=cfg.frontend.descriptor_dim,
            fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
            width=c.width, height=c.height,
            seed=seed, num_landmarks=6000,
        )
        frames = pipeline.features_from_synthetic(seq)
        state0 = init_state(cfg)
        from vslam_tpu.core.pipeline import _scan_sequence

        st, _ = jax.jit(lambda s, f: _scan_sequence(s, f, cfg, 42))(
            state0, frames
        )
        return st, jax.tree.map(lambda x: x[-1], frames)

    singles = [warm_state(s) for s in range(B)]
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[s for s, _ in singles])
    frame = jax.tree.map(lambda *xs: jnp.stack(xs), *[f for _, f in singles])
    frame = frame._replace(desc=frame.desc.astype(states.kf_desc.dtype))
    print(
        f"device={jax.devices()[0]}  B={B}  "
        f"map={[int(x) for x in jnp.sum(states.map.valid, -1)]}  N={N}"
    )

    key0 = jax.random.PRNGKey(7)
    keysB = jax.vmap(lambda i: jax.random.fold_in(key0, i))(
        jnp.arange(B, dtype=jnp.int32)
    )

    def timed_scan(name, body):
        if args.only and not any(p in name for p in args.only.split(",")):
            return

        @jax.jit
        @f32_matmuls
        def prog(carry0):
            def step(cr, _):
                return body(cr), ()

            out, _ = jax.lax.scan(step, carry0, None, length=N)
            return out

        r = float(prog(jnp.asarray(0.0, jnp.float32)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog(jnp.asarray(r % 1.0, jnp.float32)))
            reps.append(time.perf_counter() - t0)
        dt = float(np.median(reps)) / N
        print(f"{name:40s} {dt*1e6:9.1f} us/iter")

    def jitter_frame(cr):
        return frame._replace(
            xy=frame.xy + cr * 1e-6,
            desc=frame.desc + (cr * 1e-6).astype(frame.desc.dtype),
        )

    # ---- full batched step at several B (state threaded) ----
    for Bx in [int(x) for x in args.bs.split(",") if x]:
        if Bx > B:
            continue
        stx = jax.tree.map(lambda a: a[:Bx], states)
        frx = jax.tree.map(lambda a: a[:Bx], frame)
        kx = keysB[:Bx]

        @jax.jit
        def prog_threaded(st0, fr, kk):
            def step(st, _):
                f2 = fr._replace(
                    xy=fr.xy + st.t[0, 0] * 1e-12,
                    desc=fr.desc + (st.t[0, 0] * 1e-12).astype(fr.desc.dtype),
                )
                st2, out = TB.tracking_step_batched(st, f2, cfg, kk)
                return st2, out.t

            stN, ts_ = jax.lax.scan(step, st0, None, length=N)
            return jnp.sum(ts_)

        r = float(prog_threaded(stx, frx, kx))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog_threaded(stx, frx, kx))
            reps.append(time.perf_counter() - t0)
        dt = float(np.median(reps)) / N
        print(
            f"{'full batched step B=%d (threaded)' % Bx:40s} {dt*1e6:9.1f} "
            f"us/iter  ({dt*1e6/Bx:7.1f} us/frame)"
        )

    # ---- components at B (vmapped forms exactly as _track_batched) ----
    def kf_match(cr):
        f2 = jitter_frame(cr)
        m, uv_kf, uv_cur, gated, n_raw = jax.vmap(
            lambda s, f, k: T._match_to_keyframe(s, f, cfg, k)
        )(states, f2, keysB)
        return jnp.sum(m.dist) * 1e-9 + cr * 0.5

    timed_scan(f"vmap match_to_keyframe B={B}", kf_match)

    m0, uv_kf0, uv_cur0, gated0, _ = jax.vmap(
        lambda s, f, k: T._match_to_keyframe(s, f, cfg, k)
    )(states, frame, keysB)

    def fgate(cr):
        g2, eb, ea = jax.vmap(
            lambda ukf, ucur, g, k: T._fundamental_gate(ukf, ucur, g, cfg, k)
        )(uv_kf0, uv_cur0 + cr * 1e-6, gated0, keysB)
        return jnp.sum(eb) * 1e-9 + cr * 0.5

    timed_scan(f"vmap fundamental_gate B={B}", fgate)

    def r3d(cr):
        R3, t3, res3, p_kf, p_cur, d_ok = jax.vmap(
            lambda s, f, mm, ukf, ucur, g, k: T._motion_3d3d(
                s, f, cfg, mm, ukf, ucur, g, k
            )
        )(states, frame, m0, uv_kf0, uv_cur0 + cr * 1e-6, gated0, keysB)
        return jnp.sum(t3) * 1e-9 + cr * 0.5

    timed_scan(f"vmap 3d3d RANSAC B={B}", r3d)

    def ekf_c(cr):
        st2, fused, snap = jax.vmap(
            lambda s, f, tm: T._fuse_ekf(
                s, f, cfg, tm, jnp.asarray(True), jnp.asarray(True)
            )
        )(states, frame, states.t + cr * 1e-6)
        return jnp.sum(fused) * 1e-9 + cr * 0.5

    timed_scan(f"vmap fuse_ekf B={B}", ekf_c)

    def local_map(cr):
        mp_idx, kp_ok, map2 = jax.vmap(
            lambda s, f, R, t: T._track_local_map(s, f, cfg, R, t)
        )(states, jitter_frame(cr), states.R, states.t)
        return jnp.sum(kp_ok) * 1e-9 + cr * 0.5

    timed_scan(f"vmap track_local_map B={B}", local_map)

    def local_map_batched(cr):
        mp_idx, kp_ok, map2 = TB._track_local_map_batched(
            states, jitter_frame(cr), cfg, states.R, states.t
        )
        return jnp.sum(kp_ok) * 1e-9 + cr * 0.5

    timed_scan(f"batched track_local_map B={B}", local_map_batched)

    mp_idx0, kp_ok0, _ = jax.vmap(
        lambda s, f, R, t: T._track_local_map(s, f, cfg, R, t)
    )(states, frame, states.R, states.t)

    def gn(cr):
        R_o, t_o, n, R_f, t_f = jax.vmap(
            lambda s, f, R, t, mi, ko, k: T._refine_pnp(
                s, f, cfg, R, t, mi, ko, k
            )
        )(states, jitter_frame(cr), states.R, states.t, mp_idx0, kp_ok0, keysB)
        return (jnp.sum(t_o) + jnp.sum(t_f)) * 1e-9 + cr * 0.5

    timed_scan(f"vmap refine_pnp B={B}", gn)

    def mkkf(cr):
        st2 = jax.vmap(
            lambda s, f, R, t, mm, g: T._make_keyframe(s, f, cfg, R, t, mm, g)
        )(states, jitter_frame(cr), states.R, states.t, m0, gated0)
        return jnp.sum(st2.kf_t) * 1e-9 + cr * 0.5

    timed_scan(f"vmap make_keyframe B={B}", mkkf)

    # Rough state-carry cost probe: a no-op step that only touches the
    # carried pytree (copy costs / layout changes across scan iterations).
    def carry_only(cr):
        s = jax.tree.map(
            lambda x: x + jnp.asarray(0, x.dtype) if x.dtype != jnp.bool_ else x,
            states,
        )
        return jnp.sum(s.t) * 1e-9 + cr * 0.5

    timed_scan(f"carry-touch only B={B}", carry_only)


if __name__ == "__main__":
    main()
