"""Bisect the coupled-program cost: time (A) the chunked frontend alone,
(B) frontend + tracking scan, (C) the full coupled program (frontend +
tracking + dense fusion), all on the same rasterized image sequence and
chunk size, to locate where coupled-measured time diverges from the
stage-sum. One JSON line to stdout.

Usage: python scripts/bench_coupled_bisect.py [--chunk 128] [--frames 896]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.core import coupled as cm
    from vslam_tpu.core.state import FrameFeatures, init_state
    from vslam_tpu.core.tracking import make_scan_step
    from vslam_tpu.data import synthetic
    from vslam_tpu.models import superpoint as sp
    from vslam_tpu.models import weights as wmod
    from vslam_tpu.ops import gridhash

    cfg = SlamConfig()
    c = cfg.camera
    CHUNK = args.chunk
    S = max((args.frames + CHUNK - 1) // CHUNK, 1)
    nC = S * CHUNK
    H, W = c.height, c.width

    params, _ = wmod.load_or_init_superpoint(height=H, width=W)
    model = sp.SuperPoint()
    d0 = synthetic.make_image_sequence(
        nC, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
        seed=0, num_landmarks=6000, radius=3.0, with_rgb=True,
    )
    gray1 = jnp.asarray(d0["gray"].reshape(S, CHUNK, H, W))
    dep1 = jnp.asarray(d0["depth_u16"].reshape(S, CHUNK, H, W))
    rgb1 = jnp.asarray(d0["rgb"].reshape(S, CHUNK, H, W, 3))
    tsc1 = jnp.asarray(d0["timestamps"].reshape(S, CHUNK).astype(np.float32))
    fid1 = jnp.asarray(np.arange(nC, dtype=np.int32).reshape(S, CHUNK))
    stat1 = jnp.zeros((S, CHUNK), bool)
    st0 = init_state(cfg)
    dn0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )

    @jax.jit
    def fe_only(params, gray, dep):
        def step(carry, xs):
            g, d16 = xs
            kps, desc = cm._frontend_chunk(params, model, g, cfg)
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            kpd = cm._kp_depth(depth_m, kps.xy, cfg)
            chk = (
                jnp.sum(kpd) + jnp.sum(kps.xy) * 1e-6 + jnp.sum(desc) * 1e-6
            )
            return carry + chk, None

        out, _ = jax.lax.scan(step, jnp.float32(0.0), (gray, dep))
        return out

    track = make_scan_step(cfg, seed=42)

    @jax.jit
    def fe_track(params, st, gray, dep, ts, fids, stat):
        def step(carry, xs):
            st = carry
            g, d16, t, fid, sta = xs
            kps, desc = cm._frontend_chunk(params, model, g, cfg)
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            kpd = cm._kp_depth(depth_m, kps.xy, cfg)
            frames = FrameFeatures(
                xy=kps.xy, desc=desc, depth=kpd, valid=kps.valid,
                timestamp=t, stationary=sta, frame_id=fid,
            )
            st, outs = jax.lax.scan(track, st, frames)
            return st, outs.t

        st, t_all = jax.lax.scan(
            step, st, (gray, dep, ts, fids, stat)
        )
        return jnp.sum(t_all)

    Rgt = jnp.asarray(d0["R"].reshape(S, CHUNK, 3, 3).astype(np.float32))
    tgt = jnp.asarray(d0["t"].reshape(S, CHUNK, 3).astype(np.float32))

    @jax.jit
    def fuse_nested(dn, dep, Rs, ts):
        """Dense fusion alone in the coupled program's nested-scan
        structure, on the real room depth with ground-truth poses —
        isolates the fuse cost from frontend/tracking interaction."""
        dnc = cfg.dense

        def step(carry, xs):
            dst = carry
            d16, R, t = xs
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            dst = gridhash.fuse_chunk_scan(
                dst, depth_m, None, R, t, c.fx, c.fy, c.cx, c.cy,
                pixel_step=dnc.pixel_step, max_depth=dnc.max_depth,
                voxel_size=dnc.voxel_size,
                frames_per_step=math.gcd(CHUNK, dnc.fuse_frames_per_insert),
            )
            return dst, None

        dn, _ = jax.lax.scan(step, dn, (dep, Rs, ts))
        return dn.cloud_count

    @jax.jit
    def fe_track_full(params, st, gray, dep, ts, fids, stat):
        """Like fe_track but keeps EVERY StepOutputs leaf live (no DCE of
        diagnostics / EKF snapshot stacking) — isolates what B's
        t-only readback lets the compiler delete."""

        def step(carry, xs):
            st = carry
            g, d16, t, fid, sta = xs
            kps, desc = cm._frontend_chunk(params, model, g, cfg)
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            kpd = cm._kp_depth(depth_m, kps.xy, cfg)
            frames = FrameFeatures(
                xy=kps.xy, desc=desc, depth=kpd, valid=kps.valid,
                timestamp=t, stationary=sta, frame_id=fid,
            )
            st, outs = jax.lax.scan(track, st, frames)
            return st, outs

        st, outs = jax.lax.scan(step, st, (gray, dep, ts, fids, stat))
        chk = jnp.float32(0.0)
        for leaf in jax.tree.leaves(outs):
            chk = chk + jnp.sum(leaf.astype(jnp.float32))
        return chk

    @jax.jit
    def fuse_nested_rgb(dn, dep, rgb, Rs, ts):
        """fuse_nested + the real color gathers."""
        dnc = cfg.dense

        def step(carry, xs):
            dst = carry
            d16, rgb_c, R, t = xs
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            dst = gridhash.fuse_chunk_scan(
                dst, depth_m, rgb_c, R, t, c.fx, c.fy, c.cx, c.cy,
                pixel_step=dnc.pixel_step, max_depth=dnc.max_depth,
                voxel_size=dnc.voxel_size,
                frames_per_step=math.gcd(CHUNK, dnc.fuse_frames_per_insert),
            )
            return dst, None

        dn, _ = jax.lax.scan(step, dn, (dep, rgb, Rs, ts))
        return dn.cloud_count

    def _phase1_body(params, st, gray, dep, ts, fids, stat):
        def step(carry, xs):
            st = carry
            g, d16, t, fid, sta = xs
            kps, desc = cm._frontend_chunk(params, model, g, cfg)
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            kpd = cm._kp_depth(depth_m, kps.xy, cfg)
            frames = FrameFeatures(
                xy=kps.xy, desc=desc, depth=kpd, valid=kps.valid,
                timestamp=t, stationary=sta, frame_id=fid,
            )
            st, outs = jax.lax.scan(track, st, frames)
            return st, outs

        return jax.lax.scan(step, st, (gray, dep, ts, fids, stat))

    def _phase2_body(dn, dep, rgb, Rs, tps):
        dnc = cfg.dense

        def fuse_step(dst, xs):
            d16, rgb_c, R, t = xs
            depth_m = d16.astype(jnp.float32) / c.depth_scale
            dst = gridhash.fuse_chunk_scan(
                dst, depth_m, rgb_c, R, t, c.fx, c.fy, c.cx, c.cy,
                pixel_step=dnc.pixel_step, max_depth=dnc.max_depth,
                voxel_size=dnc.voxel_size,
                frames_per_step=math.gcd(CHUNK, dnc.fuse_frames_per_insert),
            )
            return dst, None

        dn, _ = jax.lax.scan(fuse_step, dn, (dep, rgb, Rs, tps))
        return dn

    @jax.jit
    def full_poses_input(params, st, dn, gray, dep, rgb, ts, fids, stat,
                         Rs, tps):
        """run_coupled's exact structure, but phase 2 consumes INPUT
        poses instead of phase 1's stacked scan outputs."""
        st, outs = _phase1_body(params, st, gray, dep, ts, fids, stat)
        dn = _phase2_body(dn, dep, rgb, Rs, tps)
        outs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), outs)
        return st, dn, outs

    @jax.jit
    def full_scalar_out(params, st, dn, gray, dep, rgb, ts, fids, stat):
        """run_coupled's exact structure (phase 2 consumes phase 1's
        poses) but returns only scalars."""
        st, outs = _phase1_body(params, st, gray, dep, ts, fids, stat)
        dn = _phase2_body(dn, dep, rgb, outs.R, outs.t)
        return jnp.sum(outs.t) + dn.cloud_count.astype(jnp.float32)

    @jax.jit
    def full_forced_checksum(params, st, dn, gray, dep, rgb, ts, fids,
                             stat):
        """Scalar output, but in-program reductions force EVERY final
        buffer (cloud, table, outs, final state) so nothing is DCE'd —
        distinguishes real compute from output-return overhead."""
        st, outs = _phase1_body(params, st, gray, dep, ts, fids, stat)
        dn = _phase2_body(dn, dep, rgb, outs.R, outs.t)
        chk = jnp.float32(0.0)
        for leaf in jax.tree.leaves(outs):
            chk = chk + jnp.sum(leaf.astype(jnp.float32))
        for leaf in jax.tree.leaves(dn):
            chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
        for leaf in jax.tree.leaves(st):
            chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-9
        return chk

    def full():
        _, _, outs = cm.run_coupled(
            params, st0, dn0, gray1, dep1, rgb1, tsc1, fid1, stat1, cfg
        )
        return jnp.sum(outs.t)

    def timed(fn, warmup=2):
        for _ in range(warmup):
            float(fn())
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    res = {}
    t_a = timed(lambda: fe_only(params, gray1, dep1))
    res["A_frontend_ms_per_frame"] = round(1e3 * t_a / nC, 3)
    t_b = timed(
        lambda: fe_track(params, st0, gray1, dep1, tsc1, fid1, stat1)
    )
    res["B_fe_track_ms_per_frame"] = round(1e3 * t_b / nC, 3)
    t_d = timed(lambda: fuse_nested(dn0, dep1, Rgt, tgt))
    res["D_fuse_nested_ms_per_frame"] = round(1e3 * t_d / nC, 3)
    t_e1 = timed(
        lambda: fe_track_full(params, st0, gray1, dep1, tsc1, fid1, stat1)
    )
    res["E1_fe_track_full_outs_ms_per_frame"] = round(1e3 * t_e1 / nC, 3)
    t_e2 = timed(lambda: fuse_nested_rgb(dn0, dep1, rgb1, Rgt, tgt))
    res["E2_fuse_nested_rgb_ms_per_frame"] = round(1e3 * t_e2 / nC, 3)

    def _run_f():
        st, dn, outs = full_poses_input(
            params, st0, dn0, gray1, dep1, rgb1, tsc1, fid1, stat1,
            Rgt, tgt,
        )
        return jnp.sum(outs.t) + dn.cloud_count.astype(jnp.float32)

    t_f = timed(_run_f)
    res["F_full_poses_input_ms_per_frame"] = round(1e3 * t_f / nC, 3)
    t_h = timed(
        lambda: full_forced_checksum(
            params, st0, dn0, gray1, dep1, rgb1, tsc1, fid1, stat1
        )
    )
    res["H_full_forced_checksum_ms_per_frame"] = round(1e3 * t_h / nC, 3)
    t_g = timed(
        lambda: full_scalar_out(
            params, st0, dn0, gray1, dep1, rgb1, tsc1, fid1, stat1
        )
    )
    res["G_full_scalar_out_ms_per_frame"] = round(1e3 * t_g / nC, 3)
    t_c = timed(full)
    res["C_full_ms_per_frame"] = round(1e3 * t_c / nC, 3)
    res["tracking_delta_ms"] = round(1e3 * (t_b - t_a) / nC, 3)
    res["dense_delta_ms"] = round(1e3 * (t_c - t_b) / nC, 3)
    res["chunk"] = CHUNK
    res["frames"] = nC
    print(json.dumps(res))


if __name__ == "__main__":
    main()
