"""End-to-end benchmark: SuperPoint frontend + tracking + dense fusion +
PGO/BA backend on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/200}

Baseline (BASELINE.md): >= 200 frames/sec/chip end-to-end at ATE RMSE
<= 0.14 m. The reference publishes only "real time" (~30 fps sensor rate)
on GPU; its per-frame loop includes dense voxel accumulation
(`/root/reference/src/main.cpp:1081-1146`), so the dense-fusion scan is
part of the per-frame metric here too.

Methodology (axon relay: ~50 ms dispatch RTT, block_until_ready does not
synchronize — CLAUDE.md):
  * every stage is ONE jitted program scanned over the whole workload,
    with a scalar host readback as the completion barrier;
  * 2 warm-up runs per stage (compile + autotune), then TIMED_ITERS timed
    runs each ending in a readback; the reported number is the MEDIAN and
    `detail.fps_spread` records (max-min)/median across iterations — the
    round-1 headline did not reproduce under the driver, so run-to-run
    variance is now part of the result.
"""

from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np

TIMED_ITERS = 5
WARMUP_ITERS = 2


def _timed(fn, readback, iters=TIMED_ITERS, warmup=WARMUP_ITERS):
    """Run fn() (returning a chain value) warmup+iters times; readback(x)
    forces completion. Returns list of per-iteration seconds."""
    for _ in range(warmup):
        readback(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        readback(fn())
        times.append(time.perf_counter() - t0)
    return times


def _spread(ts):
    m = float(np.median(ts))
    return float((max(ts) - min(ts)) / m) if m > 0 else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tiny", action="store_true", help="tiny shapes (smoke test)")
    ap.add_argument("--frames", type=int, default=0, help="tracked frames (0 = default)")
    ap.add_argument("--no-frontend", action="store_true", help="skip SuperPoint timing")
    ap.add_argument("--no-dense", action="store_true", help="skip dense fusion timing")
    ap.add_argument(
        "--multi", type=int, default=-1,
        help="batch size for multi-sequence tracking (production per-chip "
        "throughput config; -1 = default 4, 0 = skip)",
    )
    ap.add_argument("--iters", type=int, default=0, help="timed iterations per stage")
    args = ap.parse_args()

    global TIMED_ITERS
    if args.iters:
        TIMED_ITERS = args.iters

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig, tiny_test_config
    from vslam_tpu.core import pipeline
    from vslam_tpu.data import synthetic
    from vslam_tpu.models import superpoint as sp
    from vslam_tpu.ops import gridhash, nms

    dev = jax.devices()[0]

    if args.tiny:
        cfg = tiny_test_config()
        n_frames = args.frames or 16
        sp_batch = 2
        n_landmarks = 800
        multi_b = 2 if args.multi == -1 else args.multi
    else:
        cfg = SlamConfig()
        # Default workload sized like TUM fr2_pioneer_slam3 at FRAME_STEP=3:
        # ~848 processed frames (BASELINE.md).
        n_frames = args.frames or 848
        sp_batch = 32
        n_landmarks = 6000
        multi_b = 4 if args.multi == -1 else args.multi

    c = cfg.camera

    # ---------------- Frontend: SuperPoint forward + decode ----------------
    sp_fps = float("inf")
    sp_sprd = 0.0
    if not args.no_frontend:
        params = sp.init_params(jax.random.PRNGKey(0), height=c.height, width=c.width)
        model = sp.SuperPoint()
        n_chunks = max(n_frames // sp_batch, 1)

        @jax.jit
        def frontend_sequence(params, chunks, chain):
            """chunks: (C, B, H, W, 1) uint8 -> scan frontend over chunks.
            Frames live in HBM as uint8 (4x less traffic than f32) and are
            normalized on-device per chunk, like production ingest."""

            def step(carry, images_u8):
                images = images_u8.astype(jnp.float32) / 255.0
                semi, desc_c = model.apply(params, images + 0.0 * carry)
                kps, desc = nms.extract_keypoints(
                    semi, desc_c, max_keypoints=cfg.frontend.max_keypoints,
                    radius=cfg.frontend.sp_nms_radius,
                    conf=cfg.frontend.sp_confidence_threshold,
                )
                checksum = jnp.sum(kps.score) + jnp.sum(desc) * 1e-6
                return checksum, (kps.xy, kps.score, kps.valid)

            chain_out, outs = jax.lax.scan(step, chain, chunks)
            return chain_out, outs

        chunks = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (n_chunks, sp_batch, c.height, c.width, 1), dtype=np.uint8
            )
        )
        chain0 = jnp.asarray(0.0, jnp.float32)
        ts_sp = _timed(
            lambda: frontend_sequence(params, chunks, chain0)[0], float
        )
        dt_sp = float(np.median(ts_sp))
        sp_sprd = _spread(ts_sp)
        sp_fps = n_chunks * sp_batch / dt_sp

    # ---------------- Tracking scan ----------------
    seq = synthetic.make_sequence(
        num_frames=n_frames,
        max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
        width=c.width, height=c.height,
        seed=0, num_landmarks=n_landmarks,
    )
    frames = pipeline.features_from_synthetic(seq)
    from vslam_tpu.core.state import init_state
    from vslam_tpu.core.pipeline import _scan_sequence

    gravity, h0 = pipeline.compute_gravity_direction(seq.accel, np.eye(3, dtype=np.float32))
    state0 = init_state(cfg, gravity=gravity, initial_height=h0)

    @jax.jit
    def scan_chained(state, frames):
        fs, outs = _scan_sequence(state, frames, cfg, 42)
        return jnp.sum(outs.t)

    ts_track = _timed(lambda: scan_chained(state0, frames), float)
    dt_track = float(np.median(ts_track))
    track_sprd = _spread(ts_track)
    track_fps = n_frames / dt_track

    # ---------------- Dense voxel fusion (per-frame in the reference) ------
    dense_fps = float("inf")
    dense_sprd = 0.0
    if not args.no_dense:
        # Synthetic room depth+color stream resident in HBM (uint8/f32),
        # poses from the tracked trajectory shape.
        kd = jax.random.PRNGKey(1)
        H, W = c.height, c.width
        depth_frames = jax.random.uniform(
            kd, (n_frames, H, W), jnp.float32, 0.3, 6.0
        )
        rgb_frames = jax.random.randint(
            jax.random.PRNGKey(2), (n_frames, H, W, 3), 0, 255, jnp.uint8
        )
        Rs = jnp.tile(jnp.eye(3, dtype=jnp.float32), (n_frames, 1, 1))
        t_path = jnp.asarray(seq.t, jnp.float32)

        @jax.jit
        def dense_chained(depths, rgbs, Rs, ts_):
            st = gridhash.init_dense_map(
                cfg.dense.hash_capacity, cfg.dense.cloud_capacity
            )
            st = gridhash.fuse_chunk_scan(
                st, depths, rgbs, Rs, ts_, c.fx, c.fy, c.cx, c.cy,
                pixel_step=cfg.dense.pixel_step, max_depth=cfg.dense.max_depth,
                voxel_size=cfg.dense.voxel_size,
                frames_per_step=math.gcd(n_frames, 16),
            )
            return st.cloud_count

        ts_dense = _timed(
            lambda: dense_chained(depth_frames, rgb_frames, Rs, t_path),
            lambda x: int(x),
        )
        dt_dense = float(np.median(ts_dense))
        dense_sprd = _spread(ts_dense)
        dense_fps = n_frames / dt_dense

    # ---------------- Batched multi-sequence tracking ----------------
    multi_fps = None
    multi_sprd = None
    if multi_b:
        from vslam_tpu.parallel import mesh as pmesh

        B = multi_b
        seqs = [
            synthetic.make_sequence(
                num_frames=n_frames,
                max_keypoints=cfg.frontend.max_keypoints,
                desc_dim=cfg.frontend.descriptor_dim,
                fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
                width=c.width, height=c.height,
                seed=s, num_landmarks=n_landmarks,
            )
            for s in range(B)
        ]
        mframes = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[pipeline.features_from_synthetic(s) for s in seqs],
        )
        mstates = pmesh.replicate_state(cfg, B)

        from vslam_tpu.core.tracking_batched import batched_tracking_scan

        @jax.jit
        def multi_chained(states, frames):
            fs, outs = batched_tracking_scan(states, frames, cfg, 42)
            return jnp.sum(outs.t)

        ts = _timed(
            lambda: multi_chained(mstates, mframes), float,
            iters=max(TIMED_ITERS - 2, 2),
        )
        dt_multi = float(np.median(ts))
        multi_sprd = _spread(ts)
        multi_fps = B * n_frames / dt_multi

    # ---------------- ATE oracle + backend passes ----------------
    from vslam_tpu.eval import ate as ate_mod

    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)

    # Backend (PGO + windowed BA, fused into ONE device program) runs once
    # per sequence; amortize its wall time into the per-frame cost
    # (reference ships local BA disabled, Config.h:99 — ours is on for
    # this measurement). Warm first.
    result_b = pipeline.run_backend(result, cfg)
    t0 = time.perf_counter()
    result_b = pipeline.run_backend(result, cfg)
    backend_s = time.perf_counter() - t0
    ate_backend = ate_mod.compute_ate(
        result_b.timestamps, result_b.t_smoothed, seq.timestamps, seq.t,
        with_scale=False,
    )

    # ---------------- Combined ----------------
    per_frame = (
        (0.0 if args.no_frontend else 1.0 / sp_fps)
        + 1.0 / track_fps
        + (0.0 if args.no_dense else 1.0 / dense_fps)
        + backend_s / n_frames
    )
    fps = 1.0 / per_frame
    # Production multi-sequence configuration: B sequences per chip share
    # the frontend/dense scans (per-frame cost identical) and the batched
    # tracking step; backend runs once per sequence.
    multi_e2e = None
    if multi_fps:
        pf_multi = (
            (0.0 if args.no_frontend else 1.0 / sp_fps)
            + 1.0 / multi_fps * 1.0  # aggregate tracking cost per frame
            + (0.0 if args.no_dense else 1.0 / dense_fps)
            + backend_s / n_frames
        )
        multi_e2e = 1.0 / pf_multi

    # Run-to-run variation of the END-TO-END number: combine the i-th timed
    # iteration of every stage into one per-frame cost and measure the
    # spread of those. (A max over per-stage spreads over-weights fast,
    # noisy stages — dense fusion at ~0.25 ms/frame can swing 2x without
    # moving the e2e number by even 1%.)
    e2e_iters = []
    for i in range(TIMED_ITERS):
        pf_i = (
            (0.0 if args.no_frontend else ts_sp[i] / (n_chunks * sp_batch))
            + ts_track[i] / n_frames
            + (0.0 if args.no_dense else ts_dense[i] / n_frames)
            + backend_s / n_frames
        )
        e2e_iters.append(pf_i)
    spread = _spread(e2e_iters)

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip end-to-end (SuperPoint + track + dense fusion + PGO/BA backend)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 3),
                "detail": {
                    "device": str(dev),
                    "frontend_fps": None if args.no_frontend else round(sp_fps, 2),
                    "tracking_fps": round(track_fps, 2),
                    "dense_fusion_fps": None if args.no_dense else round(dense_fps, 2),
                    "multi_seq_tracking_fps": None if multi_fps is None else round(multi_fps, 2),
                    "multi_seq_batch": multi_b or None,
                    "multi_seq_e2e_fps": None if multi_e2e is None else round(multi_e2e, 2),
                    "frames": n_frames,
                    "backend_s": round(backend_s, 3),
                    "timed_iters": TIMED_ITERS,
                    "fps_spread": round(spread, 4),
                    "stage_spread": {
                        "frontend": round(sp_sprd, 4),
                        "tracking": round(track_sprd, 4),
                        "dense": round(dense_sprd, 4),
                        "multi": None if multi_sprd is None else round(multi_sprd, 4),
                    },
                    "ate_rmse_synthetic_m": round(ate_res.rmse, 4),
                    "ate_rmse_after_backend_m": round(ate_backend.rmse, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
