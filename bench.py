"""End-to-end benchmark: SuperPoint frontend + tracking scan on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/200}

Baseline (BASELINE.md): >= 200 frames/sec/chip end-to-end (SuperPoint +
track + BA) at ATE RMSE <= 0.14 m. The reference publishes only "real
time" (~30 fps sensor rate) on GPU.

The pipeline measured here mirrors the production layout: batched
SuperPoint inference saturates the MXU across frame chunks while the
sequential tracking state machine runs as a `lax.scan`; fps is computed
from total wall time over all frames. ATE comes from the synthetic
ground-truth oracle (no TUM data in this image; see SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tiny", action="store_true", help="tiny shapes (smoke test)")
    ap.add_argument("--frames", type=int, default=0, help="tracked frames (0 = default)")
    ap.add_argument("--no-frontend", action="store_true", help="skip SuperPoint timing")
    ap.add_argument(
        "--multi", type=int, default=0,
        help="ALSO measure batched multi-sequence tracking (B sequences "
        "vmapped on this chip — the production throughput configuration)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig, tiny_test_config
    from vslam_tpu.core import pipeline
    from vslam_tpu.data import synthetic
    from vslam_tpu.models import superpoint as sp
    from vslam_tpu.ops import nms

    dev = jax.devices()[0]

    if args.tiny:
        cfg = tiny_test_config()
        n_frames = args.frames or 16
        sp_batch, sp_iters = 2, 2
        n_landmarks = 800
    else:
        cfg = SlamConfig()
        # Default workload sized like TUM fr2_pioneer_slam3 at FRAME_STEP=3:
        # ~848 processed frames (BASELINE.md).
        n_frames = args.frames or 848
        sp_batch, sp_iters = 32, 4
        n_landmarks = 6000

    c = cfg.camera

    # ---------------- Frontend: SuperPoint forward + decode ----------------
    # Timing methodology: dispatch through the axon relay costs ~50 ms RTT
    # and its block_until_ready does not truly synchronize, so the
    # production-shaped measurement is a SINGLE jitted program that scans
    # the frontend over all frame chunks on device, with one host readback
    # forcing completion. (A per-batch Python loop would measure relay
    # latency, not TPU throughput.)
    sp_fps = float("inf")
    if not args.no_frontend:
        params = sp.init_params(jax.random.PRNGKey(0), height=c.height, width=c.width)
        model = sp.SuperPoint()
        n_chunks = max(n_frames // sp_batch, 1)

        @jax.jit
        def frontend_sequence(params, chunks, chain):
            """chunks: (C, B, H, W, 1) uint8 -> scan frontend over chunks.

            Frames live in HBM as uint8 (4x less traffic than f32) and are
            normalized on-device per chunk — production ingest does the
            same (the native loader hands over uint8)."""

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
        chain = jnp.asarray(0.0, jnp.float32)
        ch, _ = frontend_sequence(params, chunks, chain)
        float(ch)  # warm + force completion
        t0 = time.perf_counter()
        for _ in range(sp_iters):
            ch, _ = frontend_sequence(params, chunks, ch * 0.0)
        float(ch)
        dt_sp = (time.perf_counter() - t0) / sp_iters
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

    # Warm-up/compile, then chained timed runs with final readback.
    import jax.numpy as _jnp

    @jax.jit
    def scan_chained(state, frames, chain):
        st = state._replace(t=state.t + 0.0 * chain)
        fs, outs = _scan_sequence(st, frames, cfg, 42)
        return fs, outs, _jnp.sum(outs.t)

    fs, outs, ch = scan_chained(state0, frames, _jnp.asarray(0.0, _jnp.float32))
    float(ch)
    iters = 4
    t0 = time.perf_counter()
    c0 = _jnp.asarray(0.0, _jnp.float32)
    for _ in range(iters):
        fs, outs, ch = scan_chained(state0, frames, c0)
        c0 = ch * 0.0
    float(ch)
    dt_track = (time.perf_counter() - t0) / iters
    track_fps = n_frames / dt_track

    # ---------------- Batched multi-sequence tracking ----------------
    multi_fps = None
    if args.multi:
        from vslam_tpu.parallel import mesh as pmesh

        B = args.multi
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
        fs, outs = pmesh.batched_tracking_scan(mstates, mframes, cfg)
        float(jnp.sum(outs.t))  # warm + complete
        t0 = time.perf_counter()
        for _ in range(2):
            fs, outs = pmesh.batched_tracking_scan(mstates, mframes, cfg)
            float(jnp.sum(outs.t))
        dt_multi = (time.perf_counter() - t0) / 2
        multi_fps = B * n_frames / dt_multi

    # ---------------- ATE oracle + backend passes ----------------
    from vslam_tpu.eval import ate as ate_mod

    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)

    # Backend (PGO + windowed BA) runs once per sequence; amortize its wall
    # time into the per-frame cost so the metric covers the baseline's
    # full "SuperPoint + track + BA" definition. (The reference ships with
    # local BA disabled, Config.h:99 — ours is on for this measurement.)
    # Warm-up first: jit compilation must not count as runtime.
    result_b = pipeline.run_posthoc_pgo(result, cfg)
    result_b = pipeline.run_windowed_ba(result_b, cfg)
    t0 = time.perf_counter()
    result_b = pipeline.run_posthoc_pgo(result, cfg)
    result_b = pipeline.run_windowed_ba(result_b, cfg)
    backend_s = time.perf_counter() - t0
    ate_backend = ate_mod.compute_ate(
        result_b.timestamps, result_b.t_smoothed, seq.timestamps, seq.t,
        with_scale=False,
    )

    # ---------------- Combined ----------------
    per_frame = (
        (0.0 if args.no_frontend else 1.0 / sp_fps)
        + 1.0 / track_fps
        + backend_s / n_frames
    )
    fps = 1.0 / per_frame

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip end-to-end (SuperPoint + track + PGO/BA backend)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 3),
                "detail": {
                    "device": str(dev),
                    "frontend_fps": None if args.no_frontend else round(sp_fps, 2),
                    "tracking_fps": round(track_fps, 2),
                    "multi_seq_tracking_fps": None if multi_fps is None else round(multi_fps, 2),
                    "frames": n_frames,
                    "backend_s": round(backend_s, 3),
                    "ate_rmse_synthetic_m": round(ate_res.rmse, 4),
                    "ate_rmse_after_backend_m": round(ate_backend.rmse, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
