"""End-to-end benchmark: SuperPoint frontend + tracking + dense fusion +
PGO/BA backend on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/200}

Baseline (BASELINE.md): >= 200 frames/sec/chip end-to-end at ATE RMSE
<= 0.14 m. The reference publishes only "real time" (~30 fps sensor rate)
on GPU; its per-frame loop includes dense voxel accumulation
(`/root/reference/src/main.cpp:1081-1146`), so the dense-fusion scan is
part of the per-frame metric here too.

The HEADLINE number is MEASURED, not modeled: one jitted program ingests
uint8 frames and runs SuperPoint -> decode -> keypoint depth -> tracking
scan -> dense fusion coupled (`core/coupled.py`, mirroring the
reference's everything-under-one-clock loop `src/main.cpp:1096-1309`),
timed over rasterized synthetic room sequences, with the PGO/BA backend's
once-per-sequence wall time amortized in. Per-stage programs are timed
separately for attribution (detail.e2e_stage_sum_fps is the round-2
style stage-sum), branch-execution counts accompany the coupled run so
the workload is auditable, and per-stage achieved TFLOP/s are derived
from the analytic FLOP model in `utils/flops.py`.

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
import sys
import time

import numpy as np

TIMED_ITERS = 5
WARMUP_ITERS = 2


def _note(msg):
    """Stage progress to stderr (stdout stays the single JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _timed(fn, readback, iters=None, warmup=WARMUP_ITERS):
    """Run fn() (returning a chain value) warmup+iters times; readback(x)
    forces completion. Returns list of per-iteration seconds.

    iters=None reads the (possibly --iters-overridden) module global at
    call time — a default bound at import would pin stage timings to 5
    samples while the e2e aggregation loops range(TIMED_ITERS)."""
    if iters is None:
        iters = TIMED_ITERS
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
    ap.add_argument(
        "--no-coupled", action="store_true",
        help="skip the measured coupled end-to-end program",
    )
    ap.add_argument(
        "--multi-coupled", default=None,
        help="comma-separated batch sizes for the MEASURED multi-sequence "
        "coupled runs (default '4,8'; '' = skip)",
    )
    ap.add_argument("--iters", type=int, default=0, help="timed iterations per stage")
    ap.add_argument(
        "--sp-batch", type=int, default=0,
        help="frontend-stage conv batch (0 = default 128, tiny 2)",
    )
    ap.add_argument(
        "--chunk", type=int, default=0,
        help="frames per coupled-pipeline chunk (frontend conv batch; "
        "0 = default 128, tiny 4)",
    )
    args = ap.parse_args()

    global TIMED_ITERS
    if args.iters:
        TIMED_ITERS = args.iters

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
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
        sp_batch = args.sp_batch or 2
        n_landmarks = 800
        multi_b = 2 if args.multi == -1 else args.multi
    else:
        cfg = SlamConfig()
        # Default workload sized like TUM fr2_pioneer_slam3 at FRAME_STEP=3:
        # ~848 processed frames (BASELINE.md).
        n_frames = args.frames or 848
        sp_batch = args.sp_batch or 128
        n_landmarks = 6000
        multi_b = 4 if args.multi == -1 else args.multi

    c = cfg.camera

    # ---------------- Frontend: SuperPoint forward + decode ----------------
    _note("frontend stage")
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
                checksum = (
                    jnp.sum(kps.score) + jnp.sum(desc) * 1e-6
                    + jnp.sum(kps.xy) * 1e-6
                    + jnp.sum(kps.valid.astype(jnp.float32)) * 1e-6
                )
                return checksum, None

            chain_out, _ = jax.lax.scan(step, chain, chunks)
            return chain_out

        chunks = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (n_chunks, sp_batch, c.height, c.width, 1), dtype=np.uint8
            )
        )
        chain0 = jnp.asarray(0.0, jnp.float32)
        ts_sp = _timed(
            lambda: frontend_sequence(params, chunks, chain0), float
        )
        dt_sp = float(np.median(ts_sp))
        sp_sprd = _spread(ts_sp)
        sp_fps = n_chunks * sp_batch / dt_sp
        del chunks  # free HBM before the next stage

    # ---------------- Tracking scan ----------------
    _note("tracking stage")
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
    _note("dense fusion stage")
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
            # Checksum over EVERY state leaf: a count-only readback lets
            # XLA dead-code-eliminate the cloud append itself (measured
            # — the round-3 bisect caught the round-2 number doing so).
            chk = jnp.float32(0.0)
            for leaf in jax.tree.leaves(st):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
            return chk

        ts_dense = _timed(
            lambda: dense_chained(depth_frames, rgb_frames, Rs, t_path),
            lambda x: float(x),
        )
        dt_dense = float(np.median(ts_dense))
        dense_sprd = _spread(ts_dense)
        dense_fps = n_frames / dt_dense
        del depth_frames, rgb_frames, Rs, t_path  # free HBM

    # ---------------- MEASURED coupled end-to-end ----------------
    # One program: uint8 frames -> SuperPoint -> decode -> kp depth ->
    # tracking scan -> dense fusion (core/coupled.py). This is the
    # headline; the stage timings above are attribution.
    coupled_fps = None
    coupled_sprd = 0.0
    ts_coupled = None
    coupled_diag = {}
    multi_measured = {}
    if not args.no_coupled:
        from vslam_tpu.core import coupled as coupled_mod
        from vslam_tpu.core.state import init_state as _init_state
        from vslam_tpu.eval import ate as ate_mod2
        from vslam_tpu.models import weights as wmod

        # Round the sequence UP to a chunk multiple (never truncate: a
        # bigger conv batch must not shrink the workload it is timed on).
        CHUNK = args.chunk or (4 if args.tiny else 128)
        S = max((n_frames + CHUNK - 1) // CHUNK, 1)
        nC = S * CHUNK
        if args.multi_coupled is None:
            mlist = [2] if args.tiny else [4, 8]
        else:
            mlist = [int(x) for x in args.multi_coupled.split(",") if x]
        B_max = max(mlist + [1])

        params_c, weight_src = wmod.load_or_init_superpoint(
            height=c.height, width=c.width
        )
        img_seqs = [
            synthetic.make_image_sequence(
                nC, width=c.width, height=c.height,
                fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
                seed=s, num_landmarks=(600 if args.tiny else 6000),
                radius=(2.0 if args.tiny else 3.0), with_rgb=(s == 0),
            )
            for s in range(B_max)
        ]
        d0 = img_seqs[0]
        H, W = c.height, c.width
        gray1 = jnp.asarray(d0["gray"].reshape(S, CHUNK, H, W))
        dep1 = jnp.asarray(d0["depth_u16"].reshape(S, CHUNK, H, W))
        rgb1 = jnp.asarray(d0["rgb"].reshape(S, CHUNK, H, W, 3))
        tsc1 = jnp.asarray(
            d0["timestamps"].reshape(S, CHUNK).astype(np.float32)
        )
        fid1 = jnp.asarray(np.arange(nC, dtype=np.int32).reshape(S, CHUNK))
        stat1 = jnp.zeros((S, CHUNK), bool)
        st_c0 = _init_state(cfg)
        dn_c0 = gridhash.init_dense_map(
            cfg.dense.hash_capacity, cfg.dense.cloud_capacity
        )

        def run_coupled_once():
            st_f, _, outs = coupled_mod.run_coupled(
                params_c, st_c0, dn_c0, gray1, dep1, rgb1, tsc1, fid1,
                stat1, cfg,
            )
            return st_f, outs

        @jax.jit
        def coupled_checksum(params_c, st0, dn0, gray, dep, rgb, tsc,
                             fid, stat):
            """The timed program: identical compute, scalar output. A
            checksum over every result leaf (trajectory, dense cloud,
            final state) keeps all of it live — returning the buffers
            themselves is not timed because the relay's output
            mirroring adds ~1.2 ms/frame of non-compute (bisect F vs
            G/H); on a directly-attached host outputs stay in HBM.
            (All arrays are ARGUMENTS: closure arrays embed as HLO
            constants and blow the relay's compile-request size cap.)"""
            st_f, dn_f, outs = coupled_mod.run_coupled(
                params_c, st0, dn0, gray, dep, rgb, tsc, fid, stat, cfg
            )
            chk = jnp.float32(0.0)
            for leaf in jax.tree.leaves(outs):
                chk = chk + jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree.leaves(dn_f):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
            for leaf in jax.tree.leaves(st_f):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-9
            return chk

        _note("coupled e2e stage (compile on first run)")
        st_cf, outs_c = run_coupled_once()  # warm + diagnostics
        ts_coupled = _timed(
            lambda: coupled_checksum(
                params_c, st_c0, dn_c0, gray1, dep1, rgb1, tsc1, fid1,
                stat1,
            ),
            float,
        )
        dt_c = float(np.median(ts_coupled))
        coupled_sprd = _spread(ts_coupled)
        coupled_fps = nC / dt_c

        def coupled_ates(dx, st_f, outs):
            """(raw, RTS-smoothed, smoothed+backend) ATE RMSE — the
            reference always RTS-smooths before evaluating
            (`src/main.cpp:1311`), so `smoothed` is the parity metric;
            `backend` adds the gain-gated PGO/BA pass the headline clock
            already pays for."""
            res = pipeline.result_from_outputs(
                st_f, outs, keep_refine=cfg.ekf.smooth_keep_refine,
                rts_parallel=cfg.ekf.rts_parallel,
            )
            res_b = pipeline.run_backend(res, cfg)

            def _ate(t_est):
                return float(
                    ate_mod2.compute_ate(
                        dx["timestamps"], np.asarray(t_est),
                        dx["timestamps"], dx["t"], with_scale=False,
                    ).rmse
                )

            rpe = ate_mod2.compute_rpe(
                dx["timestamps"], np.asarray(res.t_smoothed),
                dx["timestamps"], dx["t"],
            ).rmse
            return (
                _ate(res.t), _ate(res.t_smoothed), _ate(res_b.t_smoothed),
                float(rpe),
            )

        # ATE over multiple rendered worlds (same compiled program —
        # only the scene changes): a single run's ATE on this pipeline
        # is numerics-sensitive at the ±0.07 m level (conv-batch tiling
        # perturbs scores; keypoint ties flip; SLAM is chaotic in that
        # perturbation), so report median-of-3 with the spread.
        ate_rows = [coupled_ates(d0, st_cf, outs_c)]
        for s_extra in (1, 2):
            if s_extra >= len(img_seqs):
                break
            dx = img_seqs[s_extra]
            g_x = jnp.asarray(dx["gray"].reshape(S, CHUNK, H, W))
            d_x = jnp.asarray(dx["depth_u16"].reshape(S, CHUNK, H, W))
            t_x = jnp.asarray(
                dx["timestamps"].reshape(S, CHUNK).astype(np.float32)
            )
            st_x, _, outs_x = coupled_mod.run_coupled(
                params_c, st_c0, dn_c0, g_x, d_x, rgb1, t_x, fid1,
                stat1, cfg,
            )
            ate_rows.append(coupled_ates(dx, st_x, outs_x))
            del g_x, d_x, st_x, outs_x
        ates_raw = [r[0] for r in ate_rows]
        ates_smooth = [r[1] for r in ate_rows]
        ates_backend = [r[2] for r in ate_rows]
        rpes = [r[3] for r in ate_rows]
        coupled_diag = {
            "ate_rmse_coupled_m": round(float(np.median(ates_smooth)), 4),
            "rpe_rmse_coupled_m": round(float(np.median(rpes)), 4),
            "ate_coupled_seeds_m": [round(a, 4) for a in ates_smooth],
            "ate_coupled_raw_m": round(float(np.median(ates_raw)), 4),
            "ate_coupled_after_backend_m": round(
                float(np.median(ates_backend)), 4
            ),
            "weight_source": str(weight_src).split("/")[-1],
            "frames": nC,
            "branch_counts": {
                "keyframes": int(np.asarray(outs_c.is_keyframe).sum()),
                "bridged": int(np.asarray(outs_c.bridged).sum()),
                "recovered": int(np.asarray(outs_c.recovered).sum()),
                "essential_frames": int(
                    (~np.asarray(outs_c.used_3d3d)
                     & np.asarray(outs_c.tracking_ok)).sum()
                ),
                "tracked_frac": round(
                    float(np.asarray(outs_c.tracking_ok)[1:].mean()), 4
                ),
                "mean_matches": round(
                    float(np.asarray(outs_c.num_matches)[1:].mean()), 1
                ),
            },
        }
        del gray1, dep1, rgb1

        # Measured multi-sequence coupled runs (B independent streams).
        from vslam_tpu.parallel import mesh as pmesh2

        # Frame data is ~0.9 MB/frame (u8 gray + u16 depth); cap resident
        # frames so large B fits HBM next to the maps/states. The cap is
        # REPORTED per run (frames_per_seq) — no silent truncation.
        frame_budget = 4 * nC
        for B in mlist:
            if B <= 1:
                continue
            # Keep the frontend conv batch (C_m*B) near the single-seq
            # CHUNK so a large default chunk doesn't blow HBM at large B.
            C_m = max(CHUNK // B, 8)
            n_m = min(nC, (frame_budget // B) // C_m * C_m)
            _note(f"multi-coupled B={B}, {n_m} frames/seq, chunk {C_m}")
            S_m = n_m // C_m
            try:
                grayB = jnp.asarray(
                    np.stack([s["gray"][:n_m] for s in img_seqs[:B]], axis=1)
                    .reshape(S_m, C_m, B, H, W)
                )
                depB = jnp.asarray(
                    np.stack(
                        [s["depth_u16"][:n_m] for s in img_seqs[:B]], axis=1
                    ).reshape(S_m, C_m, B, H, W)
                )
                tsB = jnp.asarray(
                    np.stack(
                        [
                            s["timestamps"][:n_m].astype(np.float32)
                            for s in img_seqs[:B]
                        ],
                        axis=1,
                    ).reshape(S_m, C_m, B)
                )
                fidB = jnp.asarray(
                    np.broadcast_to(
                        np.arange(n_m, dtype=np.int32)[:, None], (n_m, B)
                    ).reshape(S_m, C_m, B)
                )
                statB = jnp.zeros((S_m, C_m, B), bool)
                stsB = pmesh2.replicate_state(cfg, B)
                dnB = jax.tree.map(lambda x: jnp.stack([x] * B), dn_c0)

                @jax.jit
                def run_multi_checksum(params_c, stsB, dnB, grayB, depB,
                                       tsB, fidB, statB):
                    sts_f, dn_f, outs = coupled_mod.run_coupled_batched(
                        params_c, stsB, dnB, grayB, depB, tsB, fidB, statB,
                        cfg,
                    )
                    chk = jnp.float32(0.0)
                    for leaf in jax.tree.leaves(outs):
                        chk = chk + jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(dn_f):
                        chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
                    for leaf in jax.tree.leaves(sts_f):
                        chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-9
                    return chk

                _mc_args = (
                    params_c, stsB, dnB, grayB, depB, tsB, fidB, statB
                )
                ts_m = _timed(
                    lambda: run_multi_checksum(*_mc_args), float,
                    iters=max(TIMED_ITERS - 2, 2),
                )
                dt_m = float(np.median(ts_m))
                multi_measured[f"B{B}"] = {
                    "aggregate_fps": round(B * n_m / dt_m, 2),
                    "per_seq_fps": round(n_m / dt_m, 2),
                    "frames_per_seq": n_m,
                    "spread": round(_spread(ts_m), 4),
                }
            except Exception as e:  # noqa: BLE001 — report, don't abort
                multi_measured[f"B{B}"] = {
                    "error": type(e).__name__ + ": " + str(e)[:160]
                }
            finally:
                # Release device buffers before the next (bigger) B —
                # including _mc_args, which otherwise keeps every stack
                # alive through the next B's allocation (doubling peak HBM).
                grayB = depB = tsB = fidB = statB = stsB = dnB = None  # noqa: F841
                _mc_args = None  # noqa: F841

    # ---------------- Batched multi-sequence tracking ----------------
    _note("batched multi-sequence tracking")
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
        del mframes, mstates  # free HBM

    # ---------------- ATE oracle + backend passes ----------------
    _note("ATE oracle + backend")
    from vslam_tpu.eval import ate as ate_mod

    result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)

    # Backend (PGO + windowed BA, fused into ONE device program) runs once
    # per sequence; amortize its wall time into the per-frame cost
    # (reference ships local BA disabled, Config.h:99 — ours is on for
    # this measurement). Warm first.
    result_b = pipeline.run_backend(result, cfg)  # warm (compile)
    ts_backend = []
    for _ in range(TIMED_ITERS):
        t0 = time.perf_counter()
        result_b = pipeline.run_backend(result, cfg)
        ts_backend.append(time.perf_counter() - t0)
    backend_s = float(np.median(ts_backend))
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
    stage_sum_fps = 1.0 / per_frame

    # Headline: the MEASURED coupled program + once-per-sequence backend
    # amortized per frame. Falls back to the stage-sum when --no-coupled.
    if coupled_fps is not None:
        nC = coupled_diag["frames"]
        fps = 1.0 / (1.0 / coupled_fps + backend_s / nC)
        e2e_iters = [
            ts_coupled[min(i, len(ts_coupled) - 1)] / nC + ts_backend[i] / nC
            for i in range(TIMED_ITERS)
        ]
    else:
        fps = stage_sum_fps
        e2e_iters = []
        for i in range(TIMED_ITERS):
            pf_i = (
                (0.0 if args.no_frontend else ts_sp[i] / (n_chunks * sp_batch))
                + ts_track[i] / n_frames
                + (0.0 if args.no_dense else ts_dense[i] / n_frames)
                + ts_backend[i] / n_frames
            )
            e2e_iters.append(pf_i)
    spread = _spread(e2e_iters)

    # Achieved TFLOP/s from the analytic FLOP model (utils/flops.py) so
    # MFU claims are auditable.
    from vslam_tpu.utils import flops as flops_mod

    sp_flops = flops_mod.superpoint_flops_per_frame(c.height, c.width)
    tr_flops = flops_mod.tracking_flops_per_frame(
        cfg.frontend.max_keypoints, cfg.frontend.descriptor_dim,
        cfg.map.map_capacity,
    )

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip end-to-end MEASURED (uint8 frames -> SuperPoint -> track -> dense fusion, one program; + PGO/BA backend)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 3),
                "detail": {
                    "device": str(dev),
                    "e2e_measured_fps": None if coupled_fps is None else round(coupled_fps, 2),
                    "e2e_stage_sum_fps": round(stage_sum_fps, 2),
                    "coupled": coupled_diag or None,
                    "multi_coupled_measured": multi_measured or None,
                    "frontend_fps": None if args.no_frontend else round(sp_fps, 2),
                    "tracking_fps": round(track_fps, 2),
                    "dense_fusion_fps": None if args.no_dense else round(dense_fps, 2),
                    "multi_seq_tracking_fps": None if multi_fps is None else round(multi_fps, 2),
                    "multi_seq_batch": multi_b or None,
                    "frames": n_frames,
                    "backend_s": round(backend_s, 3),
                    "timed_iters": TIMED_ITERS,
                    "fps_spread": round(spread, 4),
                    "stage_spread": {
                        "frontend": round(sp_sprd, 4),
                        "tracking": round(track_sprd, 4),
                        "dense": round(dense_sprd, 4),
                        "coupled": round(coupled_sprd, 4),
                        "multi": None if multi_sprd is None else round(multi_sprd, 4),
                    },
                    "frontend_tflops": None if args.no_frontend else round(
                        sp_flops * sp_fps / 1e12, 2
                    ),
                    "tracking_tflops": round(tr_flops * track_fps / 1e12, 2),
                    "flop_model": flops_mod.describe(),
                    "ate_rmse_synthetic_m": round(ate_res.rmse, 4),
                    "ate_rmse_after_backend_m": round(ate_backend.rmse, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
