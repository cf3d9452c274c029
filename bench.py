"""End-to-end benchmark: SuperPoint frontend + tracking + dense fusion +
PGO/BA backend on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/200}

Baseline (BASELINE.md): >= 200 frames/sec/chip end-to-end at ATE RMSE
<= 0.14 m. The reference publishes only "real time" (~30 fps sensor rate)
on GPU; its per-frame loop includes dense voxel accumulation
(`/root/reference/src/main.cpp:1081-1146`), so dense fusion is part of
the per-frame metric here too.

The HEADLINE number is MEASURED, not modeled: one jitted program ingests
uint8 frames and runs SuperPoint -> decode -> keypoint depth -> tracking
scan -> dense fusion coupled (`core/coupled.py`, mirroring the
reference's everything-under-one-clock loop `src/main.cpp:1096-1309`),
timed over rasterized synthetic room sequences, with the PGO/BA backend's
once-per-sequence wall time amortized in.

FAILURE CONTAINMENT (round-3 lesson: a driver timeout lost the round's
official number, BENCH_r03 rc=124):
  * the REQUIRED path (coupled program + backend) runs FIRST; everything
    else — stage attribution, stress/mono workloads, multi-sequence runs,
    extended ATE evidence — is optional, wrapped in try/except, and
    skipped when the remaining `--budget` wall clock can't cover its
    estimated cost (skips recorded in detail.skipped_stages);
  * the JSON line is printed from a finally block from whatever was
    measured, and a SIGTERM/SIGINT handler emits it too, so even an
    external kill leaves a parseable result on stdout.

Methodology (axon relay: ~50 ms dispatch RTT, block_until_ready does not
synchronize — CLAUDE.md):
  * every stage is ONE jitted program scanned over the whole workload,
    with a scalar host readback as the completion barrier; timed programs
    return a CHECKSUM over every result leaf (returning buffers pays
    relay output mirroring; reducing fewer leaves lets XLA DCE work);
  * 2 warm-up runs per stage, then TIMED_ITERS timed runs; the reported
    number is the MEDIAN and `detail.fps_spread` records
    (max-min)/median across iterations.

Workloads beyond the healthy-path headline (round-4 additions):
  * STRESS: a stress world (`synthetic.make_stress_image_sequence`) puts
    the expensive rare branches INSIDE the measured run — a stationary
    pause (C16), a texture-dropout stretch forcing bridge keyframes +
    PnP recovery (`src/Slam.cpp:847-872, 535-613`) — reported as
    stress_fps / stress ATE / branch counts. Same compiled program as
    the headline (same shapes; only the pixels and IMU change).
  * MONO: the same program fed all-invalid depth exercises the
    essential-matrix + scale-chain mode end-to-end
    (`src/Slam.cpp:966-984`); mono ATE is sim(3)-aligned (monocular
    scale ambiguity).
  * LONG: a 2.5-revolution stress sequence at the reference's true
    sequence scale (>= 2544 frames, `README.md:5`) fires loop closure at
    the production 200-keyframe cadence in-run (`src/Slam.cpp:1084`).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import signal
import sys
import time

import numpy as np

TIMED_ITERS = 5
WARMUP_ITERS = 2
T0 = time.time()


def _note(msg):
    """Stage progress to stderr (stdout stays the single JSON line)."""
    print(
        f"[bench {time.strftime('%H:%M:%S')} +{time.time() - T0:5.0f}s] {msg}",
        file=sys.stderr, flush=True,
    )


def _timed(fn, readback, iters=None, warmup=WARMUP_ITERS):
    """Run fn() (returning a chain value) warmup+iters times; readback(x)
    forces completion. Returns list of per-iteration seconds."""
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
    ap.add_argument(
        "--budget", type=float, default=0.0,
        help="wall-clock budget in seconds (default 960 full / 1200 tiny-cpu); "
        "optional stages are skipped when the remaining budget can't cover "
        "their estimated cost. 0 = default.",
    )
    ap.add_argument(
        "--stages", default="",
        help="comma-separated subset of optional stages to run (default all): "
        "ate3,stress,mono,mono_depth,noise,ate_holdout,frontend,tracking,"
        "dense,multi_coupled,oracle,multi_tracking,ate_wide,long",
    )
    ap.add_argument(
        "--multi", type=int, default=-1,
        help="batch size for multi-sequence tracking (-1 = default 4, 0 = skip)",
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
        help="frames per coupled-pipeline chunk (0 = default 128, tiny 4)",
    )
    args = ap.parse_args()

    global TIMED_ITERS
    if args.iters:
        TIMED_ITERS = args.iters
    budget = args.budget or (1200.0 if (args.tiny and args.cpu) else 960.0)
    only_stages = set(s for s in args.stages.split(",") if s)

    # ---------------- result state + always-emit machinery ----------------
    detail = {"skipped_stages": [], "errors": {}}
    hl = {"coupled_fps": None, "backend_s": None, "nC": 0,
          "ts_coupled": None, "ts_backend": None}
    emitted = [False]

    def emit():
        if emitted[0]:
            return
        emitted[0] = True
        # Headline: measured coupled program + once-per-sequence backend
        # amortized per frame; degrade gracefully to partial evidence.
        fps = 0.0
        if hl["coupled_fps"]:
            if hl["backend_s"] is not None and hl["nC"]:
                fps = 1.0 / (1.0 / hl["coupled_fps"] + hl["backend_s"] / hl["nC"])
            else:
                fps = hl["coupled_fps"]
                detail["errors"].setdefault(
                    "backend", "not timed; headline omits backend amortization"
                )
        elif detail.get("e2e_stage_sum_fps"):
            fps = detail["e2e_stage_sum_fps"]
        if hl["ts_coupled"] and hl["ts_backend"] and hl["nC"]:
            e2e_iters = [
                hl["ts_coupled"][min(i, len(hl["ts_coupled"]) - 1)] / hl["nC"]
                + hl["ts_backend"][min(i, len(hl["ts_backend"]) - 1)] / hl["nC"]
                for i in range(TIMED_ITERS)
            ]
            detail["fps_spread"] = round(_spread(e2e_iters), 4)
        detail["elapsed_s"] = round(time.time() - T0, 1)
        detail["budget_s"] = budget
        detail["timed_iters"] = TIMED_ITERS
        print(
            json.dumps(
                {
                    "metric": "frames/sec/chip end-to-end MEASURED (uint8 frames -> SuperPoint -> track -> dense fusion, one program; + PGO/BA backend)",
                    "value": round(fps, 2),
                    "unit": "fps",
                    "vs_baseline": round(fps / 200.0, 3),
                    "detail": detail,
                }
            ),
            flush=True,
        )

    def _on_term(signum, frame):
        _note(f"signal {signum}: emitting partial result")
        detail["errors"]["signal"] = f"terminated by signal {signum}"
        emit()
        os._exit(1)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    def stage(name, est_s, fn, required=False):
        """Run an optional stage under the wall-clock budget with error
        containment. Returns fn() or None (skipped / failed)."""
        if not required:
            if only_stages and name not in only_stages:
                detail["skipped_stages"].append(f"{name} (--stages)")
                return None
            remaining = budget - (time.time() - T0)
            if remaining < est_s:
                detail["skipped_stages"].append(
                    f"{name} (budget: {remaining:.0f}s left < est {est_s}s)"
                )
                _note(f"SKIP {name}: {remaining:.0f}s left < est {est_s}s")
                return None
        _note(f"{name} stage")
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — contain, report, continue
            msg = f"{type(e).__name__}: {str(e)[:200]}"
            detail["errors"][name] = msg
            _note(f"ERROR in {name}: {msg}")
            if required:
                raise
            return None

    try:
        _run_stages(args, detail, hl, stage, budget)
    except Exception as e:  # noqa: BLE001
        detail["errors"].setdefault("fatal", f"{type(e).__name__}: {str(e)[:300]}")
        import traceback

        traceback.print_exc(file=sys.stderr)
    finally:
        emit()


def _run_stages(args, detail, hl, stage, budget):
    _note("init: importing jax")
    import jax

    def budget_left():
        return budget - (time.time() - T0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig, tiny_test_config
    from vslam_tpu.core import coupled as coupled_mod
    from vslam_tpu.core import pipeline
    from vslam_tpu.core.state import init_state
    from vslam_tpu.data import synthetic
    from vslam_tpu.eval import ate as ate_mod
    from vslam_tpu.models import superpoint as sp
    from vslam_tpu.models import weights as wmod
    from vslam_tpu.ops import gridhash, nms

    _note("init: device discovery (a dead/slow axon tunnel blocks here)")
    dev = jax.devices()[0]
    detail["device"] = str(dev)
    _note(f"init: device = {dev}")

    if args.tiny:
        cfg = tiny_test_config()
        n_frames = args.frames or 16
        sp_batch = args.sp_batch or 2
        n_landmarks = 800
        lm_img = 600
        multi_b = 2 if args.multi == -1 else args.multi
        mlist = [2] if args.multi_coupled is None else [
            int(x) for x in args.multi_coupled.split(",") if x
        ]
        long_frames = 48
    else:
        cfg = SlamConfig()
        # Default workload sized like TUM fr2_pioneer_slam3 at FRAME_STEP=3:
        # ~848 processed frames (BASELINE.md).
        n_frames = args.frames or 848
        sp_batch = args.sp_batch or 128
        n_landmarks = 6000
        lm_img = 6000
        multi_b = 4 if args.multi == -1 else args.multi
        mlist = [4, 8] if args.multi_coupled is None else [
            int(x) for x in args.multi_coupled.split(",") if x
        ]
        # Reference true scale: 2,544 frames (`/root/reference/README.md:5`).
        long_frames = 2560
    c = cfg.camera

    def E(full, tiny):
        return tiny if args.tiny else full

    # Coupled-sequence geometry (chunk-rounded UP, never truncated).
    CHUNK = args.chunk or (4 if args.tiny else 128)
    S = max((n_frames + CHUNK - 1) // CHUNK, 1)
    nC = S * CHUNK
    H, W = c.height, c.width

    # Lazily generated rendered worlds, shared by the ATE seeds, the
    # multi-coupled members and the long run. Rasterizing a 896-frame
    # world costs ~2 min of single-core host time, so worlds are ALSO
    # disk-cached (`data/worldcache.py`, keyed by every generation
    # parameter + synthetic.DATA_VERSION) — the driver's budgeted run
    # loads them in seconds (`scripts/pregen_worlds.py` pre-populates).
    from vslam_tpu.data import worldcache as wc

    _worlds = {}
    _radius = 2.0 if args.tiny else 3.0

    # Stress-variant generation kwargs, defined ONCE so the cache tag
    # (hashed over every kwarg, ADVICE r4) and the maker can never drift.
    STRESS_KW = {
        "s101_l1": dict(seed=101, loops=1.0),
        "s202_l2.5": dict(seed=202, loops=2.5, pause=(0.3, 0.02),
                          dropout=(0.6, 0.01)),
    }

    def _world_est(seed, gen_est, cached_est=20):
        """Budget estimate for a cached dataset: cheap when on disk."""
        tag = wc.image_world_tag(nC, W, H, seed, lm_img, _radius,
                                 c.fx, c.fy, c.cx, c.cy)
        return cached_est if wc.is_cached(tag) else gen_est

    def _stress_est(variant, n, gen_est, cached_est=20):
        tag = wc.stress_world_tag(
            n, W, H, lm_img, variant,
            fx=float(c.fx), fy=float(c.fy), cx=float(c.cx), cy=float(c.cy),
            **STRESS_KW[variant],
        )
        return cached_est if wc.is_cached(tag) else gen_est

    def world(seed):
        if seed not in _worlds:
            _note(f"  world seed={seed} ({nC} frames; disk-cached)")
            d = wc.image_world(
                nC, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
                seed=seed, num_landmarks=lm_img, radius=_radius,
            )
            if seed == 0:
                d["rgb"] = np.repeat(d["gray"][..., None], 3, -1)
            # LRU cap (ADVICE r4): a VGA 896-frame world holds ~0.8 GB of
            # host gray+depth; the wide-ATE sweep touches 10 of them, and
            # an unbounded dict risks OOM-killing the budgeted run on the
            # single-core host. multi_coupled reuses seeds 0-3, so keep 4.
            while len(_worlds) >= 4:
                evict = next(k for k in _worlds if k != 0)
                del _worlds[evict]
            _worlds[seed] = d
        return _worlds[seed]

    def stress_world(variant, n):
        return wc.stress_world(
            variant, n, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx,
            cy=c.cy, num_landmarks=lm_img, **STRESS_KW[variant],
        )

    def chunked(x, dtype=None):
        a = np.asarray(x)
        if dtype is not None:
            a = a.astype(dtype)
        return jnp.asarray(a.reshape((S, CHUNK) + a.shape[1:]))

    # ================= REQUIRED: coupled headline program =================
    params_c, weight_src = wmod.load_or_init_superpoint(height=H, width=W)
    detail["coupled"] = {"weight_source": str(weight_src).split("/")[-1],
                         "frames": nC}
    st_c0 = init_state(cfg)
    dn_c0 = gridhash.init_dense_map(cfg.dense.hash_capacity, cfg.dense.cloud_capacity)

    @jax.jit
    def coupled_checksum(params_c, st0, dn0, gray, dep, rgb, tsc, fid, stat):
        """The timed program: identical compute, scalar output. A checksum
        over every result leaf (trajectory, dense cloud, final state)
        keeps all of it live — returning the buffers themselves is not
        timed because the relay's output mirroring adds ~1.2 ms/frame of
        non-compute (round-3 bisect); a count-only readback lets XLA DCE
        the cloud append (round-3 caught the round-2 number doing so).
        All arrays are ARGUMENTS: closure arrays embed as HLO constants
        and blow the relay's compile-request size cap."""
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

    def run_world(gray, dep, rgb, tsc, fid, stat, st0=None):
        """One full-output coupled run (diagnostics path; NOT timed)."""
        st_f, dn_f, outs = coupled_mod.run_coupled(
            params_c, st0 if st0 is not None else st_c0, dn_c0,
            gray, dep, rgb, tsc, fid, stat, cfg,
        )
        return st_f, dn_f, outs

    def _stage_coupled():
        d0 = world(0)
        gray1 = chunked(d0["gray"])
        dep1 = chunked(d0["depth_u16"])
        rgb1 = chunked(d0["rgb"])
        tsc1 = chunked(d0["timestamps"], np.float32)
        fid1 = chunked(np.arange(nC, dtype=np.int32))
        stat1 = jnp.zeros((S, CHUNK), bool)
        _note("  compiling + warming coupled program (slow on cold cache)")
        st_cf, _, outs_c = run_world(gray1, dep1, rgb1, tsc1, fid1, stat1)
        ts_coupled = _timed(
            lambda: coupled_checksum(
                params_c, st_c0, dn_c0, gray1, dep1, rgb1, tsc1, fid1, stat1
            ),
            float,
        )
        return (gray1, dep1, rgb1, tsc1, fid1, stat1, st_cf, outs_c, ts_coupled)

    (gray1, dep1, rgb1, tsc1, fid1, stat1, st_cf, outs_c, ts_coupled) = stage(
        "coupled", 0, _stage_coupled, required=True
    )
    dt_c = float(np.median(ts_coupled))
    hl.update(coupled_fps=nC / dt_c, nC=nC, ts_coupled=ts_coupled)
    detail["e2e_measured_fps"] = round(nC / dt_c, 2)
    detail.setdefault("stage_spread", {})["coupled"] = round(_spread(ts_coupled), 4)

    def coupled_ates(gt_ts, gt_t, st_f, outs, with_scale=False):
        """(raw, RTS-smoothed, smoothed+backend, RPE) — the reference
        always RTS-smooths before evaluating (`src/main.cpp:1311`), so
        `smoothed` is the parity metric; `backend` adds the gain-gated
        PGO/BA pass the headline clock already pays for."""
        res = pipeline.result_from_outputs(
            st_f, outs, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        res_b = pipeline.run_backend(res, cfg)

        def _ate(t_est):
            return float(
                ate_mod.compute_ate(
                    gt_ts, np.asarray(t_est), gt_ts, gt_t,
                    with_scale=with_scale,
                ).rmse
            )

        rpe = ate_mod.compute_rpe(
            gt_ts, np.asarray(res.t_smoothed), gt_ts, gt_t
        ).rmse
        return (_ate(res.t), _ate(res.t_smoothed), _ate(res_b.t_smoothed),
                float(rpe))

    # ---- REQUIRED: backend timing (headline amortization) + seed-0 ATE ----
    def _stage_backend():
        d0 = world(0)
        res0 = pipeline.result_from_outputs(
            st_cf, outs_c, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        pipeline.run_backend(res0, cfg)  # warm (compile)
        ts_backend = []
        for _ in range(TIMED_ITERS):
            t0 = time.perf_counter()
            res_b0 = pipeline.run_backend(res0, cfg)
            ts_backend.append(time.perf_counter() - t0)

        def _ate(t_est):
            return float(
                ate_mod.compute_ate(
                    d0["timestamps"], np.asarray(t_est),
                    d0["timestamps"], d0["t"], with_scale=False,
                ).rmse
            )

        rpe = ate_mod.compute_rpe(
            d0["timestamps"], np.asarray(res0.t_smoothed),
            d0["timestamps"], d0["t"],
        ).rmse
        row0 = (_ate(res0.t), _ate(res0.t_smoothed), _ate(res_b0.t_smoothed),
                float(rpe))
        return ts_backend, row0

    ts_backend, row0 = stage("backend", 0, _stage_backend, required=True)
    backend_s = float(np.median(ts_backend))
    hl.update(backend_s=backend_s, ts_backend=ts_backend)
    detail["backend_s"] = round(backend_s, 3)
    ate_rows = [row0]
    # Branch-execution counts: the workload's honesty record.
    detail["coupled"]["branch_counts"] = {
        "keyframes": int(np.asarray(outs_c.is_keyframe).sum()),
        "bridged": int(np.asarray(outs_c.bridged).sum()),
        "recovered": int(np.asarray(outs_c.recovered).sum()),
        "essential_frames": int(
            (~np.asarray(outs_c.used_3d3d) & np.asarray(outs_c.tracking_ok)).sum()
        ),
        "tracked_frac": round(float(np.asarray(outs_c.tracking_ok)[1:].mean()), 4),
        "mean_matches": round(float(np.asarray(outs_c.num_matches)[1:].mean()), 1),
    }

    def _finish_ates():
        detail["coupled"].update(
            ate_rmse_coupled_m=round(float(np.median([r[1] for r in ate_rows])), 4),
            rpe_rmse_coupled_m=round(float(np.median([r[3] for r in ate_rows])), 4),
            ate_coupled_seeds_m=[round(r[1], 4) for r in ate_rows],
            ate_coupled_raw_m=round(float(np.median([r[0] for r in ate_rows])), 4),
            ate_coupled_after_backend_m=round(
                float(np.median([r[2] for r in ate_rows])), 4
            ),
        )

    _finish_ates()

    # ================= OPTIONAL stages (budget-guarded) =================

    # ---- ATE over extra rendered worlds (same compiled program) ----
    def _ate_seed(s):
        dx = world(s)
        g_x = chunked(dx["gray"])
        d_x = chunked(dx["depth_u16"])
        t_x = chunked(dx["timestamps"], np.float32)
        st_x, _, outs_x = run_world(g_x, d_x, rgb1, t_x, fid1, stat1)
        ate_rows.append(
            coupled_ates(dx["timestamps"], dx["t"], st_x, outs_x)
        )

    def _stage_ate3():
        for s in (1, 2):
            _ate_seed(s)
        _finish_ates()

    stage(
        "ate3",
        _world_est(1, E(160, 12)) + _world_est(2, E(160, 12)) + E(50, 15),
        _stage_ate3,
    )

    # ---- STRESS: stationary pause + texture dropout, same program ----
    def _stage_stress():
        sd = stress_world("s101_l1", nC)
        stat_np = pipeline.detect_stationary(
            sd["accel"], sd["timestamps"],
            window=cfg.ekf.stationary_window_s,
            threshold=cfg.ekf.stationary_accel_std,
        )
        gravity, h0 = pipeline.compute_gravity_direction(
            sd["accel"], np.eye(3, dtype=np.float32)
        )
        st_s0 = init_state(cfg, gravity=gravity, initial_height=h0)
        grayS = chunked(sd["gray"])
        depS = chunked(sd["depth_u16"])
        tsS = chunked(sd["timestamps"], np.float32)
        statS = chunked(stat_np)
        st_sf, _, outs_s = run_world(grayS, depS, rgb1, tsS, fid1, statS,
                                     st0=st_s0)
        res_s = pipeline.result_from_outputs(
            st_sf, outs_s, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        res_sb = pipeline.run_backend(res_s, cfg)
        ate_s = float(ate_mod.compute_ate(
            sd["timestamps"], res_s.t_smoothed, sd["timestamps"], sd["t"],
            with_scale=False,
        ).rmse)
        ate_sb = float(ate_mod.compute_ate(
            sd["timestamps"], res_sb.t_smoothed, sd["timestamps"], sd["t"],
            with_scale=False,
        ).rmse)
        ts_s = _timed(
            lambda: coupled_checksum(
                params_c, st_s0, dn_c0, grayS, depS, rgb1, tsS, fid1, statS
            ),
            float, iters=max(TIMED_ITERS - 2, 2), warmup=1,
        )
        dt_s = float(np.median(ts_s))
        detail["stress"] = {
            "stress_fps": round(nC / dt_s, 2),
            "stress_fps_with_backend": round(
                1.0 / (dt_s / nC + backend_s / nC), 2
            ),
            "stress_ate_rmse_m": round(ate_s, 4),
            "stress_ate_after_backend_m": round(ate_sb, 4),
            "spread": round(_spread(ts_s), 4),
            "branch_counts": {
                "keyframes": int(np.asarray(outs_s.is_keyframe).sum()),
                "bridged": int(np.asarray(outs_s.bridged).sum()),
                "recovered": int(np.asarray(outs_s.recovered).sum()),
                "stationary_frames": int(stat_np.sum()),
                "essential_frames": int(
                    (~np.asarray(outs_s.used_3d3d)
                     & np.asarray(outs_s.tracking_ok)).sum()
                ),
                "lost_frames": int((~np.asarray(outs_s.tracking_ok)).sum()),
                "loop_constraints": int(
                    np.asarray(st_sf.loops.valid).sum()
                ),
                "tracked_frac": round(
                    float(np.asarray(outs_s.tracking_ok)[1:].mean()), 4
                ),
            },
        }

    stage(
        "stress",
        _stress_est("s101_l1", nC, E(200, 25)) + E(60, 15),
        _stage_stress,
    )

    # ---- LONG: reference true sequence scale (runs EARLY: the flagship
    # quality number must survive a tight driver budget) ----
    def _stage_long():
        S_l = (long_frames + CHUNK - 1) // CHUNK
        nL = S_l * CHUNK
        ld = stress_world("s202_l2.5", nL)
        stat_np = pipeline.detect_stationary(
            ld["accel"], ld["timestamps"],
            window=cfg.ekf.stationary_window_s,
            threshold=cfg.ekf.stationary_accel_std,
        )
        gravity, h0 = pipeline.compute_gravity_direction(
            ld["accel"], np.eye(3, dtype=np.float32)
        )
        st_l0 = init_state(cfg, gravity=gravity, initial_height=h0)

        def chunkedL(x, dtype=None):
            a = np.asarray(x)
            if dtype is not None:
                a = a.astype(dtype)
            return jnp.asarray(a.reshape((S_l, CHUNK) + a.shape[1:]))

        grayL = chunkedL(ld["gray"])
        depL = chunkedL(ld["depth_u16"])
        tsL = chunkedL(ld["timestamps"], np.float32)
        fidL = chunkedL(np.arange(nL, dtype=np.int32))
        statL = chunkedL(stat_np)
        st_lf, _, outs_l = run_world(grayL, depL, None, tsL, fidL, statL,
                                     st0=st_l0)
        res_l = pipeline.result_from_outputs(
            st_lf, outs_l, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        res_lb = pipeline.run_backend(res_l, cfg)
        ate_l = float(ate_mod.compute_ate(
            ld["timestamps"], res_l.t_smoothed, ld["timestamps"], ld["t"],
            with_scale=False,
        ).rmse)
        ate_lb = float(ate_mod.compute_ate(
            ld["timestamps"], res_lb.t_smoothed, ld["timestamps"], ld["t"],
            with_scale=False,
        ).rmse)
        detail["long_run"] = {
            "frames": nL,
            "ate_rmse_m": round(ate_l, 4),
            "ate_after_backend_m": round(ate_lb, 4),
            "branch_counts": {
                "keyframes": int(np.asarray(outs_l.is_keyframe).sum()),
                "bridged": int(np.asarray(outs_l.bridged).sum()),
                "recovered": int(np.asarray(outs_l.recovered).sum()),
                "stationary_frames": int(stat_np.sum()),
                "loop_constraints": int(np.asarray(st_lf.loops.valid).sum()),
                "inrun_corrections": int(
                    np.asarray(st_lf.inrun_corrections)
                ),
                "tracked_frac": round(
                    float(np.asarray(outs_l.tracking_ok)[1:].mean()), 4
                ),
            },
        }

    S_long = (long_frames + CHUNK - 1) // CHUNK
    stage(
        "long",
        _stress_est("s202_l2.5", S_long * CHUNK, E(420, 35), cached_est=40)
        + E(120, 25),
        _stage_long,
    )


    # ---- MONO: all-invalid depth -> essential + scale chain, same program ----
    def _stage_mono():
        d0 = world(0)
        dep_zero = jnp.zeros_like(dep1)
        st_mf, _, outs_m = run_world(gray1, dep_zero, rgb1, tsc1, fid1, stat1)
        res_m = pipeline.result_from_outputs(
            st_mf, outs_m, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        # Monocular trajectories are defined up to scale: sim(3) ATE.
        ate_m = float(ate_mod.compute_ate(
            d0["timestamps"], res_m.t_smoothed, d0["timestamps"], d0["t"],
            with_scale=True,
        ).rmse)
        ts_m = _timed(
            lambda: coupled_checksum(
                params_c, st_c0, dn_c0, gray1, dep_zero, rgb1, tsc1, fid1,
                stat1,
            ),
            float, iters=max(TIMED_ITERS - 2, 2), warmup=1,
        )
        detail["mono"] = {
            "mono_ate_rmse_sim3_m": round(ate_m, 4),
            "mono_fps": round(nC / float(np.median(ts_m)), 2),
            "essential_frames": int(
                (~np.asarray(outs_m.used_3d3d)
                 & np.asarray(outs_m.tracking_ok)).sum()
            ),
            "tracked_frac": round(
                float(np.asarray(outs_m.tracking_ok)[1:].mean()), 4
            ),
        }
        detail["mono_ate_rmse_m"] = detail["mono"]["mono_ate_rmse_sim3_m"]

    stage("mono", E(100, 40), _stage_mono)

    # ---- MONO + DEPTHNET: depth-assisted monocular (the MiDaS design
    # point, C7: `src/DepthEstimator.cpp:15-112` + scale chain
    # `src/Slam.cpp:162-207`). Same zero sensor depth as `mono`, but the
    # trained DepthNet fills keypoint depth from the gray image; rgbd=False
    # keeps motion on the essential+scale chain (3D-3D stays off —
    # estimated depth never meets its 5 cm inlier gate). ----
    def _stage_mono_depth():
        dn_params, dn_src = wmod.load_or_init_depthnet()
        if dn_src == "random-init":
            detail["skipped_stages"].append(
                "mono_depth (no trained depthnet checkpoint)"
            )
            return
        d0 = world(0)
        cfg_m = cfg.replace(rgbd=False)
        dep_zero = jnp.zeros_like(dep1)

        @jax.jit
        def mono_depth_checksum(params_c, dn_p, st0, dn0, gray, dep, rgb,
                                tsc, fid, stat):
            st_f, dn_f, outs = coupled_mod.run_coupled(
                params_c, st0, dn0, gray, dep, rgb, tsc, fid, stat, cfg_m,
                depth_params=dn_p,
            )
            chk = jnp.float32(0.0)
            for leaf in jax.tree.leaves(outs):
                chk = chk + jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree.leaves(dn_f):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
            for leaf in jax.tree.leaves(st_f):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-9
            return chk

        st_m0 = init_state(cfg_m)
        _note("  compiling mono_depth coupled program")
        st_mf, _, outs_m = coupled_mod.run_coupled(
            params_c, st_m0, dn_c0, gray1, dep_zero, rgb1, tsc1, fid1,
            stat1, cfg_m, depth_params=dn_params,
        )
        res_m = pipeline.result_from_outputs(
            st_mf, outs_m, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        ate_m = float(ate_mod.compute_ate(
            d0["timestamps"], res_m.t_smoothed, d0["timestamps"], d0["t"],
            with_scale=True,
        ).rmse)
        ts_m = _timed(
            lambda: mono_depth_checksum(
                params_c, dn_params, st_m0, dn_c0, gray1, dep_zero, rgb1,
                tsc1, fid1, stat1,
            ),
            float, iters=max(TIMED_ITERS - 2, 2), warmup=1,
        )
        detail["mono_depth"] = {
            "checkpoint": str(dn_src).split("/")[-1],
            "mono_depth_ate_rmse_sim3_m": round(ate_m, 4),
            "mono_depth_fps": round(nC / float(np.median(ts_m)), 2),
            "tracked_frac": round(
                float(np.asarray(outs_m.tracking_ok)[1:].mean()), 4
            ),
        }

    stage("mono_depth", E(160, 60), _stage_mono_depth)

    # ---- NOISE: Kinect-model sensor noise on the seed-0 world ----
    def _stage_noise():
        d0 = world(0)
        dn = synthetic.apply_sensor_noise(d0, seed=0)
        g_n = chunked(dn["gray"])
        d_n = chunked(dn["depth_u16"])
        st_n, _, outs_n = run_world(g_n, d_n, rgb1, tsc1, fid1, stat1)
        res_n = pipeline.result_from_outputs(
            st_n, outs_n, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        ate_n = float(ate_mod.compute_ate(
            d0["timestamps"], res_n.t_smoothed, d0["timestamps"], d0["t"],
            with_scale=False,
        ).rmse)
        detail["noise"] = {
            "ate_rmse_noisy_m": round(ate_n, 4),
            "tracked_frac": round(
                float(np.asarray(outs_n.tracking_ok)[1:].mean()), 4
            ),
            "mean_matches": round(
                float(np.asarray(outs_n.num_matches)[1:].mean()), 1
            ),
            "model": "gray sigma=2 counts; depth sigma=1.2mm+1.9mm*(z-0.4)^2, "
                     "2% holes (Kinect error model)",
        }

    stage("noise", E(80, 30), _stage_noise)

    # ---- HELD-OUT FAMILY: renderer-overfit hedge (VERDICT r4 #5).
    # SuperPoint was trained (and every other ATE stage evaluates) on the
    # v1 renderer; this stage runs the SAME coupled program on v2 worlds
    # (`synthetic.render_textured_v2`: structured textures, illumination
    # field, vignette + frame-varying gamma — eval-only, never trained
    # on) plus a frontend repeatability/precision comparison. ----
    def _stage_holdout():
        hold_seeds = [40, 41]
        ates, tracked = [], []
        for sd in hold_seeds:
            _note(f"  holdout world seed={sd} family=v2 (disk-cached)")
            d = wc.image_world(
                nC, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
                seed=sd, num_landmarks=lm_img, radius=_radius, family="v2",
            )
            g_h = chunked(d["gray"])
            d_h = chunked(d["depth_u16"])
            ts_h = chunked(d["timestamps"], np.float32)
            st_h, _, outs_h = run_world(g_h, d_h, rgb1, ts_h, fid1, stat1)
            res_h = pipeline.result_from_outputs(
                st_h, outs_h, keep_refine=cfg.ekf.smooth_keep_refine,
                rts_parallel=cfg.ekf.rts_parallel,
            )
            ates.append(round(float(ate_mod.compute_ate(
                d["timestamps"], res_h.t_smoothed, d["timestamps"], d["t"],
                with_scale=False,
            ).rmse), 4))
            tracked.append(round(
                float(np.asarray(outs_h.tracking_ok)[1:].mean()), 4
            ))
        from vslam_tpu.models import train_superpoint as tsp

        sp_v1 = tsp.evaluate_detector(params_c, family="v1")
        sp_v2 = tsp.evaluate_detector(params_c, family="v2")
        detail["holdout"] = {
            "family": "v2 (structured textures, illum field, vignette, "
                      "frame-varying gamma; eval-only)",
            "ate_rmse_holdout_m": ates,
            "tracked_frac": tracked,
            "sp_repeatability_v1": round(sp_v1["repeatability"], 4),
            "sp_repeatability_v2": round(sp_v2["repeatability"], 4),
            "sp_match_precision_v1": round(sp_v1["match_precision"], 4),
            "sp_match_precision_v2": round(sp_v2["match_precision"], 4),
        }

    stage(
        "ate_holdout",
        (E(150, 60) if all(
            wc.is_cached(wc.image_world_tag(
                nC, W, H, sd, lm_img, _radius, c.fx, c.fy, c.cx, c.cy,
                family="v2",
            )) for sd in (40, 41)
        ) else E(600, 120)),
        _stage_holdout,
    )

    # ---- Stage attribution: frontend ----
    def _stage_frontend():
        params = sp.init_params(jax.random.PRNGKey(0), height=H, width=W)
        model = sp.SuperPoint()
        n_chunks = max(n_frames // sp_batch, 1)

        @jax.jit
        def frontend_sequence(params, chunks, chain):
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
                0, 255, (n_chunks, sp_batch, H, W, 1), dtype=np.uint8
            )
        )
        chain0 = jnp.asarray(0.0, jnp.float32)
        ts_sp = _timed(lambda: frontend_sequence(params, chunks, chain0), float)
        dt_sp = float(np.median(ts_sp))
        detail["frontend_fps"] = round(n_chunks * sp_batch / dt_sp, 2)
        detail["stage_spread"]["frontend"] = round(_spread(ts_sp), 4)
        from vslam_tpu.utils import flops as flops_mod

        detail["frontend_tflops"] = round(
            flops_mod.superpoint_flops_per_frame(H, W)
            * detail["frontend_fps"] / 1e12, 2,
        )
        detail["flop_model"] = flops_mod.describe()

    stage("frontend", E(90, 30), _stage_frontend)

    # ---- Stage attribution: tracking scan (feature-level oracle) ----
    seq_holder = {}

    def _oracle_seq():
        if "seq" not in seq_holder:
            seq_holder["seq"] = synthetic.make_sequence(
                num_frames=n_frames,
                max_keypoints=cfg.frontend.max_keypoints,
                desc_dim=cfg.frontend.descriptor_dim,
                fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=W, height=H,
                seed=0, num_landmarks=n_landmarks,
            )
        return seq_holder["seq"]

    def _stage_tracking():
        seq = _oracle_seq()
        frames = pipeline.features_from_synthetic(seq)
        gravity, h0 = pipeline.compute_gravity_direction(
            seq.accel, np.eye(3, dtype=np.float32)
        )
        state0 = init_state(cfg, gravity=gravity, initial_height=h0)
        from vslam_tpu.core.pipeline import _scan_sequence

        @jax.jit
        def scan_chained(state, frames):
            fs, outs = _scan_sequence(state, frames, cfg, 42)
            return jnp.sum(outs.t)

        ts_track = _timed(lambda: scan_chained(state0, frames), float)
        dt_track = float(np.median(ts_track))
        detail["tracking_fps"] = round(n_frames / dt_track, 2)
        detail["stage_spread"]["tracking"] = round(_spread(ts_track), 4)
        from vslam_tpu.utils import flops as flops_mod

        detail["tracking_tflops"] = round(
            flops_mod.tracking_flops_per_frame(
                cfg.frontend.max_keypoints, cfg.frontend.descriptor_dim,
                cfg.map.map_capacity,
            ) * detail["tracking_fps"] / 1e12, 2,
        )

    stage("tracking", E(120, 40), _stage_tracking)

    # ---- Stage attribution: dense voxel fusion ----
    def _stage_dense():
        kd = jax.random.PRNGKey(1)
        depth_frames = jax.random.uniform(kd, (n_frames, H, W), jnp.float32, 0.3, 6.0)
        rgb_frames = jax.random.randint(
            jax.random.PRNGKey(2), (n_frames, H, W, 3), 0, 255, jnp.uint8
        )
        Rs = jnp.tile(jnp.eye(3, dtype=jnp.float32), (n_frames, 1, 1))
        t_path = jnp.asarray(
            np.linspace(0, 1, n_frames)[:, None]
            * np.array([[1.0, 0.0, 1.0]]), jnp.float32,
        )

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
            chk = jnp.float32(0.0)
            for leaf in jax.tree.leaves(st):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
            return chk

        ts_dense = _timed(
            lambda: dense_chained(depth_frames, rgb_frames, Rs, t_path), float
        )
        dt_dense = float(np.median(ts_dense))
        detail["dense_fusion_fps"] = round(n_frames / dt_dense, 2)
        detail["stage_spread"]["dense"] = round(_spread(ts_dense), 4)

    stage("dense", E(90, 30), _stage_dense)

    # Stage-sum fallback headline (only used if coupled failed) + record.
    if detail.get("frontend_fps") and detail.get("tracking_fps") and detail.get(
        "dense_fusion_fps"
    ):
        per_frame = (
            1.0 / detail["frontend_fps"]
            + 1.0 / detail["tracking_fps"]
            + 1.0 / detail["dense_fusion_fps"]
            + backend_s / n_frames
        )
        detail["e2e_stage_sum_fps"] = round(1.0 / per_frame, 2)

    # ---- Extended ATE evidence: >= 10 rendered worlds ----
    # (Before multi_coupled/oracle/multi_tracking: in a budget-limited
    # driver run the wide-ATE + long-run evidence outranks them.)
    def _stage_ate_wide():
        # Reserve enough budget for the `long` stage that follows — the
        # 2,544-frame-scale run with in-workload loop closure outranks
        # the marginal extra seed.
        nL_res = ((long_frames + CHUNK - 1) // CHUNK) * CHUNK
        reserve = _stress_est("s202_l2.5", nL_res, E(420, 35), cached_est=40) + E(140, 30)
        for s in range(3, 10):
            if budget_left() < _world_est(s, E(160, 20)) + E(20, 10) + reserve:
                detail["skipped_stages"].append(f"ate_wide_seed{s} (budget)")
                break
            _ate_seed(s)
        _finish_ates()

    stage("ate_wide", E(60, 25), _stage_ate_wide)

    # ---- LONG run at the reference's true sequence scale ----
    # ---- Multi-sequence coupled runs (B independent streams, measured) ----
    def _stage_multi_coupled():
        from vslam_tpu.parallel import mesh as pmesh2

        multi_measured = {}
        detail["multi_coupled_measured"] = multi_measured
        frame_budget = 4 * nC
        for B in mlist:
            if B <= 1:
                continue
            if budget_left() < E(140, 30):
                detail["skipped_stages"].append(f"multi_coupled_B{B} (budget)")
                continue
            C_m = max(CHUNK // B, 8) if not args.tiny else max(CHUNK // B, 2)
            n_m = min(nC, (frame_budget // B) // C_m * C_m)
            _note(f"  multi-coupled B={B}, {n_m} frames/seq, chunk {C_m}")
            S_m = n_m // C_m
            try:
                seqs_b = [world(s) for s in range(min(B, 4))]
                # Reuse rendered worlds cyclically past 4: member data
                # repeats, but members evolve independent states and the
                # per-member compute is data-independent — throughput is
                # unaffected, and world rasterization is the single most
                # expensive host step in this bench.
                grayB = jnp.asarray(
                    np.stack(
                        [seqs_b[s % len(seqs_b)]["gray"][:n_m] for s in range(B)],
                        axis=1,
                    ).reshape(S_m, C_m, B, H, W)
                )
                depB = jnp.asarray(
                    np.stack(
                        [seqs_b[s % len(seqs_b)]["depth_u16"][:n_m] for s in range(B)],
                        axis=1,
                    ).reshape(S_m, C_m, B, H, W)
                )
                tsB = jnp.asarray(
                    np.stack(
                        [
                            seqs_b[s % len(seqs_b)]["timestamps"][:n_m].astype(
                                np.float32
                            )
                            for s in range(B)
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

                _mc_args = (params_c, stsB, dnB, grayB, depB, tsB, fidB, statB)
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
                grayB = depB = tsB = fidB = statB = stsB = dnB = None  # noqa: F841
                _mc_args = None  # noqa: F841

    if mlist:
        stage("multi_coupled", E(150, 40), _stage_multi_coupled)

    # ---- Oracle ATE + backend on feature-level synthetic ----
    def _stage_oracle():
        seq = _oracle_seq()
        result, ate_res = pipeline.run_synthetic(seq, cfg, use_imu=True)
        result_b = pipeline.run_backend(result, cfg)
        ate_backend = ate_mod.compute_ate(
            result_b.timestamps, result_b.t_smoothed, seq.timestamps, seq.t,
            with_scale=False,
        )
        detail["ate_rmse_synthetic_m"] = round(ate_res.rmse, 4)
        detail["ate_rmse_after_backend_m"] = round(ate_backend.rmse, 4)

    stage("oracle", E(120, 40), _stage_oracle)

    # ---- Batched multi-sequence tracking (feature-level) ----
    def _stage_multi_tracking():
        from vslam_tpu.core.tracking_batched import batched_tracking_scan
        from vslam_tpu.parallel import mesh as pmesh

        B = multi_b
        seqs = [
            synthetic.make_sequence(
                num_frames=n_frames,
                max_keypoints=cfg.frontend.max_keypoints,
                desc_dim=cfg.frontend.descriptor_dim,
                fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=W, height=H,
                seed=s, num_landmarks=n_landmarks,
            )
            for s in range(B)
        ]
        mframes = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[pipeline.features_from_synthetic(s) for s in seqs],
        )
        mstates = pmesh.replicate_state(cfg, B)

        @jax.jit
        def multi_chained(states, frames):
            fs, outs = batched_tracking_scan(states, frames, cfg, 42)
            return jnp.sum(outs.t)

        ts = _timed(
            lambda: multi_chained(mstates, mframes), float,
            iters=max(TIMED_ITERS - 2, 2),
        )
        dt_multi = float(np.median(ts))
        detail["multi_seq_tracking_fps"] = round(B * n_frames / dt_multi, 2)
        detail["multi_seq_batch"] = B
        detail["stage_spread"]["multi"] = round(_spread(ts), 4)

    if multi_b:
        stage("multi_tracking", E(150, 40), _stage_multi_tracking)



if __name__ == "__main__":
    main()
