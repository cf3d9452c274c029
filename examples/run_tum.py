#!/usr/bin/env python
"""Full SLAM application driver — the `main()` equivalent.

Mirrors the reference binary's end-to-end flow (`/root/reference/src/
main.cpp:1483-1561` + the SLAM thread `:1036-1478`):

  load TUM sequence -> gravity init + stationarity -> SuperPoint features
  (or cache replay) -> tracking scan (every FRAME_STEP-th frame) -> dense
  cloud accumulation -> RTS smoothing -> post-hoc PGO -> ATE/RPE vs
  ground truth -> trajectory + PLY exports -> viewer renders.

Usage:
  python examples/run_tum.py <dataset_dir> [--out out/] [--mono]
      [--frame-step 3] [--cache sp_cache.npz] [--poisson]
      [--max-frames N] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# Allow running straight from a repo checkout.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="TUM sequence directory")
    ap.add_argument("--out", default="out")
    ap.add_argument("--mono", action="store_true", help="monocular mode (ignore depth)")
    ap.add_argument("--midas", action="store_true",
                    help="in mono mode, fill depth from the depth estimator for "
                    "the scale chain (activates the reference's latent "
                    "DepthEstimator, C7): real MiDaS weights when a checkpoint "
                    "exists, else the trained synthetic DepthNet "
                    "(models/checkpoints/depthnet_synth.npz)")
    ap.add_argument("--live", action="store_true",
                    help="streaming mode: process the sequence in chunks, "
                    "updating the viewer + trajectory after every chunk while "
                    "the run is in flight (the reference's render-loop ∥ "
                    "SLAM-worker topology, src/main.cpp:1512-1561)")
    ap.add_argument("--restart-at", type=int, default=0,
                    help="in --live mode, restart the pipeline (fresh TrackState, "
                    "like the reference's UI-triggered Slam reconstruction, "
                    "src/main.cpp:1512-1556) at this processed-frame index; "
                    "each segment exports its own trajectory")
    ap.add_argument("--frame-step", type=int, default=3)
    ap.add_argument("--cache", default=None, help="feature cache path (.npz or SPCF .bin)")
    ap.add_argument("--poisson", action="store_true",
                    help="Poisson mesh the dense cloud (external PoissonRecon "
                    "when present, else the native ops/poisson solver)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--render", action="store_true", help="render viewer frames")
    ap.add_argument("--orb", action="store_true",
                    help="use the ORB fallback frontend (reference C5)")
    ap.add_argument("--ba", action="store_true",
                    help="apply windowed bundle adjustment (the reference ships "
                    "with ENABLE_LOCAL_BA=false, Config.h:99)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.core import frontend as fe, pipeline
    from vslam_tpu.data import loader as loader_mod, tum
    from vslam_tpu.eval import ate as ate_mod
    from vslam_tpu.io import ply, trajectory
    from vslam_tpu.ops import gridhash, pointcloud as pc

    os.makedirs(args.out, exist_ok=True)
    cfg = SlamConfig(rgbd=not args.mono)
    cam = cfg.camera

    # ---- L1: dataset ----
    ld = loader_mod.open_sequence(args.dataset, width=cam.width, height=cam.height,
                                  depth_scale=cam.depth_scale)
    seq_meta = tum.load_sequence(args.dataset)
    n_total = len(ld)
    step = args.frame_step
    idxs = list(range(0, n_total, step))
    if args.max_frames:
        idxs = idxs[: args.max_frames]
    print(f"[data] {n_total} frames, processing every {step}rd -> {len(idxs)}")

    t0 = time.perf_counter()
    ld.prefetch(0, step, len(idxs))
    grays, depths, stamps, rgbs = [], [], [], []
    for i in idxs:
        rgb, depth, ts = ld.get(i)
        grays.append(np.mean(rgb, axis=-1).astype(np.float32) / 255.0)
        depths.append(depth if not args.mono else np.zeros_like(depth))
        rgbs.append(rgb)
        stamps.append(ts)
    grays = np.stack(grays)
    depths = np.stack(depths)
    stamps = np.asarray(stamps)
    print(f"[data] decoded in {time.perf_counter() - t0:.1f}s "
          f"({'native' if type(ld).__name__.startswith('Native') else 'python'} loader)")

    # ---- IMU priors ----
    gravity, h0, stationary = None, 0.0, None
    if seq_meta.accel is not None:
        gravity, h0 = pipeline.compute_gravity_direction(seq_meta.accel, np.eye(3))
        stationary = pipeline.detect_stationary(seq_meta.accel, stamps)
        print(f"[imu] gravity {gravity}, stationary frames: {int(stationary.sum())}")

    # ---- Mono depth estimation (reference C7, latent there; live here):
    # real MiDaS weights when present, else the trained DepthNet ----
    if args.mono and args.midas:
        from vslam_tpu.models import weights as weights_mod

        midas_ckpt = weights_mod.find_checkpoint(
            ("models", "/root/models", "weights"),
            ("midas_v21_small_256.pt", "midas_v21_small.pt", "midas_small.pt"),
        )
        t0 = time.perf_counter()
        if midas_ckpt is not None:
            from vslam_tpu.models import midas as midas_mod

            mp, midas_src = weights_mod.load_or_init_midas(
                size=cfg.frontend.midas_input_size
            )
            print(f"[midas] weights: {midas_src}")
            est = jax.jit(
                lambda p, im: midas_mod.estimate_depth(
                    p, im, size=cfg.frontend.midas_input_size
                )
            )
            rel = []
            for k in range(0, len(idxs), 8):
                batch = np.stack(
                    [np.stack([g] * 3, -1) for g in grays[k : k + 8]]
                ).astype(np.float32)
                rel.append(np.asarray(est(mp, jnp.asarray(batch))))
            rel = np.concatenate(rel)
            # relative inverse depth -> pseudo-metric depth for the scale chain
            depths = 3.0 / np.maximum(rel, 0.2)
        else:
            from vslam_tpu.models import depthnet as dn_mod

            dn_params, dn_src = weights_mod.load_or_init_depthnet()
            if dn_src == "random-init":
                print("[depth] no MiDaS checkpoint and no trained DepthNet: "
                      "random depth would poison the scale chain; staying "
                      "pure-mono")
            else:
                print(f"[depth] DepthNet weights: {dn_src}")
                est = jax.jit(
                    lambda p, g: dn_mod.predict_log_depth(p, g)
                )
                dep = []
                for k in range(0, len(idxs), 16):
                    g_u8 = jnp.asarray(
                        (grays[k : k + 16] * 255.0).astype(np.uint8)
                    )
                    logd = est(dn_params, g_u8)
                    # full-res metric depth via nearest-cell upsample
                    d = np.exp(np.asarray(logd))
                    d = d.repeat(dn_mod.OUT_STRIDE, 1).repeat(
                        dn_mod.OUT_STRIDE, 2
                    )[:, : grays.shape[1], : grays.shape[2]]
                    dep.append(d.astype(np.float32))
                depths = np.concatenate(dep)
        print(f"[depth] estimated depth for {len(idxs)} frames in "
              f"{time.perf_counter() - t0:.1f}s")

    if args.live:
        return _run_live(args, cfg, grays, depths, stamps, rgbs, gravity,
                         h0, stationary, seq_meta, idxs)

    # ---- L2: frontend ----
    t0 = time.perf_counter()
    front = fe.make_frontend(cfg, kind="orb" if args.orb else "auto")
    print(f"[frontend] weights: {front.weight_source}")
    frames = fe.extract_sequence(
        front, grays, depths, stamps, stationary=stationary,
        cache_path=args.cache, frame_indices=np.asarray(idxs),
    )
    print(f"[frontend] features in {time.perf_counter() - t0:.1f}s")

    # ---- L4: tracking scan + RTS ----
    t0 = time.perf_counter()
    result = pipeline.run_tracking(
        frames, cfg, gravity=gravity, initial_height=h0, smooth=True
    )
    dt = time.perf_counter() - t0
    print(f"[track] {len(idxs)} frames in {dt:.2f}s ({len(idxs) / dt:.1f} fps)")

    # ---- post-hoc PGO (+ optional windowed BA), one fused program ----
    if args.ba or cfg.opt.enable_local_ba:
        result = pipeline.run_backend(result, cfg, gravity=gravity, initial_height=h0)
    else:
        result = pipeline.run_posthoc_pgo(result, cfg, gravity=gravity, initial_height=h0)

    # ---- dense cloud (device-side scanned fusion: O(1) dispatches per
    # chunk instead of one ~50 ms relay round trip per frame) ----
    t0 = time.perf_counter()
    dstate = gridhash.init_dense_map(cfg.dense.hash_capacity, cfg.dense.cloud_capacity)
    dstate = gridhash.fuse_sequence(
        dstate, depths, np.stack(rgbs), result.R, result.t_smoothed,
        cam.fx, cam.fy, cam.cx, cam.cy,
        pixel_step=cfg.dense.pixel_step, max_depth=cfg.dense.max_depth,
        voxel_size=cfg.dense.voxel_size, chunk=cfg.runtime.chunk_size,
    )
    n_dense = int(dstate.cloud_count)
    print(f"[dense] {n_dense} voxel-deduped points in "
          f"{time.perf_counter() - t0:.2f}s")

    # ---- evaluation ----
    if seq_meta.gt is not None:
        gt = seq_meta.gt
        res_ate = ate_mod.compute_ate(stamps, result.t_smoothed, gt[:, 0], gt[:, 1:4])
        res_rpe = ate_mod.compute_rpe(stamps, result.t_smoothed, gt[:, 0], gt[:, 1:4])
        print(f"[eval] ATE RMSE: {res_ate.rmse:.4f} m (mean {res_ate.mean:.4f}, "
              f"pairs {res_ate.num_pairs})")
        print(f"[eval] RPE RMSE: {res_rpe.rmse:.4f} m/step")

    # ---- exports (main.cpp:1340-1477) ----
    trajectory.save_trajectory(os.path.join(args.out, "estimated_trajectory.txt"),
                               stamps, result.t_smoothed)
    trajectory.save_trajectory_full(
        os.path.join(args.out, "estimated_trajectory_full.txt"),
        stamps, result.R, result.t_smoothed,
    )
    st = result.final_state
    map_valid = np.asarray(st.map.valid)
    sparse = np.asarray(st.map.pos)[map_valid]
    if len(sparse):
        # Full beautification chain (main.cpp:1340-1404): bbox -> SOR ->
        # surface-aware filter -> densify -> normals -> PLY with normals.
        pts, normals = pc.beautify_cloud(
            sparse, np.ones(len(sparse), bool), traj=result.t_smoothed,
        )
        ply.save_ply(os.path.join(args.out, "estimated_map.ply"), pts,
                     normals=normals)
        print(f"[map] beautified sparse cloud: {len(sparse)} -> {len(pts)} "
              f"points (densified, with normals)")
    if n_dense:
        ply.save_ply(
            os.path.join(args.out, "dense_map.ply"),
            np.asarray(dstate.cloud_xyz)[:n_dense],
            colors=np.asarray(dstate.cloud_rgb)[:n_dense],
        )

    # ---- interactive viewer (Pangolin-window equivalent): one
    # self-contained HTML with orbit/pan/zoom, follow/top/side modes,
    # dense/sparse toggles, restart and a playback timeline
    # (src/Viewer.cpp:60-66, 402-437; src/main.cpp:1220-1260) ----
    from vslam_tpu.viz import web as webviz

    webviz.export_run(
        result, os.path.join(args.out, "viewer.html"),
        dense=(np.asarray(dstate.cloud_xyz)[:n_dense],
               np.asarray(dstate.cloud_rgb)[:n_dense]) if n_dense else None,
        gt_trajectory=None if seq_meta.gt is None else seq_meta.gt[:, 1:4],
        title=f"vslam_tpu — {os.path.basename(os.path.normpath(args.dataset))}",
    )
    print(f"[viewer] interactive viewer: {os.path.join(args.out, 'viewer.html')}")

    if args.poisson:
        _run_poisson(os.path.join(args.out, "dense_map.ply"), args.out)

    if args.render:
        from vslam_tpu.viz import hud, viewer

        every = max(len(idxs) // 20, 1)
        paths = viewer.render_run(
            result, os.path.join(args.out, "viz"), every=every,
            dense=(np.asarray(dstate.cloud_xyz)[:n_dense],
                   np.asarray(dstate.cloud_rgb)[:n_dense]) if n_dense else None,
        )
        # Per-frame HUD with before/after match windows (main.cpp:1218-1306):
        # raw ratio-test matches (yellow) vs fundamental-gated (green)
        # between consecutive rendered frames, plus the annotated frame.
        import cv2

        from vslam_tpu.ops import matching as match_ops
        from vslam_tpu.ops import ransac as rs_ops

        xy = np.asarray(frames.xy)
        dv = np.asarray(frames.valid)
        ds = np.asarray(frames.desc, np.float32)
        viz_dir = os.path.join(args.out, "viz")
        n_hud = 0
        for i in range(every, len(idxs), every):
            m = match_ops.knn2_ratio_match(
                jnp.asarray(ds[i - 1]), jnp.asarray(ds[i]),
                jnp.asarray(dv[i - 1]), jnp.asarray(dv[i]),
                ratio=cfg.frontend.l2_ratio_threshold,
            )
            uv2 = xy[i][np.asarray(m.idx)]
            _, fres = rs_ops.ransac_fundamental(
                jax.random.PRNGKey(i), jnp.asarray(xy[i - 1]), jnp.asarray(uv2),
                m.valid, num_hypotheses=cfg.motion.fm_ransac_iters,
                threshold_px=cfg.motion.fm_ransac_threshold_px,
            )
            gated = np.asarray(m.valid & fres.inlier_mask)
            img = hud.before_after(
                grays[i - 1], grays[i], xy[i - 1], xy[i],
                np.asarray(m.idx), np.asarray(m.valid), gated,
            )
            cv2.imwrite(os.path.join(viz_dir, f"hud_{i:05d}.png"), img[..., ::-1])
            ann = hud.annotate_frame(grays[i], xy[i], dv[i])
            cv2.imwrite(os.path.join(viz_dir, f"frame_{i:05d}.png"), ann[..., ::-1])
            n_hud += 1
        print(f"[viz] {len(paths)} scene frames + {n_hud} HUD frames -> "
              f"{args.out}/viz")

    import json

    summary = {
        "frames": len(idxs),
        "track_fps": round(len(idxs) / dt, 2),
        "keyframes": int(np.asarray(result.final_state.keyframes.valid).sum()),
        "map_points": int(np.asarray(result.final_state.map.valid).sum()),
        "dense_points": n_dense,
    }
    if seq_meta.gt is not None:
        summary["ate_rmse_m"] = round(res_ate.rmse, 4)
        summary["rpe_rmse_m"] = round(res_rpe.rmse, 4)
    print("[summary] " + json.dumps(summary))
    print(f"[done] outputs in {args.out}/")


def _run_live(args, cfg, grays, depths, stamps, rgbs, gravity, h0,
              stationary, seq_meta, idxs):
    """STREAMING operating mode: chunked incremental loop that updates the
    viewer + trajectory after every chunk while the run is in flight, with
    a mid-sequence restart path.

    The reference is an interactive real-time system — render loop ∥ SLAM
    worker ∥ filter worker with live viewer updates and a UI-triggered
    restart that reconstructs `Slam` (`/root/reference/src/main.cpp:
    1512-1561`). The TPU-native form: per chunk, batched frontend ->
    tracking scan continuing from the carried TrackState -> in-run PGO
    when the chunk accepted a loop constraint -> dense fusion -> viewer
    rewrite (the self-contained HTML supports playback, so reloading it
    mid-run shows the trajectory so far). `--restart-at N` re-initializes
    the TrackState at processed-frame N (fresh map/ring/EKF, like the
    reference's restart), exporting each segment's trajectory separately.
    """
    import functools
    import json

    import jax
    import jax.numpy as jnp

    from vslam_tpu.core import frontend as fe, pipeline
    from vslam_tpu.core.state import init_state
    from vslam_tpu.eval import ate as ate_mod
    from vslam_tpu.io import trajectory
    from vslam_tpu.ops import gridhash
    from vslam_tpu.viz import web as webviz

    cam = cfg.camera
    chunk = cfg.runtime.chunk_size
    n = len(idxs)
    viewer_path = os.path.join(args.out, "viewer.html")
    front = fe.make_frontend(cfg, kind="orb" if args.orb else "auto")
    print(f"[live] frontend weights: {front.weight_source}; "
          f"chunk={chunk}; restart_at={args.restart_at or 'off'}")

    inrun_correct = jax.jit(
        functools.partial(pipeline.inrun_pgo_correct, config=cfg)
    )

    def fresh():
        return (
            init_state(cfg, gravity=gravity, initial_height=h0),
            gridhash.init_dense_map(
                cfg.dense.hash_capacity, cfg.dense.cloud_capacity
            ),
            [],  # stacked chunk outputs
        )

    def finalize(state, outs_list, seg_id):
        """Stack this segment's outputs, smooth, export trajectory (+ ATE
        when ground truth exists). Returns the segment RunResult."""
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs]),
            *outs_list,
        )
        result = pipeline.result_from_outputs(
            state, stacked, smooth=True,
            keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        suffix = f"_seg{seg_id}" if args.restart_at else ""
        trajectory.save_trajectory(
            os.path.join(args.out, f"estimated_trajectory{suffix}.txt"),
            result.timestamps, result.t_smoothed,
        )
        if seq_meta.gt is not None:
            gt = seq_meta.gt
            a = ate_mod.compute_ate(
                result.timestamps, result.t_smoothed, gt[:, 0], gt[:, 1:4]
            )
            print(f"[live] segment {seg_id}: ATE RMSE {a.rmse:.4f} m "
                  f"({a.num_pairs} pairs)")
        return result

    state, dstate, outs_list = fresh()
    seg_id = 0
    t_start = time.perf_counter()
    restart_at = args.restart_at
    k0 = 0
    while k0 < n:
        k1 = min(k0 + chunk, n)
        if restart_at and k0 < restart_at < k1:
            k1 = restart_at  # cut the chunk at the restart boundary
        feats = fe.extract_sequence(
            front, grays[k0:k1], depths[k0:k1], stamps[k0:k1],
            stationary=None if stationary is None else stationary[k0:k1],
            frame_indices=np.asarray(idxs[k0:k1]),
        )
        n_loops0 = int(np.asarray(state.loops.valid).sum())
        res_c = pipeline.run_tracking(feats, cfg, state=state, smooth=False)
        state = res_c.final_state
        if cfg.opt.inrun_pgo and int(np.asarray(state.loops.valid).sum()) > n_loops0:
            state = inrun_correct(state)
            print("[live]   in-run PGO correction applied")
        outs_list.append(res_c.outputs)
        dstate = gridhash.fuse_sequence(
            dstate, depths[k0:k1], np.stack(rgbs[k0:k1]), res_c.R, res_c.t,
            cam.fx, cam.fy, cam.cx, cam.cy,
            pixel_step=cfg.dense.pixel_step, max_depth=cfg.dense.max_depth,
            voxel_size=cfg.dense.voxel_size, chunk=min(chunk, k1 - k0),
        )
        # Live viewer rewrite: the whole segment so far, smoothed.
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs]),
            *outs_list,
        )
        res_live = pipeline.result_from_outputs(
            state, stacked, smooth=True,
            keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        n_dense = int(dstate.cloud_count)
        webviz.export_run(
            res_live, viewer_path,
            dense=(np.asarray(dstate.cloud_xyz)[:n_dense],
                   np.asarray(dstate.cloud_rgb)[:n_dense]) if n_dense else None,
            gt_trajectory=None if seq_meta.gt is None else seq_meta.gt[:, 1:4],
            title=f"vslam_tpu LIVE — segment {seg_id}, frame {k1}/{n}",
        )
        elapsed = time.perf_counter() - t_start
        print(f"[live] frames {k0}-{k1 - 1}: kf="
              f"{int(np.asarray(state.kf_count))} "
              f"loops={int(np.asarray(state.loops.valid).sum())} "
              f"dense={n_dense} ({k1 / elapsed:.1f} fps cum) -> viewer updated")
        if restart_at and k1 == restart_at:
            finalize(state, outs_list, seg_id)
            print(f"[live] RESTART at processed frame {k1}: fresh TrackState "
                  f"(src/main.cpp:1512-1556 semantics)")
            state, dstate, outs_list = fresh()
            seg_id += 1
        k0 = k1

    result = finalize(state, outs_list, seg_id)
    summary = {
        "mode": "live",
        "frames": n,
        "segments": seg_id + 1,
        "keyframes": int(np.asarray(state.keyframes.valid).sum()),
        "dense_points": int(dstate.cloud_count),
        "viewer": viewer_path,
    }
    print("[summary] " + json.dumps(summary))
    print(f"[done] outputs in {args.out}/")


def _run_poisson(ply_path, out_dir):
    """Poisson meshing (`src/main.cpp:1406-1458` shells out to
    PoissonRecon + SurfaceTrimmer). When the external binaries exist they
    are used for bit-parity with the reference; otherwise the in-framework
    TPU-native solver (`ops/poisson.py`: FFT Poisson solve + marching
    tetrahedra + density trim) produces the same two artifacts
    (poisson_mesh.ply, poisson_trimmed.ply)."""
    import shutil
    import subprocess

    exe = shutil.which("PoissonRecon")
    mesh = os.path.join(out_dir, "poisson_mesh.ply")
    if exe is not None:
        subprocess.run(
            [exe, "--in", ply_path, "--out", mesh, "--depth", "9"], check=False
        )
        trim = shutil.which("SurfaceTrimmer")
        if trim and os.path.exists(mesh):
            subprocess.run(
                [trim, "--in", mesh, "--out",
                 os.path.join(out_dir, "poisson_trimmed.ply"), "--trim", "7"],
                check=False,
            )
        return

    print("[poisson] PoissonRecon binary not found; using native solver")
    import jax.numpy as jnp

    from vslam_tpu.io import ply
    from vslam_tpu.ops import pointcloud as pc
    from vslam_tpu.ops import poisson as native_poisson

    cloud = ply.load_ply(ply_path)
    pts = cloud["points"]
    if len(pts) < 32:
        print("[poisson] too few points; skipping")
        return
    if len(pts) > 200_000:  # brute-force kNN normals: cap the input cloud
        sel = np.random.default_rng(0).choice(len(pts), 200_000, replace=False)
        pts = pts[sel]
    pj = jnp.asarray(pts)
    vj = jnp.ones(len(pts), bool)
    normals = pc.estimate_normals(
        pj, vj, k=min(16, len(pts) - 1), viewpoint=jnp.asarray(pts.mean(0))
    )
    verts_u, faces_u = native_poisson.poisson_mesh(
        pts, np.asarray(normals), resolution=128, trim_frac=0.0
    )
    ply.save_ply(mesh, verts_u, faces=faces_u)
    verts_t, faces_t = native_poisson.poisson_mesh(
        pts, np.asarray(normals), resolution=128, trim_frac=0.08
    )
    ply.save_ply(os.path.join(out_dir, "poisson_trimmed.ply"), verts_t, faces=faces_t)
    print(f"[poisson] native mesh: {len(verts_u)} verts / {len(faces_u)} faces; "
          f"trimmed: {len(verts_t)} verts / {len(faces_t)} faces")


if __name__ == "__main__":
    sys.exit(main())
