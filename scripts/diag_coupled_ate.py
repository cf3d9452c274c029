"""Diagnose coupled-pipeline drift: run the coupled program on the bench
workload and attribute per-frame drift increments to branch types
(3D-3D vs essential-fallback, keyframes, match counts). Caches the
rasterized sequence to /tmp so iteration doesn't pay the render cost.

Usage: python scripts/diag_coupled_ate.py [--seed 0] [--chunk 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cached_sequence(nC, c, seed):
    path = f"/tmp/room_seq_{nC}_{seed}.npz"
    if os.path.exists(path):
        d = dict(np.load(path))
        return d
    from vslam_tpu.data import synthetic

    d = synthetic.make_image_sequence(
        nC, width=c.width, height=c.height, fx=c.fx, fy=c.fy, cx=c.cx,
        cy=c.cy, seed=seed, num_landmarks=6000, radius=3.0, with_rgb=False,
    )
    d.pop("rgb", None)
    np.savez_compressed(
        path,
        **{
            k: v
            for k, v in d.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        },
    )
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--backend", action="store_true",
        help="also run the gain-gated PGO+BA backend and report its ATE",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.core import coupled as cm
    from vslam_tpu.core import pipeline
    from vslam_tpu.core.state import init_state
    from vslam_tpu.eval import ate as ate_mod
    from vslam_tpu.models import weights as wmod
    from vslam_tpu.ops import gridhash

    cfg = SlamConfig()
    c = cfg.camera
    CHUNK = args.chunk
    S = (args.frames + CHUNK - 1) // CHUNK
    nC = S * CHUNK
    H, W = c.height, c.width
    d0 = cached_sequence(nC, c, args.seed)
    params, src = wmod.load_or_init_superpoint(height=H, width=W)

    gray1 = jnp.asarray(d0["gray"].reshape(S, CHUNK, H, W))
    dep1 = jnp.asarray(d0["depth_u16"].reshape(S, CHUNK, H, W))
    tsc1 = jnp.asarray(d0["timestamps"].reshape(S, CHUNK).astype(np.float32))
    fid1 = jnp.asarray(np.arange(nC, dtype=np.int32).reshape(S, CHUNK))
    stat1 = jnp.zeros((S, CHUNK), bool)
    st0 = init_state(cfg)
    dn0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )
    stf, _, outs = cm.run_coupled(
        params, st0, dn0, gray1, dep1, None, tsc1, fid1, stat1, cfg
    )

    res = pipeline.result_from_outputs(
        stf, outs, keep_refine=cfg.ekf.smooth_keep_refine
    )
    t_gt = d0["t"]
    ts_gt = d0["timestamps"]

    def _ate(t_est):
        return float(
            ate_mod.compute_ate(
                res.timestamps, np.asarray(t_est), ts_gt, t_gt,
                with_scale=False,
            ).rmse
        )

    # per-frame drift increment: error of frame-to-frame motion vs gt.
    # The estimate's world frame starts at identity while gt's first pose
    # does not — a CONSTANT rotation offset that Umeyama absorbs in ATE
    # but which would pollute raw step differences (measured ~105 deg on
    # the room sequence, inflating 3d3d step "errors" to 35 mm). Align
    # rigidly (SE3) before differencing.
    R_al, t_al, _ = ate_mod.align_umeyama(
        np.asarray(res.t), t_gt, with_scale=False
    )
    t_est = np.asarray(res.t) @ R_al.T + t_al
    R_est = np.einsum("ij,njk->nik", R_al, np.asarray(res.R))
    R_gt = d0["R"]
    dt_est = np.diff(t_est, axis=0)
    dt_gt = np.diff(t_gt, axis=0)
    step_err = np.linalg.norm(dt_est - dt_gt, axis=-1)
    # rotation step error (deg)
    dR = np.einsum("nij,nkj->nik", R_est[1:], R_est[:-1])
    dRg = np.einsum("nij,nkj->nik", R_gt[1:], R_gt[:-1])
    rel = np.einsum("nij,nkj->nik", dR, dRg)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1))
    )
    ess = (~np.asarray(outs.used_3d3d) & np.asarray(outs.tracking_ok))[1:]
    ok = np.asarray(outs.tracking_ok)[1:]
    kf = np.asarray(outs.is_keyframe)[1:]
    nm = np.asarray(outs.num_matches)[1:]
    ndok = np.asarray(outs.num_depth_ok)[1:]

    def seg(mask):
        m = mask & np.isfinite(step_err)
        if m.sum() == 0:
            return None
        return {
            "n": int(m.sum()),
            "step_err_mean_mm": round(1e3 * float(step_err[m].mean()), 2),
            "step_err_p95_mm": round(
                1e3 * float(np.percentile(step_err[m], 95)), 2
            ),
            "rot_err_mean_deg": round(float(ang[m].mean()), 4),
            "matches_mean": round(float(nm[m].mean()), 1),
            "step_scale_ratio": round(
                float(
                    (np.linalg.norm(dt_est, axis=-1)[m]
                     / np.maximum(np.linalg.norm(dt_gt, axis=-1)[m], 1e-9)
                     ).mean()
                ), 4,
            ),
            "depth_ok_mean": round(float(ndok[m].mean()), 1),
            "depth_ok_p10": round(float(np.percentile(ndok[m], 10)), 1),
        }

    # cumulative drift curve, sampled
    err_pos = t_est - t_gt
    err_pos -= err_pos[0]
    curve = np.linalg.norm(err_pos, axis=-1)
    out = {
        "weight_source": str(src).split("/")[-1],
        "frames": nC,
        "ate_raw": round(_ate(res.t), 4),
        # Default smoothing = RTS + refine delta (EKFConfig
        # .smooth_keep_refine); `ate_smoothed_plain` is the reference
        # smoother (keep_refine=False) for comparison.
        "ate_smoothed": round(_ate(res.t_smoothed), 4),
        "ate_smoothed_plain": round(
            _ate(
                np.asarray(res.t_smoothed)
                - (np.asarray(res.t) - np.asarray(res.outputs.x_filt)[:, :3])
            ), 4,
        ),
        "ate_backend": (
            round(_ate(pipeline.run_backend(res, cfg).t_smoothed), 4)
            if args.backend else None
        ),
        "essential_frames": int(ess.sum()),
        "by_branch": {
            "3d3d": seg(ok & ~ess),
            "essential": seg(ok & ess),
            "lost": seg(~ok),
            "keyframe": seg(ok & kf),
        },
        "drift_curve_m": [round(float(x), 3) for x in curve[::64]],
        # scale of estimated vs gt per-step motion (systematic scale drift?)
        "step_scale_ratio_mean": round(
            float(
                (np.linalg.norm(dt_est, axis=-1)[ok]
                 / np.maximum(np.linalg.norm(dt_gt, axis=-1)[ok], 1e-9)).mean()
            ), 4,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
