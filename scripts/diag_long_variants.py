"""A/B the bench `long` stage (image pipeline, reference-scale stress
world) across backend/in-run gate configurations, on the real device.

The round-5 closing bench regressed the long run (raw ATE 0.1198 ->
0.2737 m) after three gate-hardening commits; this isolates which knob
did it by running the EXACT bench long-stage workload under each
variant. Each variant retraces the coupled program (config constants
are baked in), so expect ~5 min of compile per new in-run constant.

Usage: python scripts/diag_long_variants.py [--world long|stress] [variant ...]
  (default: long world; variants baseline inrun08 inrun00 noinrun)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vslam_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.config import SlamConfig
from vslam_tpu.core import coupled as coupled_mod
from vslam_tpu.core import pipeline
from vslam_tpu.core.state import init_state
from vslam_tpu.data import worldcache as wc
from vslam_tpu.eval import ate as ate_mod
from vslam_tpu.models import weights as wmod

VARIANTS = {
    # Closing-bench HEAD defaults (measured 0.2737 raw / 0.2615 after).
    "baseline": {},
    # In-run fold floor sweep (non-monotonic: each fold steers the rest
    # of the run; see OptimizerConfig.inrun_min_correction_m).
    "inrun06": {"inrun_min_correction_m": 0.06},
    "inrun08": {"inrun_min_correction_m": 0.08},
    "inrun10": {"inrun_min_correction_m": 0.10},
    "inrun12": {"inrun_min_correction_m": 0.12},
    "inrun20": {"inrun_min_correction_m": 0.20},
    # No floor: fold every accepted constraint (mid-round policy).
    "inrun00": {"inrun_min_correction_m": 0.0},
    # No in-run correction at all (post-hoc backend only).
    "noinrun": {"inrun_pgo": False},
    # Post-hoc PGO floor off (in-run at default).
    "pgofloor0": {"pgo_loop_min_correction_m": 0.0},
    # Everything-off combo: mid-round backend policy end to end.
    "midround": {"inrun_min_correction_m": 0.0,
                 "pgo_loop_min_correction_m": 0.0,
                 "ba_holdout_frac": 0.0,
                 "pgo_loop_dcs_phi": 0.0},
}


def main():
    argv = list(sys.argv[1:])
    world = "long"
    if "--world" in argv:
        i = argv.index("--world")
        world = argv[i + 1]
        del argv[i:i + 2]
    names = argv or ["baseline", "inrun08", "inrun00", "noinrun"]
    cfg0 = SlamConfig()
    c = cfg0.camera
    CHUNK = 128
    long_frames = 2560 if world == "long" else 896
    S_l = (long_frames + CHUNK - 1) // CHUNK
    nL = S_l * CHUNK
    W, H = c.width, c.height

    print(f"device={jax.devices()[0]}  {world} world: {nL} frames", flush=True)
    if world == "long":
        ld = wc.stress_world(
            "s202_l2.5", nL, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx,
            cy=c.cy, num_landmarks=6000, seed=202, loops=2.5,
            pause=(0.3, 0.02), dropout=(0.6, 0.01),
        )
    else:
        ld = wc.stress_world(
            "s101_l1", nL, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx,
            cy=c.cy, num_landmarks=6000, seed=101, loops=1.0,
        )
    stat_np = pipeline.detect_stationary(
        ld["accel"], ld["timestamps"],
        window=cfg0.ekf.stationary_window_s,
        threshold=cfg0.ekf.stationary_accel_std,
    )
    gravity, h0 = pipeline.compute_gravity_direction(
        ld["accel"], np.eye(3, dtype=np.float32)
    )

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
    params_c, _ = wmod.load_or_init_superpoint(height=H, width=W)
    from vslam_tpu.ops import gridhash

    for name in names:
        kw = VARIANTS[name]
        cfg = dataclasses.replace(
            cfg0, opt=dataclasses.replace(cfg0.opt, **kw)
        )
        st_l0 = init_state(cfg, gravity=gravity, initial_height=h0)
        dn0 = gridhash.init_dense_map(
            cfg.dense.hash_capacity, cfg.dense.cloud_capacity
        )
        t0 = time.time()
        st_lf, _, outs_l = coupled_mod.run_coupled(
            params_c, st_l0, dn0, grayL, depL, None, tsL, fidL, statL, cfg
        )
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
        print(
            f"{name:10s} raw={ate_l:.4f} after={ate_lb:.4f}"
            f"  loops={int(np.asarray(st_lf.loops.valid).sum())}"
            f"  inrun={int(np.asarray(st_lf.inrun_corrections))}"
            f"  kfs={int(np.asarray(outs_l.is_keyframe).sum())}"
            f"  tracked={float(np.asarray(outs_l.tracking_ok)[1:].mean()):.4f}"
            f"  ({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
