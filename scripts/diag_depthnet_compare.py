"""Compare DepthNet checkpoints on the bench `mono_depth` workload.

Runs the mono+DepthNet coupled program (zero sensor depth, rgbd=False,
DepthNet filling keypoint depth — the bench `mono_depth` stage exactly)
on the seed-0 rendered world for each candidate checkpoint and reports
sim(3) ATE + tracked_frac. Same program for every candidate (weights are
arguments), so the compile cost is paid once and also pre-warms the
bench stage's cache entry.

Usage: python scripts/diag_depthnet_compare.py ckptA.npz [ckptB.npz ...]
       (defaults to the committed checkpoint when no args given)
"""

import os
import sys

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
from vslam_tpu.ops import gridhash


def main():
    ckpts = sys.argv[1:]
    if not ckpts:
        _, src = wmod.load_or_init_depthnet()
        ckpts = [str(src)]

    cfg = SlamConfig()
    c = cfg.camera
    CHUNK, S = 128, 7
    nC = CHUNK * S
    H, W = c.height, c.width

    print(f"device={jax.devices()[0]}  world: seed=0 {nC} frames {W}x{H}")
    d0 = wc.image_world(
        nC, width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
        seed=0, num_landmarks=6000, radius=3.0,
    )
    d0["rgb"] = np.repeat(d0["gray"][..., None], 3, -1)

    def chunked(x, dtype=None):
        a = np.asarray(x)
        if dtype is not None:
            a = a.astype(dtype)
        return jnp.asarray(a.reshape((S, CHUNK) + a.shape[1:]))

    gray1 = chunked(d0["gray"])
    rgb1 = chunked(d0["rgb"])
    tsc1 = chunked(d0["timestamps"], np.float32)
    fid1 = chunked(np.arange(nC, dtype=np.int32))
    stat1 = jnp.zeros((S, CHUNK), bool)
    dep_zero = jnp.zeros((S, CHUNK, H, W), jnp.uint16)

    params_c, sp_src = wmod.load_or_init_superpoint(height=H, width=W)
    print(f"superpoint: {sp_src}")
    cfg_m = cfg.replace(rgbd=False)
    st_m0 = init_state(cfg_m)
    dn_c0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )

    for path in ckpts:
        dn_params = wmod.depthnet_params_from_npz(path)
        st_mf, _, outs_m = coupled_mod.run_coupled(
            params_c, st_m0, dn_c0, gray1, dep_zero, rgb1, tsc1, fid1,
            stat1, cfg_m, depth_params=dn_params,
        )
        res_m = pipeline.result_from_outputs(
            st_mf, outs_m, keep_refine=cfg.ekf.smooth_keep_refine,
            rts_parallel=cfg.ekf.rts_parallel,
        )
        a = ate_mod.compute_ate(
            d0["timestamps"], res_m.t_smoothed, d0["timestamps"], d0["t"],
            with_scale=True,
        )
        tracked = float(np.asarray(outs_m.tracking_ok)[1:].mean())
        print(
            f"{os.path.basename(path):24s} sim3_ate={float(a.rmse):.4f} m"
            f"  tracked_frac={tracked:.4f}"
        )


if __name__ == "__main__":
    main()
