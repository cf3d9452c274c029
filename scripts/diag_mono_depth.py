"""Sensitivity rehearsal for depth-assisted mono (CPU, feature level):
how accurate must DepthNet's keypoint depth be for the mono chain to
beat the no-depth baseline, and which config consumes it best?

Simulates predicted depth as GT * exp(noise) with a per-keypoint and a
per-frame (spatially correlated) log-error component, then runs:
  - mono baseline (all-invalid depth)
  - estimated depth, rgbd=False (essential + scale chain only)
  - estimated depth, rgbd=True (3D-3D allowed to fire on it)

Usage: python scripts/diag_mono_depth.py [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vslam_tpu.config import (
    CameraConfig, FrontendConfig, MapConfig, MotionConfig, PnPConfig,
    SlamConfig,
)
from vslam_tpu.core import pipeline
from vslam_tpu.data import synthetic
from vslam_tpu.eval import ate as ate_mod


def make_cfg(rgbd):
    return SlamConfig(
        camera=CameraConfig(width=160, height=120, fx=120.0, fy=120.0,
                            cx=79.5, cy=59.5),
        frontend=FrontendConfig(max_keypoints=64, descriptor_dim=64),
        motion=MotionConfig(em_ransac_iters=64, fm_ransac_iters=32,
                            r3d_iters=32),
        pnp=PnPConfig(ransac_iters=64),
        map=MapConfig(map_capacity=8192, keyframe_capacity=128),
        rgbd=rgbd,
    )


def run(seq, cfg):
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=False, smooth=True)
    a = ate_mod.compute_ate(
        result.timestamps, result.t_smoothed, seq.timestamps, seq.t,
        with_scale=True,
    )
    tracked = float(np.asarray(result.outputs.tracking_ok)[1:].mean())
    used3d = int(np.asarray(result.outputs.used_3d3d).sum())
    return float(a.rmse), tracked, used3d


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    base = synthetic.make_sequence(
        num_frames=n, max_keypoints=64, desc_dim=64, fx=120.0, fy=120.0,
        cx=79.5, cy=59.5, width=160, height=120, seed=3,
        pixel_noise=0.7, desc_noise=0.02, num_landmarks=4000,
    )
    import dataclasses

    rng = np.random.default_rng(17)

    def with_depth(sigma_kp, sigma_frame):
        d = base.kp_depth
        noise = np.exp(
            rng.normal(0, sigma_kp, d.shape)
            + rng.normal(0, sigma_frame, (d.shape[0], 1))
        ).astype(np.float32)
        return dataclasses.replace(base, kp_depth=(d * noise))

    zero = dataclasses.replace(base, kp_depth=np.zeros_like(base.kp_depth))
    print("mono baseline (no depth):      ate=%.4f tracked=%.3f r3d=%d" %
          run(zero, make_cfg(True)))
    for skp, sfr in [(0.05, 0.02), (0.15, 0.05), (0.30, 0.10)]:
        seq = with_depth(skp, sfr)
        for rgbd in (False, True):
            ate, tr, u3 = run(seq, make_cfg(rgbd))
            print(f"est depth s_kp={skp} s_fr={sfr} rgbd={rgbd}: "
                  f"ate={ate:.4f} tracked={tr:.3f} r3d={u3}")


if __name__ == "__main__":
    main()
