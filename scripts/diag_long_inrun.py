"""Rehearse the reference-scale long run at feature level (CPU, tiny
shapes): 2.5 revolutions of a closed circle over N frames — the same
trajectory family as the bench's `long` stage — checking that

  1. production-config loop closure (dense cadence + ring retention +
     anchor-KF PnP) accepts constraints at the revisits,
  2. IN-RUN PGO consumes them and caps drift while the run is live,
  3. the post-hoc backend improves (never degrades) the final ATE.

Usage: python scripts/diag_long_inrun.py [n_frames] [--no-inrun]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vslam_tpu.config import (
    CameraConfig,
    FrontendConfig,
    MapConfig,
    MotionConfig,
    OptimizerConfig,
    PnPConfig,
    SlamConfig,
)
from vslam_tpu.core import pipeline
from vslam_tpu.data import synthetic
from vslam_tpu.eval import ate as ate_mod


def make_cfg(inrun=True):
    import dataclasses

    return SlamConfig(
        camera=CameraConfig(width=160, height=120, fx=120.0, fy=120.0,
                            cx=79.5, cy=59.5),
        frontend=FrontendConfig(max_keypoints=64, descriptor_dim=64),
        motion=MotionConfig(em_ransac_iters=64, fm_ransac_iters=32,
                            r3d_iters=32),
        pnp=PnPConfig(ransac_iters=64),
        map=MapConfig(map_capacity=8192, keyframe_capacity=256),
        opt=dataclasses.replace(OptimizerConfig(), inrun_pgo=inrun),
        # loop config: PRODUCTION defaults (the point of the rehearsal)
    )


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    n_frames = (n_frames // 64) * 64  # chunked scan needs N % chunk == 0
    inrun = "--no-inrun" not in sys.argv
    cfg = make_cfg(inrun=inrun)
    c = cfg.camera
    rng = np.random.default_rng(7)
    world = synthetic.make_world(
        rng, num_landmarks=4000, desc_dim=cfg.frontend.descriptor_dim
    )
    ts, R, t, moving = synthetic.make_stress_trajectory(
        n_frames, loops=2.5, pause=(0.3, 0.02)
    )
    obs = [
        synthetic.observe(
            world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width, c.height,
            max_keypoints=cfg.frontend.max_keypoints, rng=rng,
            pixel_noise=0.7, desc_noise=0.02, depth_noise=0.012,
        )
        for i in range(n_frames)
    ]
    seq = synthetic.SyntheticSequence(
        timestamps=ts, R=R, t=t,
        kp_xy=np.stack([o[0] for o in obs]),
        kp_desc=np.stack([o[1] for o in obs]),
        kp_depth=np.stack([o[2] for o in obs]),
        kp_valid=np.stack([o[3] for o in obs]),
        kp_landmark=np.stack([o[4] for o in obs]),
        accel=None, world=world,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
    )

    result, _ = pipeline.run_synthetic(
        seq, cfg, use_imu=False, smooth=True, chunk=64 if inrun else None
    )
    st = result.final_state
    outs = result.outputs
    loops_v = np.asarray(st.loops.valid)
    print(f"frames={n_frames} inrun={inrun}")
    print(f"kf_count={int(st.kf_count)} loops={int(loops_v.sum())} "
          f"tracked={float(np.asarray(outs.tracking_ok)[1:].mean()):.4f}")
    for li in np.nonzero(loops_v)[0]:
        fid = int(np.asarray(st.loops.from_id)[li])
        tid = int(np.asarray(st.loops.to_id)[li])
        from vslam_tpu.ops import se3 as se3_ops
        Rg, tg = se3_ops.relative(seq.R[fid], seq.t[fid], seq.R[tid], seq.t[tid])
        t_err = float(np.linalg.norm(np.asarray(st.loops.t_rel)[li] - np.asarray(tg)))
        print(f"  loop {fid}->{tid}: t_err={t_err:.4f}")

    def _ate(t_est):
        return float(ate_mod.compute_ate(
            result.timestamps, np.asarray(t_est), seq.timestamps, seq.t,
            with_scale=False,
        ).rmse)

    print(f"ATE raw={_ate(result.t):.4f} smoothed={_ate(result.t_smoothed):.4f}")
    res_b = pipeline.run_backend(result, cfg)
    print(f"ATE after backend: raw={_ate(res_b.t):.4f} "
          f"smoothed={_ate(res_b.t_smoothed):.4f}")


if __name__ == "__main__":
    main()
