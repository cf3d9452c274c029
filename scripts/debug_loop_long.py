"""Diagnose the long-horizon loop-closure scenario: drift magnitude vs
noise level, loop-constraint accuracy, and PGO correction quality."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_loop_closure_long import _loop_config, _revisit_sequence  # noqa: E402

from vslam_tpu.core import pipeline  # noqa: E402
from vslam_tpu.eval import ate as ate_mod  # noqa: E402
from vslam_tpu.data import synthetic  # noqa: E402


def run(pixel_noise, depth_noise, desc_noise=0.02, n_frames=520):
    cfg = _loop_config()
    c = cfg.camera
    rng = np.random.default_rng(11)
    world = synthetic.make_world(
        rng, num_landmarks=2500, desc_dim=cfg.frontend.descriptor_dim
    )
    dt = 0.1
    ts, R, t = synthetic.make_trajectory(
        n_frames, dt=dt, radius=2.5,
        angular_rate=2.0 * np.pi / (n_frames * dt),
    )
    obs = [
        synthetic.observe(
            world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width, c.height,
            max_keypoints=cfg.frontend.max_keypoints, rng=rng,
            pixel_noise=pixel_noise, desc_noise=desc_noise,
            depth_noise=depth_noise,
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

    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=False, smooth=False)
    st = result.final_state
    outs = result.outputs
    ok_frac = float(np.asarray(outs.tracking_ok)[1:].mean())
    loops_v = np.asarray(st.loops.valid)

    def unaligned_err(r):
        est_w = r.t @ seq.R[0].T + seq.t[0]
        return np.linalg.norm(est_w - seq.t, axis=-1)

    # --- loop-constraint accuracy vs ground truth ---
    from vslam_tpu.ops import se3 as se3_ops

    for li in np.nonzero(loops_v)[0]:
        fid = int(np.asarray(st.loops.from_id)[li])
        tid = int(np.asarray(st.loops.to_id)[li])
        Rg, tg = se3_ops.relative(seq.R[fid], seq.t[fid], seq.R[tid], seq.t[tid])
        t_err = float(np.linalg.norm(np.asarray(st.loops.t_rel)[li] - np.asarray(tg)))
        R_err = float(
            np.linalg.norm(
                np.asarray(st.loops.R_rel)[li] @ np.asarray(Rg).T - np.eye(3)
            )
        )
        print(f"  loop {fid}->{tid}: t_err={t_err:.4f} R_err={R_err:.4f}")

    e_pre = unaligned_err(result)
    r2 = pipeline.run_posthoc_pgo(result, cfg)
    e_post = unaligned_err(r2)
    tail = slice(-20, None)
    print(
        f"px={pixel_noise} dz={depth_noise}: ok={ok_frac:.2f} kf={int(st.kf_count)} "
        f"loops={int(loops_v.sum())} pre_tail={e_pre[tail].mean():.4f} "
        f"post_tail={e_post[tail].mean():.4f}"
    )

    # --- injected drift: accurate constraint, drifted trajectory ---
    n = len(result.t)
    prof = (np.arange(n, dtype=np.float32) / (n - 1)) ** 1.5
    ddir = np.asarray([0.6, -0.2, 0.3], np.float32)
    ddir /= np.linalg.norm(ddir)
    dmax = 0.5
    drift = dmax * prof[:, None] * ddir[None, :]

    kf_fid = np.asarray(st.keyframes.frame_id)
    kf_drift = dmax * np.clip(kf_fid / (n - 1), 0, 1)[:, None] ** 1.5 * ddir[None, :]
    import dataclasses as _dc

    drifted = _dc.replace(
        result,
        t=result.t + drift,
        t_smoothed=result.t_smoothed + drift,
        final_state=st._replace(
            keyframes=st.keyframes._replace(
                t=st.keyframes.t + kf_drift.astype(np.float32),
                t_anchor=st.keyframes.t_anchor + kf_drift.astype(np.float32),
            )
        ),
    )
    e_pre_d = unaligned_err(drifted)
    r3 = pipeline.run_posthoc_pgo(drifted, cfg)
    e_post_d = unaligned_err(r3)
    print(
        f"  injected drift {dmax} m: pre_tail={e_pre_d[tail].mean():.4f} "
        f"post_tail={e_post_d[tail].mean():.4f} ratio={e_post_d[tail].mean()/e_pre_d[tail].mean():.3f}"
    )


if __name__ == "__main__":
    run(0.7, 0.012)
