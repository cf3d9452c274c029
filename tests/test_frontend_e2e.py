"""End-to-end tracking modes beyond the SuperPoint+RGB-D happy path:

- ORB-frontend pipeline ATE: the reference's ORB fallback is a live
  tracking mode (`/root/reference/src/FeatureExtractor.cpp:12-15,
  210-214`) — drive rasterized PIXELS through `OrbFrontend` and the full
  tracking scan and bound the ATE.
- True monocular (no depth anywhere): essential-matrix chain with the
  motion-scale/last-scale fallback (`src/Slam.cpp:966-984`, `Config.h:129`)
  produces an up-to-scale trajectory; sim(3)-aligned ATE bounds it.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core import frontend as fe
from vslam_tpu.core import pipeline
from vslam_tpu.core.state import FrameFeatures
from vslam_tpu.data import synthetic
from vslam_tpu.eval import ate as ate_mod

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def test_orb_pipeline_ate():
    """Rasterized frames -> FAST+rBRIEF ORB frontend -> full tracking scan
    -> bounded ATE (the reference swaps ORB in when the SuperPoint model
    is absent and runs the SAME downstream pipeline)."""
    cfg = tiny_test_config()
    # ORB runs at a much higher feature budget than SuperPoint (the
    # reference extracts NUM_FEATURES=3000, `src/FeatureExtractor.cpp:14`
    # vs ~hundreds of SuperPoint keypoints) — starving it at the tiny
    # config's 64 keypoints leaves match counts hovering at the
    # min_matches gate. 128 keeps tiny-scale proportions.
    cfg = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, max_keypoints=128)
    )
    c = cfg.camera
    N = 20
    d = synthetic.make_image_sequence(
        N, width=c.width, height=c.height, fx=c.fx, fy=c.fy, cx=c.cx,
        cy=c.cy, seed=5, num_landmarks=900, radius=2.0, with_rgb=False,
    )
    front = fe.make_frontend(cfg, kind="orb")
    xy, score, valid, desc = front.extract(d["gray"])
    depth_m = jnp.asarray(d["depth_u16"].astype(np.float32) / c.depth_scale)
    kp_depth = fe.sample_depth_at_keypoints(depth_m, xy)
    frames = FrameFeatures(
        xy=xy, desc=desc, depth=kp_depth, valid=valid,
        timestamp=jnp.asarray(d["timestamps"], jnp.float32),
        stationary=jnp.zeros(N, bool),
        frame_id=jnp.arange(N, dtype=jnp.int32),
    )
    result = pipeline.run_tracking(frames, cfg)
    ok = np.asarray(result.outputs.tracking_ok)
    assert ok[1:].mean() > 0.7, ok
    res = ate_mod.compute_ate(
        result.timestamps, result.t_smoothed, d["timestamps"], d["t"],
        with_scale=False,
    )
    assert res.rmse < 0.25, res.rmse


def test_mono_no_depth_sim3_ate():
    """TRUE mono: every depth invalid — map points exist only via
    triangulation, scale comes from the motion-scale memory chain. The
    trajectory is defined up to scale; sim(3) alignment must fit it."""
    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, rgbd=False)
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=30, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=3, num_landmarks=800, rgbd=False,
    )
    assert (seq.kp_depth == 0).all()
    result, _ = pipeline.run_synthetic(seq, cfg, use_imu=True)
    outs = result.outputs
    assert int(np.asarray(outs.used_3d3d).sum()) == 0
    assert float(np.asarray(outs.tracking_ok)[1:].mean()) > 0.7
    res = ate_mod.compute_ate(
        result.timestamps, result.t_smoothed, seq.timestamps, seq.t,
        with_scale=True,
    )
    assert np.isfinite(res.rmse)
    assert res.rmse < 0.2, res.rmse
    # The un-aligned trajectory is NOT metric (scale fallback 0.05 m/frame
    # vs the true ~32 mm/frame) — the sim(3) fit is what mono promises.
    step_est = np.linalg.norm(np.diff(result.t_smoothed, axis=0), axis=-1)
    assert step_est[5:].mean() > 0.0  # moved at all


def test_sensor_noise_model():
    """Kinect-model sensor noise post-process: gray read noise at the
    configured sigma, depth error growing with range, ~2% holes, and the
    original dict untouched (cache-preserving)."""
    c = tiny_test_config().camera
    d = synthetic.make_image_sequence(
        4, width=c.width, height=c.height, fx=c.fx, fy=c.fy, cx=c.cx,
        cy=c.cy, seed=0, num_landmarks=600, radius=2.0, with_rgb=False,
    )
    g0 = d["gray"].copy()
    dn = synthetic.apply_sensor_noise(d, seed=0)
    np.testing.assert_array_equal(d["gray"], g0)  # input not mutated
    g_diff = np.abs(dn["gray"].astype(int) - d["gray"].astype(int)).mean()
    assert 1.0 < g_diff < 2.5  # mean |N(0,2)| ~ 1.6 counts
    z = d["depth_u16"].astype(float) / 5000.0
    zn = dn["depth_u16"].astype(float) / 5000.0
    valid = (d["depth_u16"] > 0) & (dn["depth_u16"] > 0)
    zm = np.median(z[valid])
    dz = np.abs(zn - z)
    lo = dz[valid & (z <= zm)].mean()
    hi = dz[valid & (z > zm)].mean()
    assert lo < hi < 0.2  # quadratic-in-range error model
    holes = ((dn["depth_u16"] == 0) & (d["depth_u16"] > 0)).mean()
    assert 0.01 < holes < 0.03
    # Determinism: same seed -> same noise (bench reproducibility).
    dn2 = synthetic.apply_sensor_noise(d, seed=0)
    np.testing.assert_array_equal(dn["gray"], dn2["gray"])
    np.testing.assert_array_equal(dn["depth_u16"], dn2["depth_u16"])
