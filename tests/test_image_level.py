"""Pixels-in end-to-end with the ORB FALLBACK frontend (C5).

No feature cache, no injected observations: the frame stream is built
purely from rasterized images + rendered depth maps, exercising the full
detect -> describe -> match -> motion -> map -> smooth chain through the
classical fallback. The LEARNED SuperPoint counterpart (the flagship
path) lives in tests/test_superpoint_learned.py."""

import numpy as np
import jax
import jax.numpy as jnp

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core import pipeline
from vslam_tpu.core.state import FrameFeatures
from vslam_tpu.data import synthetic
from vslam_tpu.ops import orb

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def test_image_level_tracking():
    cfg = tiny_test_config()
    c = cfg.camera
    N = 10
    rng = np.random.default_rng(11)
    world = synthetic.make_room_world(rng, num_landmarks=900, desc_dim=8)
    ts, R, t = synthetic.make_trajectory(N, dt=0.1, radius=2.0)

    K = cfg.frontend.max_keypoints
    xs, ds, zs, vs = [], [], [], []
    for i in range(N):
        img = synthetic.render_textured(
            world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width, c.height
        )
        depth = synthetic.render_depth_room(
            R[i].astype(np.float64), t[i].astype(np.float64),
            c.fx, c.fy, c.cx, c.cy, c.width, c.height,
        )
        xy, score, valid, desc = orb.detect_orb(
            jnp.asarray(img), max_keypoints=K, num_levels=2, threshold=0.06
        )
        # keypoint depth from the rendered depth map (nearest pixel)
        u = np.clip(np.round(np.asarray(xy)[:, 0]).astype(int), 0, c.width - 1)
        v = np.clip(np.round(np.asarray(xy)[:, 1]).astype(int), 0, c.height - 1)
        z = depth[v, u]
        xs.append(np.asarray(xy))
        # ORB descriptors are 256-d ±1; tile/truncate to config D
        d = np.asarray(desc)[:, : cfg.frontend.descriptor_dim]
        d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        ds.append(d)
        zs.append(z)
        vs.append(np.asarray(valid))

    frames = FrameFeatures(
        xy=jnp.asarray(np.stack(xs)),
        desc=jnp.asarray(np.stack(ds)),
        depth=jnp.asarray(np.stack(zs)),
        valid=jnp.asarray(np.stack(vs)),
        timestamp=jnp.asarray(ts, jnp.float32),
        stationary=jnp.zeros(N, bool),
        frame_id=jnp.arange(N, dtype=jnp.int32),
    )
    result = pipeline.run_tracking(frames, cfg, smooth=True)

    from vslam_tpu.eval import ate as ate_mod

    res = ate_mod.compute_ate(ts, result.t_smoothed, ts, t, with_scale=False)
    # Pixels-in with generic ORB: cm-to-dm level is a pass (the chain held
    # together end-to-end from raw images).
    assert np.isfinite(res.rmse)
    assert res.rmse < 0.30, res
    ok = np.asarray(result.outputs.tracking_ok)
    assert ok[1:].mean() > 0.5, ok
