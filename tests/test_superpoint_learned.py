"""The LEARNED SuperPoint frontend actually works: detector repeatability
on held-out scenes and pixels-in end-to-end tracking driven by the
committed checkpoint (`models/checkpoints/superpoint_synth.npz`, produced
by `scripts/train_superpoint.py` — deterministic synthetic recipe).

The reference's flagship inference is a trained SuperPoint in the loop
every frame (`/root/reference/src/FeatureExtractor.cpp:87-206`); these
tests hold this framework to the same bar with its own trained weights.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def _load_params():
    from vslam_tpu.models import weights as w

    npz = w.find_checkpoint((w.TRAINED_SP_DIR,), ("superpoint_synth.npz",))
    if npz is None:
        pytest.skip("no trained SuperPoint checkpoint committed")
    return w.superpoint_params_from_npz(npz)


def test_detector_repeatability_and_precision():
    """Held-out textured scenes (worlds never seen in training):
    detections must repeat under homographies and descriptors must match
    correctly."""
    from vslam_tpu.models import train_superpoint as tsp

    m = tsp.evaluate_detector(_load_params(), seed=2024, n_pairs=6)
    assert m["kps_per_image"] > 30, m
    assert m["repeatability"] > 0.5, m
    assert m["match_precision"] > 0.7, m
    assert m["matches_per_pair"] > 15, m


def test_image_level_tracking_superpoint():
    """Pixels-in end-to-end with the LEARNED frontend: rendered images ->
    SuperPoint -> tracking -> ATE (the reference's trained-net-in-the-loop
    contract; ORB no longer stands in)."""
    from vslam_tpu.config import tiny_test_config
    from vslam_tpu.core import frontend as fe
    from vslam_tpu.core import pipeline
    from vslam_tpu.core.state import FrameFeatures
    from vslam_tpu.data import synthetic
    from vslam_tpu.eval import ate as ate_mod

    params = _load_params()
    cfg = tiny_test_config()
    # SuperPoint emits 256-d descriptors; track at full descriptor width.
    cfg = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, descriptor_dim=256)
    )
    c = cfg.camera
    N = 10
    rng = np.random.default_rng(11)
    world = synthetic.make_room_world(rng, num_landmarks=900, desc_dim=8)
    ts, R, t = synthetic.make_trajectory(N, dt=0.1, radius=2.0)

    front = fe.SuperPointFrontend(cfg, params=params)
    grays, depths = [], []
    for i in range(N):
        grays.append(
            synthetic.render_textured(
                world, R[i], t[i], c.fx, c.fy, c.cx, c.cy, c.width, c.height
            )
        )
        depths.append(
            synthetic.render_depth_room(
                R[i].astype(np.float64), t[i].astype(np.float64),
                c.fx, c.fy, c.cx, c.cy, c.width, c.height,
            )
        )
    xy, score, valid, desc = front.extract(np.stack(grays))
    assert int(np.asarray(valid).sum(-1).mean()) > 20  # detector fires

    depth = np.asarray(
        fe.sample_depth_at_keypoints(jnp.asarray(np.stack(depths)), xy)
    )
    frames = FrameFeatures(
        xy=xy,
        desc=desc,
        depth=jnp.asarray(depth),
        valid=valid,
        timestamp=jnp.asarray(ts, jnp.float32),
        stationary=jnp.zeros(N, bool),
        frame_id=jnp.arange(N, dtype=jnp.int32),
    )
    result = pipeline.run_tracking(frames, cfg, smooth=True)
    res = ate_mod.compute_ate(ts, result.t_smoothed, ts, t, with_scale=False)
    assert np.isfinite(res.rmse)
    assert res.rmse < 0.30, res
    ok = np.asarray(result.outputs.tracking_ok)
    assert ok[1:].mean() > 0.5, ok
