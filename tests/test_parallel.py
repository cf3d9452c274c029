"""Multi-device batched multi-sequence tracking on the virtual CPU mesh."""

import numpy as np
import jax

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core.pipeline import features_from_synthetic
from vslam_tpu.data import synthetic
from vslam_tpu.parallel import mesh as pmesh


def _batch(cfg, B, N):
    seqs = [
        synthetic.make_sequence(
            num_frames=N,
            max_keypoints=cfg.frontend.max_keypoints,
            desc_dim=cfg.frontend.descriptor_dim,
            fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
            width=cfg.camera.width, height=cfg.camera.height,
            seed=i, num_landmarks=500,
        )
        for i in range(B)
    ]
    frames = jax.tree.map(
        lambda *xs: np.stack(xs), *[features_from_synthetic(s) for s in seqs]
    )
    return seqs, frames


def test_batched_scan_multi_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_test_config()
    B, N = 8, 6
    seqs, frames = _batch(cfg, B, N)
    m = pmesh.make_mesh(8)
    states = pmesh.shard_batched(pmesh.replicate_state(cfg, B), m)
    frames = pmesh.shard_batched(frames, m)
    final, outs = pmesh.batched_tracking_scan(states, frames, cfg)
    # Sharding survived
    assert outs.t.shape == (B, N, 3)
    diag = pmesh.batched_diagnostics(outs, m)
    assert float(diag["tracked_frac"]) > 0.8
    # each sequence produced finite trajectories
    assert np.isfinite(np.asarray(outs.t)).all()


def test_batched_matches_single_sequence():
    """Per-sequence results in the batch equal an unbatched scan."""
    cfg = tiny_test_config()
    B, N = 2, 6
    seqs, frames = _batch(cfg, B, N)
    m = pmesh.make_mesh(2)
    states = pmesh.shard_batched(pmesh.replicate_state(cfg, B), m)
    framesb = pmesh.shard_batched(frames, m)
    _, outs = pmesh.batched_tracking_scan(states, framesb, cfg)

    from vslam_tpu.core import pipeline

    single = pipeline.run_tracking(
        features_from_synthetic(seqs[0]), cfg, smooth=False
    )
    np.testing.assert_allclose(
        np.asarray(outs.t)[0], single.t, atol=1e-4
    )


def test_sharded_scan_matches_single():
    """shard_map path (one unbatched scan per device) == single scans."""
    cfg = tiny_test_config()
    B, N = 8, 5
    seqs, frames = _batch(cfg, B, N)
    m = pmesh.make_mesh(8)
    states = pmesh.shard_batched(pmesh.replicate_state(cfg, B), m)
    framesb = pmesh.shard_batched(frames, m)
    fs, outs = pmesh.sharded_tracking_scan(states, framesb, cfg, m)
    assert outs.t.shape == (B, N, 3)

    from vslam_tpu.core import pipeline
    from vslam_tpu.core.pipeline import features_from_synthetic

    single = pipeline.run_tracking(features_from_synthetic(seqs[3]), cfg, smooth=False)
    np.testing.assert_allclose(np.asarray(outs.t)[3], single.t, atol=1e-5)


def test_sharded_scan_rejects_mismatched_batch():
    import pytest

    cfg = tiny_test_config()
    seqs, frames = _batch(cfg, 4, 5)
    m = pmesh.make_mesh(8)
    states = pmesh.replicate_state(cfg, 4)
    with pytest.raises(ValueError):
        pmesh.sharded_tracking_scan(states, frames, cfg, m)
