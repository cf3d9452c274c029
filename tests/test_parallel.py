"""Multi-device batched multi-sequence tracking on the virtual CPU mesh."""

import numpy as np
import jax
import pytest

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core.pipeline import features_from_synthetic
from vslam_tpu.data import synthetic
from vslam_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


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


def test_sharded_coupled_matches_single():
    """FULL coupled pipeline (SuperPoint -> decode -> tracking -> dense
    fusion) sharded one-sequence-per-device == the single-device program
    on each member's data (pixels in, trajectory + cloud out)."""
    import jax.numpy as jnp

    from vslam_tpu.core import coupled
    from vslam_tpu.core.state import init_state
    from vslam_tpu.models import superpoint as sp
    from vslam_tpu.ops import gridhash

    cfg = tiny_test_config()
    c = cfg.camera
    B, n_frames, chunk = 2, 8, 4
    S = n_frames // chunk
    params = sp.init_params(jax.random.PRNGKey(0), height=c.height, width=c.width)
    seqs = [
        synthetic.make_image_sequence(
            n_frames, width=c.width, height=c.height,
            fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
            seed=7 + i, num_landmarks=500, radius=2.0, with_rgb=False,
        )
        for i in range(B)
    ]
    H, W = c.height, c.width
    gray = np.stack([s["gray"].reshape(S, chunk, H, W) for s in seqs])
    dep = np.stack([s["depth_u16"].reshape(S, chunk, H, W) for s in seqs])
    ts = np.stack(
        [s["timestamps"].reshape(S, chunk).astype(np.float32) for s in seqs]
    )
    fid = np.broadcast_to(
        np.arange(n_frames, dtype=np.int32).reshape(S, chunk), (B, S, chunk)
    ).copy()
    stat = np.zeros((B, S, chunk), bool)

    m = pmesh.make_mesh(B)
    st0 = init_state(cfg)
    dn0 = gridhash.init_dense_map(cfg.dense.hash_capacity, cfg.dense.cloud_capacity)
    states = pmesh.shard_batched(pmesh.replicate_state(cfg, B), m)
    dense = pmesh.shard_batched(
        jax.tree.map(lambda x: jnp.stack([x] * B), dn0), m
    )
    sts_f, dn_f, outs = pmesh.sharded_coupled_run(
        params, states, dense,
        *[pmesh.shard_batched(jnp.asarray(x), m) for x in (gray, dep, ts, fid, stat)],
        cfg, m,
    )
    assert outs.t.shape == (B, n_frames, 3)

    for b in range(B):
        st_s, dn_s, outs_s = coupled.run_coupled(
            params, st0, dn0,
            jnp.asarray(gray[b]), jnp.asarray(dep[b]), None,
            jnp.asarray(ts[b]), jnp.asarray(fid[b]), jnp.asarray(stat[b]),
            cfg,
        )
        np.testing.assert_allclose(
            np.asarray(outs.t)[b], np.asarray(outs_s.t), atol=1e-4
        )
        # Dense clouds agree member-by-member (same insertion order).
        assert int(jax.tree.leaves(dn_f)[0].shape[0]) == B
        np.testing.assert_array_equal(
            np.asarray(dn_f.cloud_count)[b], np.asarray(dn_s.cloud_count)
        )


def test_sharded_scan_rejects_mismatched_batch():
    import pytest

    cfg = tiny_test_config()
    seqs, frames = _batch(cfg, 4, 5)
    m = pmesh.make_mesh(8)
    states = pmesh.replicate_state(cfg, 4)
    with pytest.raises(ValueError):
        pmesh.sharded_tracking_scan(states, frames, cfg, m)
