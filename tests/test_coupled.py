"""The coupled one-program pipeline (core/coupled.py): uint8 frames ->
SuperPoint -> decode -> keypoint depth -> tracking scan -> dense fusion,
all inside one jit — the measured-benchmark path."""

import numpy as np

import jax
import jax.numpy as jnp

from vslam_tpu.config import tiny_test_config
from vslam_tpu.core import coupled
from vslam_tpu.core.state import init_state
from vslam_tpu.data import synthetic
from vslam_tpu.models import superpoint as sp
from vslam_tpu.ops import gridhash

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def _data(cfg, n_frames, chunk, B=None, seed=0):
    c = cfg.camera
    seqs = [
        synthetic.make_image_sequence(
            n_frames, width=c.width, height=c.height,
            fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
            seed=seed + i, num_landmarks=500, radius=2.0, with_rgb=False,
        )
        for i in range(B or 1)
    ]
    S = n_frames // chunk
    H, W = c.height, c.width
    if B is None:
        d = seqs[0]
        return (
            jnp.asarray(d["gray"].reshape(S, chunk, H, W)),
            jnp.asarray(d["depth_u16"].reshape(S, chunk, H, W)),
            jnp.asarray(d["timestamps"].reshape(S, chunk).astype(np.float32)),
            jnp.asarray(np.arange(n_frames, dtype=np.int32).reshape(S, chunk)),
            jnp.zeros((S, chunk), bool),
            d,
        )
    gray = jnp.asarray(
        np.stack([s["gray"] for s in seqs], 1).reshape(S, chunk, B, H, W)
    )
    dep = jnp.asarray(
        np.stack([s["depth_u16"] for s in seqs], 1).reshape(S, chunk, B, H, W)
    )
    ts = jnp.asarray(
        np.stack([s["timestamps"].astype(np.float32) for s in seqs], 1)
        .reshape(S, chunk, B)
    )
    fid = jnp.asarray(
        np.broadcast_to(
            np.arange(n_frames, dtype=np.int32)[:, None], (n_frames, B)
        ).reshape(S, chunk, B)
    )
    return gray, dep, ts, fid, jnp.zeros((S, chunk, B), bool), seqs


def test_coupled_single_runs():
    cfg = tiny_test_config()
    params = sp.init_params(
        jax.random.PRNGKey(0), height=cfg.camera.height, width=cfg.camera.width
    )
    gray, dep, ts, fid, stat, d = _data(cfg, n_frames=8, chunk=4)
    st0 = init_state(cfg)
    dn0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )
    stf, dnf, outs = coupled.run_coupled(
        params, st0, dn0, gray, dep, None, ts, fid, stat, cfg
    )
    assert outs.t.shape == (8, 3)
    assert np.isfinite(np.asarray(outs.t)).all()
    assert int(dnf.cloud_count) > 100  # dense fusion accumulated
    assert int(np.asarray(outs.num_matches).sum()) >= 0  # diagnostics wired
    assert outs.epi_before.shape == (8,)


def test_coupled_outputs_feed_rts_and_backend():
    """The coupled program's StepOutputs carry the EKF snapshots the RTS
    smoother needs (the reference smooths before every evaluation,
    `src/main.cpp:1311`) and its final state drives the gain-gated
    PGO/BA backend — the bench evaluates coupled ATE on exactly this
    path."""
    from vslam_tpu.core import pipeline

    cfg = tiny_test_config()
    params = sp.init_params(
        jax.random.PRNGKey(0), height=cfg.camera.height, width=cfg.camera.width
    )
    gray, dep, ts, fid, stat, d = _data(cfg, n_frames=8, chunk=4)
    st0 = init_state(cfg)
    dn0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )
    stf, dnf, outs = coupled.run_coupled(
        params, st0, dn0, gray, dep, None, ts, fid, stat, cfg
    )
    res = pipeline.result_from_outputs(stf, outs)
    assert res.t_smoothed.shape == (8, 3)
    assert np.isfinite(res.t_smoothed).all()
    res_b = pipeline.run_backend(res, cfg)
    assert res_b.t_smoothed.shape == (8, 3)
    assert np.isfinite(res_b.t_smoothed).all()


def test_coupled_batched_runs():
    cfg = tiny_test_config()
    params = sp.init_params(
        jax.random.PRNGKey(0), height=cfg.camera.height, width=cfg.camera.width
    )
    B = 2
    gray, dep, ts, fid, stat, seqs = _data(cfg, n_frames=8, chunk=4, B=B)
    from vslam_tpu.parallel import mesh as pmesh

    sts = pmesh.replicate_state(cfg, B)
    dn0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )
    dnB = jax.tree.map(lambda x: jnp.stack([x] * B), dn0)
    stf, dnf, outs = coupled.run_coupled_batched(
        params, sts, dnB, gray, dep, ts, fid, stat, cfg
    )
    assert outs.t.shape == (8, B, 3)
    assert np.isfinite(np.asarray(outs.t)).all()
    assert (np.asarray(dnf.cloud_count) > 100).all()
