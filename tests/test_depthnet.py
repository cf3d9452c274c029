"""DepthNet: forward shapes, keypoint sampling, training, mono wiring.

The reference's depth capability (C7, `src/DepthEstimator.cpp:15-112`)
is a frozen MiDaS checkpoint; here it is a trained-from-synthetic net
(models/depthnet.py + models/train_depthnet.py) consumed by the coupled
mono mode via `run_coupled(depth_params=...)`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.models import depthnet


def test_forward_shapes():
    params = depthnet.init_params(jax.random.PRNGKey(0), height=96, width=160)
    model = depthnet.DepthNet()
    out = model.apply(params, jnp.zeros((2, 96, 160, 1), jnp.float32))
    assert out.shape == (2, 24, 40)
    assert out.dtype == jnp.float32


def test_predict_pads_odd_sizes():
    """120x160 camera: half-res 60x80 is not x16; padding + crop must
    produce ceil(60/4) x ceil(80/4) cells."""
    params = depthnet.init_params(jax.random.PRNGKey(0), height=64, width=80)
    gray = jnp.zeros((3, 120, 160), jnp.uint8)
    out = depthnet.predict_log_depth(params, gray)
    assert out.shape == (3, 15, 20)
    # VGA (the benchmark camera) needs no padding.
    gray = jnp.zeros((1, 480, 640), jnp.uint8)
    out = depthnet.predict_log_depth(params, gray)
    assert out.shape == (1, 60, 80)


def test_sample_log_depth_at_keypoints():
    """Constant log-depth map -> exp(c) everywhere; a linear-in-x map ->
    bilinear interpolation at the cell-center grid."""
    C, Hs, Ws = 2, 8, 10
    const = jnp.full((C, Hs, Ws), jnp.log(2.5))
    kp = jnp.asarray(
        np.stack([np.random.default_rng(0).uniform(0, 79, (C, 5)),
                  np.random.default_rng(1).uniform(0, 63, (C, 5))], -1),
        jnp.float32,
    )
    d = depthnet.sample_log_depth_at_keypoints(const, kp)
    np.testing.assert_allclose(np.asarray(d), 2.5, rtol=1e-5)

    ramp = jnp.tile(
        jnp.arange(Ws, dtype=jnp.float32)[None, None, :] * 0.1, (C, Hs, 1)
    )
    # Keypoint at full-res pixel u: map coordinate (u + 0.5)/8 - 0.5.
    kp = jnp.asarray([[[35.5, 20.0]]] * C, jnp.float32)  # map x = 4.0
    d = depthnet.sample_log_depth_at_keypoints(ramp, kp)
    np.testing.assert_allclose(np.asarray(d), np.exp(0.4), rtol=1e-5)


def test_training_reduces_loss():
    """A few steps on a tiny random dataset must reduce the masked L1."""
    from vslam_tpu.models import train_depthnet as tdn

    rng = np.random.default_rng(0)
    N, H, W = 4, 64, 80
    gray = jnp.asarray(rng.uniform(0, 1, (N, H, W, 1)).astype(np.float32))
    logd = jnp.asarray(rng.uniform(0, 2, (N, H // 4, W // 4)).astype(np.float32))
    valid = jnp.ones((N, H // 4, W // 4), bool)

    init, step, _ = tdn.make_trainer(lr=5e-3, height=H, width=W)
    state = init(jax.random.PRNGKey(1))
    losses = []
    for i in range(12):
        state, loss = step(state, gray, logd, valid, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_checkpoint_roundtrip(tmp_path):
    from vslam_tpu.models import weights as w

    params = depthnet.init_params(jax.random.PRNGKey(3), height=64, width=80)
    path = str(tmp_path / "dn.npz")
    w.save_depthnet_npz(path, params)
    loaded = w.depthnet_params_from_npz(path)
    model = depthnet.DepthNet()
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (1, 64, 80, 1)).astype(np.float32)
    )
    a = np.asarray(model.apply(params, x))
    b = np.asarray(model.apply(loaded, x))
    np.testing.assert_allclose(a, b, atol=2e-2)  # f16 storage round-off


def test_coupled_mono_with_depthnet_runs():
    """run_coupled with depth_params + all-zero sensor depth executes and
    feeds predicted (finite, positive) keypoint depth into tracking."""
    from vslam_tpu.config import tiny_test_config
    from vslam_tpu.core import coupled
    from vslam_tpu.core.state import init_state
    from vslam_tpu.models import superpoint as sp
    from vslam_tpu.ops import gridhash

    cfg = tiny_test_config().replace(rgbd=False)
    c = cfg.camera
    S, C = 2, 4
    N = S * C
    key = jax.random.PRNGKey(0)
    sp_params = sp.init_params(key, height=c.height, width=c.width)
    dn_params = depthnet.init_params(jax.random.PRNGKey(1), height=64, width=80)
    rng = np.random.default_rng(0)
    gray = jnp.asarray(
        rng.integers(0, 255, (S, C, c.height, c.width), np.uint8)
    )
    dep = jnp.zeros((S, C, c.height, c.width), jnp.uint16)
    ts = jnp.arange(N, dtype=jnp.float32).reshape(S, C) * 0.1
    fids = jnp.arange(N, dtype=jnp.int32).reshape(S, C)
    stat = jnp.zeros((S, C), bool)
    st = init_state(cfg)
    dn_state = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )
    st2, _, outs = coupled.run_coupled(
        sp_params, st, dn_state, gray, dep, None, ts, fids, stat, cfg,
        depth_params=dn_params,
    )
    assert np.asarray(outs.t).shape == (N, 3)
    assert np.all(np.isfinite(np.asarray(outs.t)))
