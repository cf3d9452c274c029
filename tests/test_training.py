"""SuperPoint self-supervised training: loss decreases, detector learns."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.models import train_superpoint as tsp

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def test_cell_labels():
    corners = jnp.asarray([[[12.0, 20.0], [100.0, 30.0]]])
    cmask = jnp.asarray([[True, True]])
    labels = tsp.corners_to_cell_labels(corners, cmask, 120, 160)
    assert labels.shape == (1, 15, 20)
    # corner (12, 20): cell (y=2, x=1), sub = (20%8)*8 + (12%8) = 4*8+4
    assert int(labels[0, 2, 1]) == 36
    # empty cell -> dustbin
    assert int(labels[0, 0, 0]) == 64


def test_homography_warp_roundtrip():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
    H = jnp.tile(jnp.eye(3), (2, 1, 1))
    warped, inb = tsp.warp_images(imgs, H)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(imgs), atol=1e-5)
    assert bool(inb.all())


def test_training_reduces_loss():
    state, hist = tsp.train_synthetic(steps=12, batch=4, height=64, width=80,
                                      seed=0, log_every=0)
    first = np.mean([h["loss"] for h in hist[:3]])
    last = np.mean([h["loss"] for h in hist[-3:]])
    assert np.isfinite(last)
    assert last < first, (first, last)
    # detector loss specifically improves (cross-entropy from ~log(65))
    assert hist[-1]["det"] < hist[0]["det"]
