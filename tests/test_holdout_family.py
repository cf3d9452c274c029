"""Held-out (v2) renderer family: the renderer-overfit hedge.

SuperPoint is trained only on `render_textured` (v1) scenes; the v2
family (`render_textured_v2`: structured textures, illumination field,
vignette + frame-varying gamma) is EVALUATION-ONLY. These tests pin that
the family is genuinely different imagery, and that the trained
frontend + full pixels-in chain still work on it (bench `ate_holdout`
is the measured counterpart).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vslam_tpu.config import tiny_test_config
from vslam_tpu.data import synthetic


def _scene(seed=3, n=600):
    rng = np.random.default_rng(seed)
    world = synthetic.make_room_world(rng, num_landmarks=n, desc_dim=8)
    _, R, t = synthetic.make_trajectory(3, radius=2.0)
    return world, R, t


def test_v2_render_basics():
    world, R, t = _scene()
    kw = dict(fx=200.0, fy=200.0, cx=119.5, cy=89.5, width=240, height=180)
    v1 = synthetic.render_textured(world, R[1], t[1], **kw)
    v2a = synthetic.render_textured_v2(world, R[1], t[1], frame_seed=0, **kw)
    v2b = synthetic.render_textured_v2(world, R[1], t[1], frame_seed=1, **kw)
    for img in (v2a, v2b):
        assert img.shape == (180, 240) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
    # Different family: image statistics differ from v1 on the same scene.
    assert np.abs(v1 - v2a).mean() > 0.02
    # Frame-varying photometrics: same pose, different frame -> different
    # exposure/gamma, same underlying structure.
    assert not np.array_equal(v2a, v2b)
    assert np.corrcoef(v2a.ravel(), v2b.ravel())[0, 1] > 0.9


def test_v2_deterministic():
    world, R, t = _scene()
    kw = dict(fx=200.0, fy=200.0, cx=119.5, cy=89.5, width=240, height=180)
    a = synthetic.render_textured_v2(world, R[0], t[0], frame_seed=5, **kw)
    b = synthetic.render_textured_v2(world, R[0], t[0], frame_seed=5, **kw)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_holdout_e2e_tracking():
    """Full pixels-in chain (trained SuperPoint frontend -> tracking) on a
    v2 sequence the training distribution never contained."""
    from vslam_tpu.core import coupled
    from vslam_tpu.core.state import init_state
    from vslam_tpu.eval import ate as ate_mod
    from vslam_tpu.models import weights as w
    from vslam_tpu.ops import gridhash

    cfg = tiny_test_config()
    c = cfg.camera
    S, C = 4, 4
    N = S * C
    d = synthetic.make_image_sequence(
        N, width=c.width, height=c.height, fx=c.fx, fy=c.fy, cx=c.cx,
        cy=c.cy, seed=44, num_landmarks=900, radius=2.0, with_rgb=False,
        family="v2",
    )
    params, src = w.load_or_init_superpoint(height=c.height, width=c.width)
    gray = jnp.asarray(d["gray"].reshape(S, C, c.height, c.width))
    dep = jnp.asarray(d["depth_u16"].reshape(S, C, c.height, c.width))
    ts = jnp.asarray(
        d["timestamps"].reshape(S, C).astype(np.float32)
    )
    fids = jnp.arange(N, dtype=jnp.int32).reshape(S, C)
    stat = jnp.zeros((S, C), bool)
    st0 = init_state(cfg)
    dn0 = gridhash.init_dense_map(
        cfg.dense.hash_capacity, cfg.dense.cloud_capacity
    )
    st_f, _, outs = coupled.run_coupled(
        params, st0, dn0, gray, dep, None, ts, fids, stat, cfg
    )
    ok = np.asarray(outs.tracking_ok)
    assert ok[1:].mean() > 0.6, ok
    res = ate_mod.compute_ate(
        d["timestamps"], np.asarray(outs.t), d["timestamps"], d["t"],
        with_scale=False,
    )
    assert np.isfinite(res.rmse) and res.rmse < 0.30, res
