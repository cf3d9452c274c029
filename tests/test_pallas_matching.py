"""Pallas streaming matcher vs the dense reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import matching, pallas_matching as pm


def unit(rng, n, d=64):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_top2_matches_dense(rng):
    M, Kq, D = 1000, 96, 64
    db = unit(rng, M, D)
    q = unit(rng, Kq, D)
    vdb = rng.random(M) > 0.1
    d1, d2, idx = pm.top2_match_pallas(
        jnp.asarray(db), jnp.asarray(vdb), jnp.asarray(q), tile=256, interpret=True
    )
    # dense reference
    dist = np.asarray(matching.l2_distance_matrix(jnp.asarray(q), jnp.asarray(db),
                                                  None, jnp.asarray(vdb)))
    order = np.argsort(dist, axis=1)
    np.testing.assert_allclose(np.asarray(d1), dist[np.arange(Kq), order[:, 0]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), dist[np.arange(Kq), order[:, 1]], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), order[:, 0])


def test_ratio_match_agrees(rng):
    M, Kq, D = 512, 64, 32
    db = unit(rng, M, D)
    q = np.concatenate([db[:32] + rng.normal(0, 0.01, (32, D)).astype(np.float32),
                        unit(rng, 32, D)])
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vq = np.ones(Kq, bool)
    vdb = np.ones(M, bool)
    idx_p, ok_p, d_p = pm.knn2_ratio_match_pallas(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(vq), jnp.asarray(vdb),
        ratio=0.8, tile=128, interpret=True,
    )
    res = matching.knn2_ratio_match(jnp.asarray(q), jnp.asarray(db),
                                    jnp.asarray(vq), jnp.asarray(vdb),
                                    ratio=0.8, mutual=False)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(res.valid))
    agree = np.asarray(idx_p)[np.asarray(ok_p)] == np.asarray(res.idx)[np.asarray(res.valid)]
    assert agree.all()


def test_streaming_dispatch_cpu_fallback():
    """Off-TPU, the streaming matcher falls back to the XLA path and
    agrees with knn2_ratio_match (mutual off)."""
    import numpy as np
    import jax.numpy as jnp

    from vslam_tpu.ops import matching

    rng = np.random.default_rng(3)
    db = jnp.asarray(rng.normal(size=(5000, 32)), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    q = db[:64] + 0.01 * jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    dbv = jnp.asarray(rng.random(5000) > 0.1)
    qv = jnp.ones(64, bool)

    m1 = matching.knn2_ratio_match_streaming(q, db, qv, dbv, ratio=0.9)
    m2 = matching.knn2_ratio_match(q, db, qv, dbv, ratio=0.9, mutual=False)
    np.testing.assert_array_equal(np.asarray(m1.idx), np.asarray(m2.idx))
    np.testing.assert_array_equal(np.asarray(m1.valid), np.asarray(m2.valid))
