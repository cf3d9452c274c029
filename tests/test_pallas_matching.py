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


def test_radius_match_fused_agrees(rng):
    """Fused Pallas radius matcher == XLA radius_descriptor_match + found
    counter on random local-map-shaped inputs (interpret mode)."""
    import jax.numpy as jnp

    M, K, D = 2048, 96, 64
    db = unit(rng, M, D)
    q = np.concatenate(
        [db[:48] + rng.normal(0, 0.05, (48, D)).astype(np.float32), unit(rng, 48, D)]
    )
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    uv_db = rng.uniform(0, 640, (M, 2)).astype(np.float32)
    # place half the queries near db projections so the radius gate passes
    uv_q = np.concatenate(
        [uv_db[:48] + rng.normal(0, 4, (48, 2)).astype(np.float32),
         rng.uniform(0, 640, (48, 2)).astype(np.float32)]
    )
    vdb = rng.random(M) > 0.15
    vq = rng.random(K) > 0.1
    radius, thresh = 12.0, 0.7

    mp_idx_p, kp_ok_p, dist_p, minpix_p = pm.radius_match_pallas(
        jnp.asarray(q), jnp.asarray(uv_q), jnp.asarray(vq),
        jnp.asarray(db), jnp.asarray(uv_db), jnp.asarray(vdb),
        radius_px=radius, desc_thresh=thresh, tile=256, interpret=True,
    )
    pix_d2 = matching.pixel_dist2_matrix(jnp.asarray(uv_db), jnp.asarray(uv_q))
    mp_idx_x, kp_ok_x, dist_x = matching.radius_descriptor_match(
        jnp.asarray(q), jnp.asarray(uv_q), jnp.asarray(vq),
        jnp.asarray(db), jnp.asarray(uv_db), jnp.asarray(vdb),
        radius_px=radius, desc_thresh=thresh, pix_d2=pix_d2,
    )
    np.testing.assert_array_equal(np.asarray(kp_ok_p), np.asarray(kp_ok_x))
    np.testing.assert_array_equal(np.asarray(mp_idx_p), np.asarray(mp_idx_x))
    ok = np.asarray(kp_ok_x)
    np.testing.assert_allclose(
        np.asarray(dist_p)[ok], np.asarray(dist_x)[ok], atol=1e-4
    )
    minpix_x = np.where(
        vq[None, :], np.asarray(pix_d2), np.inf
    ).min(axis=-1)
    # The Pallas kernel computes pixel distances by exact subtraction; the
    # XLA path's |a|^2+|b|^2-2ab identity carries ~eps*|uv|^2 ~ 0.2 px^2 of
    # rounding — tolerance covers the XLA side's error, not the kernel's.
    np.testing.assert_allclose(
        np.minimum(np.asarray(minpix_p), 1e9), np.minimum(minpix_x, 1e9),
        rtol=1e-4, atol=0.5,
    )


def test_radius_match_fused_vmap(rng):
    """The batched tracking path vmaps the matcher — pin that vmap of the
    Pallas kernel (interpret mode) matches per-member calls."""
    import jax
    import jax.numpy as jnp
    import functools

    B, M, K, D = 3, 512, 32, 32
    db = np.stack([unit(rng, M, D) for _ in range(B)])
    q = np.stack([unit(rng, K, D) for _ in range(B)])
    uv_db = rng.uniform(0, 640, (B, M, 2)).astype(np.float32)
    uv_q = uv_db[:, :K] + rng.normal(0, 5, (B, K, 2)).astype(np.float32)
    vdb = rng.random((B, M)) > 0.2
    vq = np.ones((B, K), bool)

    f = functools.partial(
        pm.radius_match_pallas, radius_px=12.0, desc_thresh=0.9,
        tile=256, interpret=True,
    )
    outs_v = jax.vmap(f)(
        jnp.asarray(q), jnp.asarray(uv_q), jnp.asarray(vq),
        jnp.asarray(db), jnp.asarray(uv_db), jnp.asarray(vdb),
    )
    for b in range(B):
        outs_1 = f(
            jnp.asarray(q[b]), jnp.asarray(uv_q[b]), jnp.asarray(vq[b]),
            jnp.asarray(db[b]), jnp.asarray(uv_db[b]), jnp.asarray(vdb[b]),
        )
        for a, e in zip(outs_v, outs_1):
            np.testing.assert_allclose(np.asarray(a[b]), np.asarray(e), atol=1e-5)


def test_radius_match_batched_kernel_agrees(rng):
    """The batched-native kernel (ONE launch for B members, used by
    `tracking_batched._track_local_map_batched`) == vmap of the single
    kernel == vmap of the XLA path (interpret mode)."""
    import jax
    import jax.numpy as jnp
    import functools

    B, M, K, D = 3, 1024, 96, 64
    db = np.stack([unit(rng, M, D) for _ in range(B)])
    q = np.stack([unit(rng, K, D) for _ in range(B)])
    uv_db = rng.uniform(0, 640, (B, M, 2)).astype(np.float32)
    uv_q = rng.uniform(0, 640, (B, K, 2)).astype(np.float32)
    # Plant guaranteed matches: db row i copies query (i % K).
    for b in range(B):
        for i in range(0, 200, 7):
            db[b, i] = q[b, i % K]
            uv_db[b, i] = uv_q[b, i % K] + 2.0
    vdb = rng.random((B, M)) > 0.2
    vq = rng.random((B, K)) > 0.1
    kw = dict(radius_px=12.0, desc_thresh=0.7)
    arrs = (jnp.asarray(q), jnp.asarray(uv_q), jnp.asarray(vq),
            jnp.asarray(db), jnp.asarray(uv_db), jnp.asarray(vdb))

    outs_b = pm.radius_match_pallas_batched(
        *arrs, tile=512, interpret=True, **kw
    )
    outs_v = jax.vmap(
        functools.partial(pm.radius_match_pallas, tile=512, interpret=True,
                          **kw)
    )(*arrs)
    for name, a, e in zip(("mp_idx", "kp_ok", "dist", "minpix"),
                          outs_b, outs_v):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5, err_msg=name
        )
    outs_x = jax.vmap(
        functools.partial(matching.radius_descriptor_match_fused, **kw)
    )(*arrs)
    np.testing.assert_array_equal(np.asarray(outs_b[0]), np.asarray(outs_x[0]))
    np.testing.assert_array_equal(np.asarray(outs_b[1]), np.asarray(outs_x[1]))
    # XLA-side matmul-identity rounding (see test_radius_match_fused_agrees).
    np.testing.assert_allclose(
        np.asarray(outs_b[3]), np.asarray(outs_x[3]), rtol=1e-3, atol=0.5
    )
    assert int(np.asarray(outs_b[1]).sum()) > 0


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
