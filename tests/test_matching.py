import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import matching


def unit(rng, n, d=32):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_l2_matrix_matches_numpy(rng):
    a = unit(rng, 20)
    b = unit(rng, 30)
    d = np.asarray(matching.l2_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_knn2_ratio_identity(rng):
    base = unit(rng, 50)
    # desc2 = permuted copies with tiny noise -> unambiguous matches
    perm = rng.permutation(50)
    d2 = base[perm] + rng.normal(0, 0.01, (50, 32)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    res = matching.knn2_ratio_match(jnp.asarray(base), jnp.asarray(d2), ratio=0.9)
    idx = np.asarray(res.idx)
    ok = np.asarray(res.valid)
    inv = np.argsort(perm)
    assert ok.mean() > 0.9
    np.testing.assert_array_equal(idx[ok], inv[ok])


def test_ratio_rejects_ambiguous(rng):
    a = unit(rng, 10)
    # two identical rows in db -> ratio test must reject
    b = np.concatenate([a, a], axis=0)
    res = matching.knn2_ratio_match(jnp.asarray(a), jnp.asarray(b), ratio=0.75, mutual=False)
    assert not bool(np.asarray(res.valid).any())


def test_validity_masks(rng):
    a = unit(rng, 16)
    b = np.concatenate([a[:8], unit(rng, 8)], axis=0)
    v1 = np.zeros(16, dtype=bool)
    v1[:8] = True
    v2 = np.ones(16, dtype=bool)
    res = matching.knn2_ratio_match(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(v1), jnp.asarray(v2), ratio=0.9
    )
    ok = np.asarray(res.valid)
    assert not ok[8:].any()
    assert ok[:8].mean() > 0.8


def test_radius_match(rng):
    K, M, D = 40, 25, 32
    desc_q = unit(rng, K, D)
    uv_q = rng.uniform(0, 200, (K, 2)).astype(np.float32)
    # db entries = subset of queries, slightly moved
    sel = rng.choice(K, M, replace=False)
    desc_db = desc_q[sel] + rng.normal(0, 0.005, (M, D)).astype(np.float32)
    desc_db /= np.linalg.norm(desc_db, axis=-1, keepdims=True)
    uv_db = uv_q[sel] + rng.normal(0, 2.0, (M, 2)).astype(np.float32)
    mp_idx, ok, dist = matching.radius_descriptor_match(
        jnp.asarray(desc_q), jnp.asarray(uv_q), jnp.ones(K, bool),
        jnp.asarray(desc_db), jnp.asarray(uv_db), jnp.ones(M, bool),
        radius_px=12.0, desc_thresh=0.5,
    )
    mp_idx = np.asarray(mp_idx)
    ok = np.asarray(ok)
    # keypoint sel[i] should match db entry i
    hits = 0
    for i, kp in enumerate(sel):
        if ok[kp] and mp_idx[kp] == i:
            hits += 1
    assert hits > 0.85 * M
