"""Dense mapping + point-cloud ops vs scipy/naive oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from vslam_tpu.ops import gridhash, pointcloud as pc


def test_knn_matches_scipy(rng):
    from scipy.spatial import cKDTree

    pts = rng.normal(size=(500, 3)).astype(np.float32)
    valid = np.ones(500, bool)
    d2, idx = pc.knn(jnp.asarray(pts), jnp.asarray(valid), 5, chunk=128)
    tree = cKDTree(pts)
    dref, iref = tree.query(pts, k=6)  # includes self
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d2)), dref[:, 1:], atol=1e-3
    )
    # indices may tie-swap; check sets
    agree = np.mean([
        len(set(np.asarray(idx)[i]) & set(iref[i, 1:])) / 5 for i in range(500)
    ])
    assert agree > 0.98


def test_sor_removes_outliers(rng):
    pts = rng.normal(size=(400, 3)).astype(np.float32) * 0.5
    outliers = rng.normal(size=(20, 3)).astype(np.float32) * 0.5 + 10.0
    allp = np.concatenate([pts, outliers])
    valid = np.ones(420, bool)
    keep = np.asarray(pc.statistical_outlier_removal(jnp.asarray(allp), jnp.asarray(valid), k=10))
    assert keep[:400].mean() > 0.95
    assert keep[400:].mean() < 0.2


def test_normals_on_plane(rng):
    # points on z=0 plane
    xy = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((300, 1), np.float32)], -1)
    pts += rng.normal(0, 0.002, pts.shape).astype(np.float32)
    n = np.asarray(pc.estimate_normals(jnp.asarray(pts), jnp.ones(300, bool), k=12,
                                       viewpoint=jnp.array([0.0, 0.0, 5.0])))
    # normals ~ +z (oriented to viewpoint)
    assert np.abs(n[:, 2]).mean() > 0.99
    assert n[:, 2].mean() > 0.98


def test_mls_flattens_noise(rng):
    xy = rng.uniform(-1, 1, (400, 2)).astype(np.float32)
    z = rng.normal(0, 0.01, (400, 1)).astype(np.float32)
    pts = np.concatenate([xy, z], -1)
    proj = np.asarray(pc.project_to_mls(jnp.asarray(pts), jnp.ones(400, bool), k=16))
    assert np.abs(proj[:, 2]).std() < np.abs(pts[:, 2]).std()


def test_voxel_dedup_insert():
    state = gridhash.init_dense_map(1 << 14, 1 << 12)
    pts = np.array([[0.0, 0.0, 0.0], [0.005, 0.005, 0.005], [0.5, 0.5, 0.5]], np.float32)
    cols = np.zeros((3, 3), np.uint8)
    insert = jax.jit(gridhash.insert_points)
    s1 = insert(state, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(3, bool))
    # points 0 and 1 share the 2cm voxel -> 2 unique
    assert int(s1.cloud_count) == 2
    # re-inserting adds nothing
    s2 = insert(s1, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(3, bool))
    assert int(s2.cloud_count) == 2


def test_dense_accumulation_pipeline(rng):
    from vslam_tpu.data import synthetic

    # one rendered room depth frame
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    depth = synthetic.render_depth_room(R, t, 120.0, 120.0, 79.5, 59.5, 160, 120)
    state = gridhash.init_dense_map(1 << 16, 1 << 14)
    pts, cols, valid = gridhash.backproject_frame(
        jnp.asarray(depth), None, jnp.asarray(R), jnp.asarray(t),
        120.0, 120.0, 79.5, 59.5, pixel_step=4,
    )
    state = jax.jit(gridhash.insert_points)(state, pts, cols, valid)
    n1 = int(state.cloud_count)
    assert n1 > 200
    # same frame again: no growth
    state = jax.jit(gridhash.insert_points)(state, pts, cols, valid)
    assert int(state.cloud_count) == n1


def test_adaptive_downsample(rng):
    near = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
    far = rng.uniform(8, 9, (300, 3)).astype(np.float32)
    pts = np.concatenate([near, far])
    keep = np.asarray(pc.adaptive_downsample(
        jnp.asarray(pts), jnp.ones(600, bool), jnp.zeros(3)
    ))
    # coarse far voxels collapse more aggressively
    assert keep[300:].mean() < keep[:300].mean() + 1e-6


def test_fan_triangulation(rng):
    xy = rng.uniform(0, 0.2, (100, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((100, 1), np.float32)], -1)
    faces, ok = pc.fan_triangulation(jnp.asarray(pts), jnp.ones(100, bool), k=5, max_edge=0.1)
    faces, ok = np.asarray(faces), np.asarray(ok)
    assert ok.sum() > 50
    f = faces[ok]
    assert (f >= 0).all() and (f < 100).all()
    assert (f[:, 0] != f[:, 1]).all()


def test_surface_aware_filter_keeps_planes(rng):
    # planar patch (surface-like) + volumetric fuzz (isotropic)
    xy = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    plane = np.concatenate([xy, rng.normal(0, 0.002, (300, 1)).astype(np.float32)], -1)
    fuzz = rng.normal(0, 0.5, (100, 3)).astype(np.float32) + np.array([4.0, 0, 0], np.float32)
    pts = np.concatenate([plane, fuzz])
    # Reference gate (main.cpp:626-631): anisotropy = 1 - lmin/lmax.
    # Planes score ~1.0 exactly; isotropic gaussian fuzz scores ~0.7 at
    # k=15 (small-sample eigenvalue spread), so a tight gate separates.
    keep = np.asarray(pc.surface_aware_filter(
        jnp.asarray(pts), jnp.ones(400, bool), k=15, min_anisotropy=0.93
    ))
    assert keep[:300].mean() > 0.9   # plane kept
    assert keep[300:].mean() < 0.4   # isotropic fuzz mostly dropped


def test_fuse_sequence_matches_per_frame_inserts(rng):
    """Device-side scanned fusion (main.cpp:1081-1146 as one program) must
    equal the per-frame insert loop, including chunk padding no-ops."""
    from vslam_tpu.data import synthetic

    fx, fy, cx, cy = 120.0, 120.0, 79.5, 59.5
    n = 5
    Rs = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    ts = np.stack([np.array([0.1 * i, 0, 0], np.float32) for i in range(n)])
    depths = np.stack([
        synthetic.render_depth_room(Rs[i], ts[i], fx, fy, cx, cy, 160, 120)
        for i in range(n)
    ])
    rgbs = (rng.random((n, 120, 160, 3)) * 255).astype(np.uint8)

    # reference: python loop of jitted single-frame inserts
    s_ref = gridhash.init_dense_map(1 << 16, 1 << 14)
    ins = jax.jit(gridhash.insert_points)
    for i in range(n):
        pts, cols, valid = gridhash.backproject_frame(
            jnp.asarray(depths[i]), jnp.asarray(rgbs[i]),
            jnp.asarray(Rs[i]), jnp.asarray(ts[i]), fx, fy, cx, cy,
            pixel_step=4,
        )
        s_ref = ins(s_ref, pts, cols, valid)

    # scanned fusion with a chunk size that forces padding
    s_scan = gridhash.init_dense_map(1 << 16, 1 << 14)
    s_scan = gridhash.fuse_sequence(
        s_scan, depths, rgbs, Rs, ts, fx, fy, cx, cy,
        pixel_step=4, chunk=3,
    )
    n_ref, n_scan = int(s_ref.cloud_count), int(s_scan.cloud_count)
    assert n_ref == n_scan and n_ref > 200, (n_ref, n_scan)
    np.testing.assert_array_equal(
        np.asarray(s_ref.cloud_xyz)[:n_ref], np.asarray(s_scan.cloud_xyz)[:n_scan]
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.cloud_rgb)[:n_ref], np.asarray(s_scan.cloud_rgb)[:n_scan]
    )


def test_beautify_cloud_chain(rng):
    """Epilogue chain (main.cpp:1340-1404): bbox gate + SOR + surface
    filter remove far fuzz, densification adds points on surfaces, and
    every output point carries a unit normal."""
    # A dense plane (surface, spacing << densify max_gap) + far outliers
    n_plane = 1200
    plane = np.concatenate(
        [rng.uniform(-0.5, 0.5, (n_plane, 2)), np.zeros((n_plane, 1))], -1
    ).astype(np.float32)
    outliers = rng.uniform(20, 30, (20, 3)).astype(np.float32)
    pts = np.concatenate([plane, outliers])
    traj = np.array([[0.0, 0.0, 1.0], [0.5, 0.0, 1.0]], np.float32)

    out, normals = pc.beautify_cloud(pts, np.ones(len(pts), bool), traj=traj)
    assert len(out) > 0.7 * n_plane, "surface points must survive"
    # bbox gate (±3 m of the trajectory) kills the 20+ m outliers
    assert np.abs(out).max() < 5.0
    # densification added points beyond the filtered survivors
    assert len(out) > n_plane, len(out)
    assert normals.shape == out.shape
    nn = np.linalg.norm(normals, axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-3)
    # plane normals point along z
    assert np.abs(normals[:, 2]).mean() > 0.95


def test_insert_capacity_drop_and_order():
    """The sort-compacted block append must match per-point sequential
    semantics exactly: winners kept in insertion order, inserts dropped
    once the reported capacity fills, voxels still claimed by dropped
    points (reference drops silently too once memory-bound)."""
    state = gridhash.init_dense_map(1 << 14, 8)  # capacity 8
    pts = np.stack(
        [np.arange(12, dtype=np.float32) * 0.1 + 0.05,
         np.zeros(12, np.float32), np.zeros(12, np.float32)], -1
    )  # 12 distinct 2cm voxels, insertion order = index order
    cols = np.tile(np.arange(12, dtype=np.uint8)[:, None], (1, 3))
    insert = jax.jit(gridhash.insert_points)
    s1 = insert(state, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(12, bool))
    assert int(s1.cloud_count) == 8  # clamped at capacity
    np.testing.assert_allclose(np.asarray(s1.cloud_xyz)[:8], pts[:8])
    np.testing.assert_array_equal(np.asarray(s1.cloud_rgb)[:8], cols[:8])
    # dropped points 8..11 still claimed their voxels: re-offering them
    # (or new points in those voxels) adds nothing
    s2 = insert(s1, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(12, bool))
    assert int(s2.cloud_count) == 8
    np.testing.assert_allclose(np.asarray(s2.cloud_xyz)[:8], pts[:8])
