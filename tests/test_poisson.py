"""Native Poisson surface reconstruction (ops/poisson.py).

Replaces the reference's shell-out to PoissonRecon + SurfaceTrimmer
(`/root/reference/src/main.cpp:1406-1458`), so the tests pin the same
contract those binaries provided: a faithful surface where data exists,
and the density trim removing hallucinated closure membranes where it
does not.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vslam_tpu.ops import poisson

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def _sphere(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


def test_tet_tables_are_consistent():
    # Every non-trivial case emits 1 or 2 triangles; every referenced edge
    # crosses the surface (its two endpoints have different inside flags).
    for case in range(16):
        ntri = int(poisson._NTRI[case])
        n_inside = bin(case).count("1")
        assert ntri == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}[n_inside]
        for t in range(ntri):
            for e in poisson._TRI_EDGES[case, t]:
                a, b = poisson._EDGE_PAIRS[e]
                assert ((case >> a) & 1) != ((case >> b) & 1)
    # The 6 tets partition the cube: volumes sum to 1.
    corners = poisson._CORNER_OFF.astype(np.float64)
    vol = 0.0
    for tet in poisson._TETS:
        p = corners[tet]
        vol += abs(np.linalg.det(p[1:] - p[0])) / 6.0
    assert abs(vol - 1.0) < 1e-12


def test_sphere_reconstruction_accuracy():
    pts = _sphere(4000)
    verts, faces = poisson.poisson_mesh(
        pts, pts, resolution=48, tet_capacity=32768
    )
    assert len(verts) > 2000 and len(faces) > 4000
    r = np.linalg.norm(verts, axis=1)
    rms = np.sqrt(np.mean((r - 1.0) ** 2))
    assert rms < 0.02, rms
    assert r.min() > 0.9 and r.max() < 1.1
    # Faces index the welded vertex array.
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_density_trim_removes_hallucinated_closure():
    # An upper spherical cap: the global solve closes the bottom with a
    # membrane no data supports; the SurfaceTrimmer-equivalent density
    # trim must remove it (`main.cpp:1420-1422` --trim 8 intent).
    v = _sphere(8000)
    v = v[v[:, 2] > 0.15][:2000]
    verts_u, faces_u = poisson.poisson_mesh(
        v, v, resolution=48, tet_capacity=32768, trim_frac=0.0
    )
    verts_t, faces_t = poisson.poisson_mesh(
        v, v, resolution=48, tet_capacity=32768, trim_frac=0.08
    )
    assert verts_u[:, 2].min() < -0.1  # hallucinated closure present
    assert verts_t[:, 2].min() > -0.05  # trimmed away
    assert len(faces_t) < len(faces_u)
    r = np.linalg.norm(verts_t, axis=1)
    assert np.sqrt(np.mean((r - 1.0) ** 2)) < 0.03


def test_reconstruct_reports_overflow_and_masks():
    pts = _sphere(1000)
    out = poisson.reconstruct(
        jnp.asarray(pts),
        jnp.ones(len(pts), bool),
        jnp.asarray(pts),
        jnp.asarray([-1.5, -1.5, -1.5], jnp.float32),
        jnp.float32(3.0 / 31),
        resolution=32,
        tet_capacity=256,  # deliberately too small
    )
    n_active = int(out["n_active_tets"])
    assert n_active > 256  # surface crosses more tets than capacity
    # All capacity slots hold real surface tets (compaction fills front).
    assert int(jnp.sum(out["tri_valid_untrimmed"])) > 256
    # Trimmed mask is a subset of untrimmed.
    assert bool(
        jnp.all(~out["tri_valid"] | out["tri_valid_untrimmed"])
    )


def test_masked_invalid_points_are_ignored():
    pts = _sphere(2000)
    junk = np.full((500, 3), 50.0, np.float32)  # far away, masked out
    allpts = np.concatenate([pts, junk])
    nrm = np.concatenate([pts, np.tile([0, 0, 1.0], (500, 1))]).astype(np.float32)
    valid = np.concatenate([np.ones(2000, bool), np.zeros(500, bool)])
    verts, faces = poisson.poisson_mesh(
        allpts, nrm, valid=valid, resolution=40, tet_capacity=32768
    )
    r = np.linalg.norm(verts, axis=1)
    assert np.sqrt(np.mean((r - 1.0) ** 2)) < 0.03
    assert r.max() < 1.2  # nothing reconstructed near the junk


def test_ply_mesh_roundtrip(tmp_path):
    from vslam_tpu.io import ply

    pts = _sphere(1500)
    verts, faces = poisson.poisson_mesh(pts, pts, resolution=32, tet_capacity=16384)
    path = str(tmp_path / "mesh.ply")
    ply.save_ply(path, verts, faces=faces)
    back = ply.load_ply(path)
    np.testing.assert_allclose(back["points"], verts, atol=1e-6)
    assert len(back["faces"]) == len(faces)
    np.testing.assert_array_equal(np.asarray(back["faces"]), faces)
