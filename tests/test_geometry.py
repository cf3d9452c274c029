"""Geometry kernels vs closed-form synthetic ground truth and OpenCV oracles."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from vslam_tpu.ops import camera as cam
from vslam_tpu.ops import epipolar as epi
from vslam_tpu.ops import kabsch as kb
from vslam_tpu.ops import ransac as rs
from vslam_tpu.ops import triangulate as tri
from vslam_tpu.ops import pnp as pnp_ops

FX = FY = 525.0
CX, CY = 319.5, 239.5


def make_scene(rng, n=200, noise=0.0, baseline=1.0):
    """Random 3D points in front of two cameras with known relative pose.

    `baseline` scales the translation: E-matrix tests need a wide baseline
    (narrow ones are genuinely ill-conditioned — which is why the reference
    prefers the 3D-3D path for consecutive frames, `src/Slam.cpp:955`).
    """
    X = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(2.0, 8.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    R = Rotation.from_rotvec([0.03, -0.08, 0.02]).as_matrix().astype(np.float32)
    t = (np.array([0.12, -0.05, 0.08], dtype=np.float32) * baseline).astype(np.float32)
    X2 = X @ R.T + t  # cam2 frame: x2 = R x1 + t
    uv1 = np.stack([FX * X[:, 0] / X[:, 2] + CX, FY * X[:, 1] / X[:, 2] + CY], -1)
    uv2 = np.stack([FX * X2[:, 0] / X2[:, 2] + CX, FY * X2[:, 1] / X2[:, 2] + CY], -1)
    if noise:
        uv1 += rng.normal(0, noise, uv1.shape)
        uv2 += rng.normal(0, noise, uv2.shape)
    return X, X2, R, t, uv1.astype(np.float32), uv2.astype(np.float32)


def test_project_backproject_roundtrip(rng):
    X = rng.uniform(0.5, 5.0, (100, 3)).astype(np.float32)
    uv, ok = cam.project(jnp.asarray(X), FX, FY, CX, CY)
    assert bool(jnp.all(ok))
    X2 = cam.backproject(uv, jnp.asarray(X[:, 2]), FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(X2), X, rtol=1e-5)


def test_kabsch_exact(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    R_gt = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    t_gt = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    dst = src @ R_gt.T + t_gt
    R, t, s = kb.kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)


def test_kabsch_weighted_ignores_outliers(rng):
    src = rng.normal(size=(60, 3)).astype(np.float32)
    R_gt = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix().astype(np.float32)
    t_gt = np.array([0.1, 0.0, -0.3], dtype=np.float32)
    dst = src @ R_gt.T + t_gt
    dst[:10] += 5.0  # outliers
    w = np.ones(60, dtype=np.float32)
    w[:10] = 0.0
    R, t, _ = kb.kabsch(jnp.asarray(src), jnp.asarray(dst), weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)


def test_umeyama_scale(rng):
    src = rng.normal(size=(40, 3)).astype(np.float32)
    R_gt = Rotation.from_rotvec([0.3, -0.1, 0.2]).as_matrix().astype(np.float32)
    dst = 2.5 * src @ R_gt.T + np.array([1.0, 2.0, 3.0], dtype=np.float32)
    R, t, s = kb.kabsch(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
    np.testing.assert_allclose(float(s), 2.5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)


def test_triangulate_exact(rng):
    X, X2, R, t, uv1, uv2 = make_scene(rng)
    # Pose convention: cam1 = world (identity); cam2 pose (cam-to-world) is
    # inverse of (R, t).
    R1 = jnp.eye(3)
    t1 = jnp.zeros(3)
    R2 = jnp.asarray(R.T)
    t2 = jnp.asarray(-R.T @ t)
    Xh, valid = tri.triangulate_two_view(
        R1, t1, R2, t2, jnp.asarray(uv1), jnp.asarray(uv2), FX, FY, CX, CY,
        max_cam_dist=50.0,
    )
    v = np.asarray(valid)
    assert v.mean() > 0.95
    np.testing.assert_allclose(np.asarray(Xh)[v], X[v], atol=2e-2)


def test_triangulate_matches_opencv(rng):
    import cv2

    X, X2, R, t, uv1, uv2 = make_scene(rng, noise=0.5)
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    Xcv = cv2.triangulatePoints(P1, P2, uv1.T.astype(np.float64), uv2.T.astype(np.float64))
    Xcv = (Xcv[:3] / Xcv[3]).T
    Xj = tri.triangulate_dlt(jnp.asarray(P1, dtype=jnp.float32), jnp.asarray(P2, dtype=jnp.float32), jnp.asarray(uv1), jnp.asarray(uv2))
    np.testing.assert_allclose(np.asarray(Xj), Xcv, atol=2e-2)


def test_eight_point_fundamental_vs_opencv(rng):
    import cv2

    X, X2, R, t, uv1, uv2 = make_scene(rng, n=100)
    F = epi.eight_point(jnp.asarray(uv1), jnp.asarray(uv2))
    d = np.asarray(epi.sampson_distance(F, jnp.asarray(uv1), jnp.asarray(uv2)))
    assert d.mean() < 1e-2  # noiseless: near-exact epipolar fit
    # Same residual magnitude as OpenCV's 8-point
    Fcv, _ = cv2.findFundamentalMat(uv1, uv2, cv2.FM_8POINT)
    dcv = np.asarray(
        epi.sampson_distance(jnp.asarray(Fcv, dtype=jnp.float32), jnp.asarray(uv1), jnp.asarray(uv2))
    )
    assert d.mean() < dcv.mean() + 1e-2


def test_essential_recover_pose(rng):
    X, X2, R_gt, t_gt, uv1, uv2 = make_scene(rng, n=150, baseline=5.0)
    xn1 = cam.normalize_pixels(jnp.asarray(uv1), FX, FY, CX, CY)
    xn2 = cam.normalize_pixels(jnp.asarray(uv2), FX, FY, CX, CY)
    E = epi.eight_point(xn1, xn2, essential=True)
    R, t, n_good, good = epi.recover_pose(E, jnp.asarray(uv1), jnp.asarray(uv2), FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)
    t_dir = np.asarray(t)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    np.testing.assert_allclose(t_dir, t_gt_dir, atol=1e-3)
    assert int(n_good) > 140


def test_ransac_kabsch_with_outliers(rng):
    n = 120
    src = rng.normal(size=(n, 3)).astype(np.float32) * 2
    R_gt = Rotation.from_rotvec([0.05, -0.02, 0.03]).as_matrix().astype(np.float32)
    t_gt = np.array([0.05, 0.08, -0.04], dtype=np.float32)
    dst = src @ R_gt.T + t_gt
    out = rng.random(n) < 0.3
    dst[out] += rng.normal(0, 1.0, (out.sum(), 3))
    valid = np.ones(n, dtype=bool)
    key = jax.random.PRNGKey(0)
    R, t, res = rs.ransac_kabsch_3d3d(
        key, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid),
        num_hypotheses=128, inlier_thresh=0.05, max_translation=0.2,
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-3)
    # inliers found ≈ non-outliers
    assert int(res.num_inliers) > 0.9 * (~out).sum()


def test_ransac_essential_with_outliers(rng):
    X, X2, R_gt, t_gt, uv1, uv2 = make_scene(rng, n=200, noise=0.3, baseline=5.0)
    out = rng.random(200) < 0.25
    uv2[out] += rng.uniform(-80, 80, (out.sum(), 2))
    key = jax.random.PRNGKey(1)
    R, t, E, res = rs.ransac_essential(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(200, dtype=bool),
        FX, FY, CX, CY, num_hypotheses=256, threshold_px=1.5,
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=2e-2)
    t_dir = np.asarray(t)
    np.testing.assert_allclose(t_dir, t_gt / np.linalg.norm(t_gt), atol=5e-2)


def test_ransac_fundamental_gates_outliers(rng):
    X, X2, R_gt, t_gt, uv1, uv2 = make_scene(rng, n=150, noise=0.3)
    out = rng.random(150) < 0.3
    uv2[out] += rng.uniform(30, 100, (out.sum(), 2)) * np.sign(rng.normal(size=(out.sum(), 2)))
    key = jax.random.PRNGKey(2)
    F, res = rs.ransac_fundamental(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(150, dtype=bool),
        num_hypotheses=256, threshold_px=3.0,
    )
    inl = np.asarray(res.inlier_mask)
    # inliers should be mostly true correspondences
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.2


def test_pnp_vs_opencv(rng):
    import cv2

    X, X2, R_rel, t_rel, uv1, uv2 = make_scene(rng, n=100, noise=0.3)
    # Camera 2 observes world points X (world = cam1 frame).
    key = jax.random.PRNGKey(3)
    result = pnp_ops.ransac_pnp(
        key, jnp.asarray(X), jnp.asarray(uv2), jnp.ones(100, dtype=bool),
        FX, FY, CX, CY, num_hypotheses=128, threshold_px=4.0,
    )
    assert bool(result.ok)
    # Ours: camera-to-world; OpenCV: world-to-camera rvec/tvec.
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        X.astype(np.float64), uv2.astype(np.float64), K, None,
        reprojectionError=4.0, iterationsCount=200,
    )
    R_cv = cv2.Rodrigues(rvec)[0]
    R_cw = np.asarray(result.R).T
    t_cw = -R_cw @ np.asarray(result.t)
    np.testing.assert_allclose(R_cw, R_cv, atol=5e-3)
    np.testing.assert_allclose(t_cw, tvec[:, 0], atol=2e-2)


def test_pnp_with_outliers(rng):
    X, X2, R_rel, t_rel, uv1, uv2 = make_scene(rng, n=150, noise=0.3)
    out = rng.random(150) < 0.3
    uv2[out] += rng.uniform(-120, 120, (out.sum(), 2))
    key = jax.random.PRNGKey(4)
    result = pnp_ops.ransac_pnp(
        key, jnp.asarray(X), jnp.asarray(uv2), jnp.ones(150, dtype=bool),
        FX, FY, CX, CY, num_hypotheses=256, threshold_px=6.0,
    )
    assert bool(result.ok)
    R_cw = np.asarray(result.R).T
    t_cw = -R_cw @ np.asarray(result.t)
    np.testing.assert_allclose(R_cw, R_rel, atol=1e-2)
    np.testing.assert_allclose(t_cw, t_rel, atol=3e-2)


def test_essential_sampson_polish_improves_rotation(rng):
    """The GN Sampson polish (`epipolar.refine_pose_sampson`, NEW vs the
    reference's algebraic-only `cv::findEssentialMat`) must reduce mean
    rotation error on noisy two-view geometry and stay exact on clean."""
    def rot_err(R, R_gt):
        c = (np.trace(np.asarray(R) @ R_gt.T) - 1) / 2
        return float(np.degrees(np.arccos(np.clip(c, -1, 1))))

    errs = {0: [], 8: []}
    for seed in range(6):
        r = np.random.default_rng(seed)
        X, X2, R_gt, t_gt, uv1, uv2 = make_scene(r, n=200, noise=0.7, baseline=5.0)
        for iters in (0, 8):
            R, t, _, res = rs.ransac_essential(
                jax.random.PRNGKey(seed), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.ones(200, dtype=bool), FX, FY, CX, CY,
                num_hypotheses=256, threshold_px=1.5, polish_iters=iters,
            )
            assert bool(res.ok)
            errs[iters].append(rot_err(R, R_gt))
    assert np.mean(errs[8]) < 0.75 * np.mean(errs[0]), errs

    # Clean geometry: the polish must not perturb an exact solution.
    r = np.random.default_rng(99)
    X, X2, R_gt, t_gt, uv1, uv2 = make_scene(r, n=200, noise=0.0, baseline=5.0)
    R, t, _, res = rs.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(200, dtype=bool), FX, FY, CX, CY,
        num_hypotheses=256, threshold_px=1.5, polish_iters=8,
    )
    assert rot_err(R, R_gt) < 5e-3
