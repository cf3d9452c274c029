import jax
import numpy as np

from vslam_tpu.io import feature_cache as fc
from vslam_tpu.io import ply, trajectory


def test_trajectory_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 10
    ts = np.arange(n) * 0.1 + 100.0
    pos = rng.normal(size=(n, 3))
    R = Rotation.random(n, random_state=3).as_matrix()

    p1 = tmp_path / "traj.txt"
    trajectory.save_trajectory(p1, ts, pos)
    ts2, pos2, q = trajectory.load_trajectory(p1)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(pos2, pos, atol=1e-5)
    # Positions-only export writes full 8-column TUM lines with identity
    # quaternion (main.cpp:391-401) so standard TUM tools accept the file.
    np.testing.assert_allclose(q, np.tile([0, 0, 0, 1], (n, 1)), atol=0)

    p2 = tmp_path / "traj_full.txt"
    trajectory.save_trajectory_full(p2, ts, R, pos)
    ts3, pos3, q3 = trajectory.load_trajectory(p2)
    assert q3.shape == (n, 4)
    # quaternions reconstruct the rotations
    R3 = Rotation.from_quat(q3).as_matrix()
    err = np.abs(R3 - R).max()
    assert err < 1e-4


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = (rng.random((50, 3)) * 255).astype(np.uint8)
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    p = tmp_path / "c.ply"
    ply.save_ply(p, pts, colors=cols, normals=nrm)
    back = ply.load_ply(p)
    np.testing.assert_allclose(back["points"], pts, atol=1e-6)
    np.testing.assert_array_equal(back["colors"], cols)
    np.testing.assert_allclose(back["normals"], nrm, atol=1e-6)


def test_ply_roundtrip_ascii_with_faces(tmp_path, rng):
    pts = rng.normal(size=(9, 3)).astype(np.float32)
    faces = [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    p = tmp_path / "m.ply"
    ply.save_ply(p, pts, faces=faces, ascii=True)
    back = ply.load_ply(p)
    np.testing.assert_allclose(back["points"], pts, atol=1e-5)
    assert back["faces"] == faces


def test_spcf_roundtrip(tmp_path, rng):
    cache = {}
    for i in [0, 2, 5]:
        n = int(rng.integers(3, 20))
        cache[i] = fc.CachedFeatures(
            rng.random((n, 2)).astype(np.float32) * 640,
            rng.random(n).astype(np.float32),
            rng.normal(size=(n, 256)).astype(np.float32),
        )
    p = tmp_path / "sp_cache.bin"
    fc.save_spcf(p, cache)
    back = fc.load_spcf(p)
    assert sorted(back) == [0, 2, 5]
    for i in cache:
        np.testing.assert_allclose(back[i].xy, cache[i].xy, atol=1e-6)
        np.testing.assert_allclose(back[i].desc, cache[i].desc, atol=1e-6)


def test_padded_conversion(rng):
    cache = {
        0: fc.CachedFeatures(
            rng.random((5, 2)).astype(np.float32),
            rng.random(5).astype(np.float32),
            rng.normal(size=(5, 16)).astype(np.float32),
        ),
        1: fc.CachedFeatures(
            rng.random((3, 2)).astype(np.float32),
            rng.random(3).astype(np.float32),
            rng.normal(size=(3, 16)).astype(np.float32),
        ),
    }
    xy, score, desc, valid, ids = fc.to_padded(cache, max_keypoints=8, desc_dim=16)
    assert xy.shape == (2, 8, 2) and valid.sum() == 8
    back = fc.from_padded(xy, score, desc, valid, ids)
    np.testing.assert_allclose(back[1].desc, cache[1].desc, atol=1e-6)


def test_checkpoint_resume_roundtrip(tmp_path):
    """Resume mid-sequence from a checkpoint: identical trajectory tail."""
    from vslam_tpu.config import tiny_test_config
    from vslam_tpu.core import pipeline
    from vslam_tpu.data import synthetic
    from vslam_tpu.io import checkpoint as ckpt

    cfg = tiny_test_config()
    c = cfg.camera
    seq = synthetic.make_sequence(
        num_frames=16, max_keypoints=cfg.frontend.max_keypoints,
        desc_dim=cfg.frontend.descriptor_dim,
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        seed=3, num_landmarks=800,
    )
    frames = pipeline.features_from_synthetic(seq)

    # Full run
    full = pipeline.run_tracking(frames, cfg, smooth=False)

    # Split run: first 8 frames, checkpoint, resume for the rest
    first = jax.tree.map(lambda a: a[:8], frames)
    second = jax.tree.map(lambda a: a[8:], frames)
    r1 = pipeline.run_tracking(first, cfg, smooth=False)
    p = tmp_path / "state.npz"
    ckpt.save_state(p, r1.final_state, {"frames_done": 8})
    restored, meta = ckpt.load_state(p, cfg)
    assert meta["frames_done"] == 8
    r2 = pipeline.run_tracking(second, cfg, state=restored, smooth=False)

    np.testing.assert_allclose(r2.t, full.t[8:], atol=1e-4)

