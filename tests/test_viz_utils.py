import numpy as np

from vslam_tpu.viz import hud


def test_annotate_and_match_images(rng):
    g1 = rng.random((60, 80)).astype(np.float32)
    g2 = rng.random((60, 80)).astype(np.float32)
    xy1 = rng.uniform(0, 79, (20, 2)).astype(np.float32)
    xy2 = rng.uniform(0, 79, (20, 2)).astype(np.float32)
    idx = rng.integers(0, 20, 20).astype(np.int32)
    mask = rng.random(20) > 0.5

    img = hud.annotate_frame(g1, xy1, np.ones(20, bool), mask)
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8

    m = hud.match_image(g1, g2, xy1, xy2, idx, mask)
    assert m.shape == (60, 160, 3)

    ba = hud.before_after(g1, g2, xy1, xy2, idx, np.ones(20, bool), mask)
    assert ba.shape == (120, 160, 3)
    # the gated (bottom) half should have no more green than raw lines drawn
    assert (ba[:60] != 0).any() and (ba[60:] != 0).any()


def test_web_viewer_export_roundtrip(tmp_path, rng):
    """The interactive HTML viewer embeds all scene data losslessly
    (base64 typed arrays) and carries the full Pangolin UI-panel surface
    (src/Viewer.cpp:60-66)."""
    import base64
    import json
    import re

    from vslam_tpu.viz import web

    N = 12
    traj = rng.normal(size=(N, 3)).astype(np.float32)
    gtt = traj + 0.01
    kf_t = traj[::4]
    kf_R = np.stack([np.eye(3, dtype=np.float32)] * len(kf_t))
    sparse = rng.normal(size=(40, 3)).astype(np.float32)
    dense = rng.normal(size=(70, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (70, 3)).astype(np.uint8)
    loops = [(traj[0], traj[9])]
    hud_lines = [[f"frame {i}", "matches 10"] for i in range(N)]

    out = str(tmp_path / "viewer.html")
    p = web.export_web_viewer(
        out, traj, gt_trajectory=gtt, kf_R=kf_R, kf_t=kf_t,
        sparse_xyz=sparse, dense_xyz=dense, dense_rgb=rgb,
        loop_edges=loops, hud_lines=hud_lines,
        timestamps=np.arange(N, dtype=np.float32),
    )
    html = open(p).read()
    # One self-contained file: no external scripts/stylesheets.
    assert "http://" not in html and "https://" not in html
    # The reference's UI panel buttons all exist.
    for b in ["Follow Camera", "Top View", "Side View", "Reset View",
              "Show Dense", "Show Sparse", "Restart"]:
        assert b in html, b
    # Embedded data decodes back bit-exactly.
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html).group(1))
    dec = lambda k, dt: np.frombuffer(base64.b64decode(data[k]), dt)  # noqa: E731
    np.testing.assert_array_equal(dec("traj", np.float32).reshape(N, 3), traj)
    np.testing.assert_array_equal(dec("gt", np.float32).reshape(-1, 3), gtt)
    np.testing.assert_array_equal(dec("sp", np.float32).reshape(-1, 3), sparse)
    np.testing.assert_array_equal(dec("dn", np.float32).reshape(-1, 3), dense)
    np.testing.assert_array_equal(dec("dnc", np.uint8).reshape(-1, 3), rgb)
    le = dec("loops", np.float32).reshape(-1, 6)
    np.testing.assert_array_equal(le[0, :3], traj[0])
    np.testing.assert_array_equal(le[0, 3:], traj[9])
    assert data["hud"][3] == ["frame 3", "matches 10"]
    # Point cap subsamples instead of dropping (no silent truncation of
    # semantics): request a tiny cap and check counts.
    p2 = web.export_web_viewer(
        str(tmp_path / "small.html"), traj, dense_xyz=dense, dense_rgb=rgb,
        max_points=16,
    )
    d2 = json.loads(re.search(r"const DATA = (\{.*?\});\n", open(p2).read()).group(1))
    assert d2["dnn"] == 16


def test_profiling_utils():
    import jax

    from vslam_tpu.utils import profiling

    timer = profiling.StageTimer()
    with timer.stage("noop") as box:
        box["result"] = jax.numpy.ones(8)
    rep = timer.report()
    assert "noop" in rep

    class FakeOuts:
        num_matches = np.array([10, 20])
        num_inliers = np.array([8, 15])
        num_tracked = np.array([5, 12])
        is_keyframe = np.array([True, False])
        used_3d3d = np.array([True, True])
        tracking_ok = np.array([True, True])

    rows = profiling.step_metrics_log(FakeOuts())
    assert len(rows) == 2 and rows[1]["matches"] == 20
    s = profiling.summarize_run(FakeOuts())
    assert s["keyframes"] == 1

    class FakeOutsEpi(FakeOuts):
        # F-gate ran only on frame 1: the 0.0 placeholder (gate off /
        # no model / bootstrap) must not dilute the reported means.
        epi_before = np.array([0.0, 2.0])
        epi_after = np.array([0.0, 0.5])

    s2 = profiling.summarize_run(FakeOutsEpi())
    assert s2["fgate_frames"] == 1
    assert s2["epi_before_mean_px"] == 2.0
    assert s2["epi_after_mean_px"] == 0.5
