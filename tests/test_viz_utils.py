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
