"""Frontend decode parity: the reference's greedy score-sorted NMS
(`/root/reference/src/FeatureExtractor.cpp:219-259`) as a NumPy oracle,
pinning the window-max NMS semantics, plus reference-format SPCF cache
replay through the app's frontend path."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import nms


def greedy_nms_oracle(heat, radius=4, conf=0.005, max_keypoints=10**9):
    """Faithful NumPy port of the reference greedy NMS semantics: collect
    above-threshold pixels, sort by score descending (ties toward the
    earlier row-major pixel, matching our device tiebreak), accept each
    unsuppressed candidate and suppress its (2r+1)^2 window."""
    H, W = heat.shape
    ys, xs = np.nonzero(heat > conf)
    scores = heat[ys, xs]
    order = np.lexsort((ys * W + xs, -scores))
    suppressed = np.zeros((H, W), bool)
    keeps = []
    for i in order:
        if len(keeps) >= max_keypoints:
            break
        y, x = ys[i], xs[i]
        if suppressed[y, x]:
            continue
        keeps.append((x, y, scores[i]))
        y0, y1 = max(y - radius, 0), min(y + radius + 1, H)
        x0, x1 = max(x - radius, 0), min(x + radius + 1, W)
        suppressed[y0:y1, x0:x1] = True
    return keeps


def _window_keeps(heat, radius=4, conf=0.005):
    kept = np.asarray(nms.nms_local_max(jnp.asarray(heat)[None], radius, conf))[0]
    ys, xs = np.nonzero(kept > 0)
    return {(int(x), int(y)) for x, y in zip(xs, ys)}


def _heatmaps(rng):
    """Random + structured (plateaus, Gaussian blobs) test heatmaps."""
    hs = []
    # sparse random
    h = np.zeros((120, 160), np.float32)
    n = 300
    ys = rng.integers(0, 120, n)
    xs = rng.integers(0, 160, n)
    h[ys, xs] = rng.random(n).astype(np.float32)
    hs.append(h)
    # dense random noise
    hs.append(rng.random((96, 128)).astype(np.float32) * 0.5)
    # plateaus (exact ties) + isolated spikes
    h = np.zeros((96, 128), np.float32)
    h[10:14, 10:14] = 0.7
    h[40:43, 60:63] = 0.3
    h[80, 100] = 0.9
    h[20, 90] = 0.9
    hs.append(h)
    # smooth Gaussian blobs
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    h = np.zeros((96, 128), np.float32)
    for cy, cx, s in [(20, 30, 4.0), (60, 90, 6.0), (25, 36, 3.0), (70, 20, 5.0)]:
        h += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)).astype(np.float32)
    hs.append(h / h.max())
    return hs


def test_window_nms_keeps_subset_of_greedy():
    """`ops/nms.py` claims window-max keeps are a strict subset of greedy's
    keeps — assert it on random and structured heatmaps."""
    rng = np.random.default_rng(0)
    for h in _heatmaps(rng):
        win = _window_keeps(h)
        greedy = {(x, y) for x, y, _ in greedy_nms_oracle(h)}
        assert win, "window NMS kept nothing"
        extra = win - greedy
        assert not extra, f"window-NMS keeps not in greedy keeps: {sorted(extra)[:5]}"


def test_window_nms_topk_agrees_with_greedy():
    """>=95% of the top-400 keypoints agree with the greedy oracle's
    top-400 on SuperPoint-shaped heatmaps."""
    rng = np.random.default_rng(1)
    for h in _heatmaps(rng):
        kps = nms.topk_keypoints(
            nms.nms_local_max(jnp.asarray(h)[None], 4, 0.005), max_keypoints=400
        )
        ours = {
            (int(x), int(y))
            for (x, y), v in zip(np.asarray(kps.xy[0]), np.asarray(kps.valid[0]))
            if v
        }
        greedy = {(x, y) for x, y, _ in greedy_nms_oracle(h, max_keypoints=400)}
        if not ours:
            continue
        overlap = len(ours & greedy) / len(ours)
        assert overlap >= 0.95, f"top-400 agreement {overlap:.2%}"


def test_spcf_cache_replay_through_frontend_path(tmp_path):
    """A reference-byte-format SPCF `.bin` cache written at frame-step 1
    replays through `extract_sequence` (the app's frontend path,
    `examples/run_tum.py`) at frame-step 2 — features land on the right
    frames and keypoint depth is sampled from the depth maps
    (`src/main.cpp:1048-1051` + `FeatureExtractor.cpp:262-322`)."""
    import jax

    from vslam_tpu.config import tiny_test_config
    from vslam_tpu.core import frontend as fe
    from vslam_tpu.io import feature_cache as fc

    cfg = tiny_test_config()
    K, D = cfg.frontend.max_keypoints, cfg.frontend.descriptor_dim
    H, W = cfg.camera.height, cfg.camera.width
    rng = np.random.default_rng(0)
    N = 8

    # Known per-frame features, written in the reference's SPCF byte layout
    # keyed by dataset frame id.
    cache = {}
    for fid in range(N):
        n = int(rng.integers(10, K))
        xy = np.stack(
            [rng.uniform(0, W - 1, n), rng.uniform(0, H - 1, n)], -1
        ).astype(np.float32)
        desc = rng.normal(size=(n, D)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        cache[fid] = fc.CachedFeatures(xy, rng.random(n).astype(np.float32), desc)
    bin_path = str(tmp_path / "sp_cache.bin")
    fc.save_spcf(bin_path, cache)

    # Replay every 2nd frame through the app frontend path with depth maps.
    idxs = np.arange(0, N, 2)
    grays = rng.random((len(idxs), H, W)).astype(np.float32)
    depths = rng.uniform(0.5, 4.0, (len(idxs), H, W)).astype(np.float32)
    stamps = idxs.astype(np.float64) * 0.1
    front = fe.make_frontend(cfg)
    frames = fe.extract_sequence(
        front, grays, depths, stamps, cache_path=bin_path, frame_indices=idxs
    )

    for row, fid in enumerate(idxs):
        cf = cache[fid]
        n = len(cf.xy)
        np.testing.assert_allclose(
            np.asarray(frames.xy[row, :n]), cf.xy, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(frames.desc[row, :n]), cf.desc, atol=1e-5
        )
        assert bool(np.asarray(frames.valid[row, :n]).all())
        assert not bool(np.asarray(frames.valid[row, n:]).any())
        # depth sampled at the nearest pixel of each keypoint
        u = np.clip(np.round(cf.xy[:, 0]).astype(int), 0, W - 1)
        v = np.clip(np.round(cf.xy[:, 1]).astype(int), 0, H - 1)
        np.testing.assert_allclose(
            np.asarray(frames.depth[row, :n]), depths[row, v, u], atol=1e-6
        )


def test_subpixel_refinement_recovers_true_peak():
    """A Gaussian peak centered off-pixel: quadratic refinement must move
    the integer argmax toward the true center (and never move a keypoint
    more than half a pixel)."""
    import jax.numpy as jnp

    from vslam_tpu.ops import nms

    H, W = 64, 64
    vs, us = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    err_int = []
    err_sub = []
    # Peaks whose argmax pixel is INTERIOR to an 8x8 softmax cell
    # (x%8, y%8 in 1..6) — the only place refinement is licensed.
    for cx_t, cy_t in [(20.3, 29.6), (41.4, 10.2), (12.7, 51.8)]:
        heat = np.exp(
            -((us - cx_t) ** 2 + (vs - cy_t) ** 2) / (2 * 1.2**2)
        ).astype(np.float32)
        hj = jnp.asarray(heat)[None]
        kps = nms.topk_keypoints(nms.nms_local_max(hj, 4, 0.005), max_keypoints=4)
        ref = nms.refine_subpixel(hj, kps)
        xy_i = np.asarray(kps.xy[0, 0])
        xy_s = np.asarray(ref.xy[0, 0])
        assert np.all(np.abs(xy_s - xy_i) <= 0.5 + 1e-6)
        err_int.append(np.linalg.norm(xy_i - [cx_t, cy_t]))
        err_sub.append(np.linalg.norm(xy_s - [cx_t, cy_t]))
    # Refinement cuts localization error decisively on average.
    assert np.mean(err_sub) < 0.5 * np.mean(err_int), (err_int, err_sub)
    # Invalid keypoints are untouched.
    assert np.allclose(
        np.asarray(ref.xy[0])[~np.asarray(kps.valid[0])],
        np.asarray(kps.xy[0])[~np.asarray(kps.valid[0])],
    )
    # A peak whose pixel sits on a cell boundary (x%8 == 0) must NOT be
    # refined: its neighbors live in a differently-normalized softmax
    # cell, so the parabola is meaningless there.
    heat = np.exp(
        -((us - 40.4) ** 2 + (vs - 29.6) ** 2) / (2 * 1.2**2)
    ).astype(np.float32)
    hj = jnp.asarray(heat)[None]
    kps = nms.topk_keypoints(nms.nms_local_max(hj, 4, 0.005), max_keypoints=4)
    ref = nms.refine_subpixel(hj, kps)
    assert np.asarray(kps.xy[0, 0, 0]) % 8 == 0  # argmax on the boundary
    np.testing.assert_array_equal(np.asarray(ref.xy[0, 0]), np.asarray(kps.xy[0, 0]))
