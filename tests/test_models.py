"""SuperPoint / MiDaS / ORB model-level tests (weight-agnostic)."""

import numpy as np
import jax
import jax.numpy as jnp

from vslam_tpu.data import synthetic
from vslam_tpu.models import midas, superpoint as sp
from vslam_tpu.ops import matching, nms, orb

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`


def test_superpoint_shapes_and_decode():
    params = sp.init_params(jax.random.PRNGKey(0), height=120, width=160)
    model = sp.SuperPoint()
    img = jnp.asarray(
        np.random.default_rng(0).random((2, 120, 160, 1)), jnp.float32
    )
    semi, desc_c = model.apply(params, img)
    assert semi.shape == (2, 15, 20, 65)
    assert desc_c.shape == (2, 15, 20, 256)
    kps, desc = nms.extract_keypoints(semi, desc_c, max_keypoints=64)
    assert kps.xy.shape == (2, 64, 2)
    assert desc.shape == (2, 64, 256)
    # descriptors unit-norm where valid
    n = np.linalg.norm(np.asarray(desc), axis=-1)
    v = np.asarray(kps.valid)
    if v.any():
        np.testing.assert_allclose(n[v], 1.0, atol=1e-3)


def test_nms_decode_heatmap_softmax():
    rng = np.random.default_rng(0)
    semi = jnp.asarray(rng.normal(size=(1, 4, 5, 65)).astype(np.float32))
    heat = np.asarray(nms.decode_heatmap(semi))
    assert heat.shape == (1, 32, 40)
    assert heat.min() >= 0 and heat.max() <= 1


def test_nms_local_max_selects_peaks():
    h = np.zeros((1, 40, 40), np.float32)
    h[0, 10, 10] = 0.9
    h[0, 11, 11] = 0.5  # within radius of the stronger peak -> suppressed
    h[0, 30, 5] = 0.7
    kept = np.asarray(nms.nms_local_max(jnp.asarray(h), radius=4, conf_threshold=0.1))
    assert kept[0, 10, 10] > 0
    assert kept[0, 11, 11] == 0
    assert kept[0, 30, 5] > 0
    kps = nms.topk_keypoints(jnp.asarray(kept), 10)
    assert int(kps.valid.sum()) == 2


def test_descriptor_sampling_bilinear():
    # constant coarse descriptor -> sampled descriptor equals it (normalized)
    d = np.zeros((1, 4, 4, 8), np.float32)
    d[..., 0] = 3.0
    kp = jnp.asarray([[[12.0, 20.0], [5.0, 7.0]]])
    out = np.asarray(nms.sample_descriptors(jnp.asarray(d), kp))
    np.testing.assert_allclose(out[0, :, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[0, :, 1:], 0.0, atol=1e-5)


def test_midas_interface():
    params = midas.init_params(jax.random.PRNGKey(1))
    img = jnp.asarray(np.random.default_rng(0).random((1, 128, 192, 3)), jnp.float32)
    d = midas.estimate_depth(params, img)
    assert d.shape == (1, 128, 192)
    assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0 + 1e-6


def test_orb_detects_and_matches_synthetic():
    rng = np.random.default_rng(3)
    world = synthetic.make_world(rng, num_landmarks=300, desc_dim=8)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    img1 = synthetic.render_gray(world, R, t, 120.0, 120.0, 79.5, 59.5, 160, 120)
    # slightly shifted view
    t2 = np.array([0.05, 0.0, 0.0], np.float32)
    img2 = synthetic.render_gray(world, R, t2, 120.0, 120.0, 79.5, 59.5, 160, 120)

    xy1, s1, v1, d1 = orb.detect_orb(jnp.asarray(img1), max_keypoints=128, num_levels=3)
    xy2, s2, v2, d2 = orb.detect_orb(jnp.asarray(img2), max_keypoints=128, num_levels=3)
    assert int(v1.sum()) > 30
    m = matching.knn2_ratio_match(d1, d2, v1, v2, ratio=0.9, mutual=True)
    n_match = int(m.valid.sum())
    assert n_match > 10
    # matched displacement should be consistent (dominant x-shift)
    dx = np.asarray(xy2[m.idx][:, 0] - xy1[:, 0])[np.asarray(m.valid)]
    assert np.abs(np.median(dx)) >= 0.5  # ~f*0.05/z = 1-3 px expected shift


def test_superpoint_pth_conversion(tmp_path):
    """Converter maps a MagicLeap-layout state_dict onto our Flax params
    (fabricated checkpoint — no real weights in this image)."""
    import torch

    from vslam_tpu.models import weights as w

    shapes = {
        "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
        "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
        "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
        "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
        "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
        "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
    }
    g = torch.Generator().manual_seed(0)
    sd = {}
    for name, s in shapes.items():
        sd[f"{name}.weight"] = torch.randn(s, generator=g)
        sd[f"{name}.bias"] = torch.randn(s[0], generator=g)
    p = tmp_path / "superpoint_v1.pth"
    torch.save(sd, p)

    params = w.superpoint_params_from_pth(str(p))
    # Converted params drive the flax model
    from vslam_tpu.models import superpoint as sp

    model = sp.SuperPoint()
    img = jnp.asarray(np.random.default_rng(0).random((1, 64, 80, 1)), jnp.float32)
    semi, desc = model.apply(params, img)
    assert semi.shape == (1, 8, 10, 65)
    assert desc.shape == (1, 8, 10, 256)
    # kernel layout sanity: OIHW -> HWIO
    kj = np.asarray(params["params"]["conv1a"]["kernel"])
    kt = sd["conv1a.weight"].numpy()
    np.testing.assert_allclose(kj[1, 2, 0, 5], kt[5, 0, 1, 2], atol=1e-6)
    # load_or_init picks up the checkpoint from a search dir
    params2, src = w.load_or_init_superpoint(search_dirs=(str(tmp_path),))
    assert src.endswith("superpoint_v1.pth")


def test_orb_frontend_batched_reference_params():
    """OrbFrontend wires the reference ORB defaults (3000 kps capacity /
    8 levels / factor 1.2, `include/Config.h:48-50`) and extracts a
    100-frame stack in ONE vmapped jitted program (no host per-image
    loop)."""
    from vslam_tpu.config import tiny_test_config
    from vslam_tpu.core import frontend as fe

    cfg = tiny_test_config()
    assert cfg.frontend.orb_max_keypoints == 3000
    assert cfg.frontend.orb_num_levels == 8
    assert cfg.frontend.orb_scale_factor == 1.2
    front = fe.make_frontend(cfg, kind="orb")
    assert front.num_levels == 8
    rng = np.random.default_rng(0)
    imgs = rng.random((100, cfg.camera.height, cfg.camera.width)).astype(np.float32)
    xy, score, valid, desc = front.extract(imgs)
    K, D = cfg.frontend.max_keypoints, cfg.frontend.descriptor_dim
    assert xy.shape == (100, K, 2)
    assert desc.shape == (100, K, D)
    assert valid.shape == (100, K)
    # Hamming-parity config (Config.h:48-56): 3000-kp budget + L2
    # equivalents of the BF-Hamming gates.
    pc = fe.orb_parity_config(cfg)
    assert pc.frontend.max_keypoints == 3000
    assert abs(pc.frontend.l2_ratio_threshold - 0.8**0.5) < 1e-6


def test_frontend_factory_orb():
    from vslam_tpu.config import tiny_test_config
    from vslam_tpu.core import frontend as fe

    cfg = tiny_test_config()
    front = fe.make_frontend(cfg, kind="orb")
    rng = np.random.default_rng(0)
    from vslam_tpu.data import synthetic

    world = synthetic.make_room_world(rng, num_landmarks=300, desc_dim=8)
    img = synthetic.render_textured(
        world, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
        cfg.camera.width, cfg.camera.height,
    )
    xy, score, valid, desc = front.extract(np.stack([img, img]))
    K, D = cfg.frontend.max_keypoints, cfg.frontend.descriptor_dim
    assert xy.shape == (2, K, 2)
    assert desc.shape == (2, K, D)
    assert int(np.asarray(valid).sum()) > 20


def test_midas_pth_conversion(tmp_path):
    """Converter maps a MidasNet_small-layout state_dict (timm
    efficientnet_lite3 + scratch decoder) onto our Flax tree — fabricated
    checkpoint with the real key names and analytically-derived shapes."""
    import torch

    from vslam_tpu.models import midas, weights as w

    g = torch.Generator().manual_seed(0)
    sd = {}

    def add_conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.randn((o, i, k, k), generator=g) * 0.05

    def add_convb(name, o, i, k):
        add_conv(name, o, i, k)
        sd[f"{name}.bias"] = torch.randn((o,), generator=g) * 0.05

    def add_bn(name, c):
        sd[f"{name}.weight"] = torch.rand((c,), generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn((c,), generator=g) * 0.05
        sd[f"{name}.running_mean"] = torch.randn((c,), generator=g) * 0.05
        sd[f"{name}.running_var"] = torch.rand((c,), generator=g) + 0.5

    # --- encoder: lite3 channel plan derived from the B0 spec ---
    b0 = [(1, 3, 16), (6, 3, 24), (6, 5, 40), (6, 3, 80), (6, 5, 112),
          (6, 5, 192), (6, 3, 320)]
    chs = [midas._round_filters(c) for _, _, c in b0]  # 24,32,48,96,136,232,384
    reps = [1, 3, 3, 5, 5, 6, 1]
    stage_prefix = {0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
                    2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
                    4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
                    6: "pretrained.layer4.1"}
    add_conv("pretrained.layer1.0", 32, 3, 3)  # stem
    add_bn("pretrained.layer1.1", 32)
    c_in = 32
    for si, r in enumerate(reps):
        e, k, _ = b0[si]
        for bi in range(r):
            tp = f"{stage_prefix[si]}.{bi}"
            if si == 0:
                sd[f"{tp}.conv_dw.weight"] = torch.randn((c_in, 1, k, k), generator=g) * 0.05
                add_bn(f"{tp}.bn1", c_in)
                add_conv(f"{tp}.conv_pw", chs[si], c_in, 1)
                add_bn(f"{tp}.bn2", chs[si])
            else:
                mid = c_in * e
                add_conv(f"{tp}.conv_pw", mid, c_in, 1)
                add_bn(f"{tp}.bn1", mid)
                sd[f"{tp}.conv_dw.weight"] = torch.randn((mid, 1, k, k), generator=g) * 0.05
                add_bn(f"{tp}.bn2", mid)
                add_conv(f"{tp}.conv_pwl", chs[si], mid, 1)
                add_bn(f"{tp}.bn3", chs[si])
            c_in = chs[si]

    # --- scratch decoder (features=64, expand=True) ---
    taps = [chs[1], chs[2], chs[4], chs[6]]  # 32, 48, 136, 384
    f = [64, 128, 256, 512]
    for i in range(4):
        add_conv(f"scratch.layer{i + 1}_rn", f[i], taps[i], 3)
    for i in range(1, 5):
        ch = f[i - 1]
        out = ch // 2 if i != 1 else ch
        for u in ("resConfUnit1", "resConfUnit2"):
            add_convb(f"scratch.refinenet{i}.{u}.conv1", ch, ch, 3)
            add_convb(f"scratch.refinenet{i}.{u}.conv2", ch, ch, 3)
        add_convb(f"scratch.refinenet{i}.out_conv", out, ch, 1)
    add_convb("scratch.output_conv.0", 32, 64, 3)
    add_convb("scratch.output_conv.2", 32, 32, 3)
    add_convb("scratch.output_conv.4", 1, 32, 1)

    p = tmp_path / "midas_v21_small_256.pt"
    torch.save(sd, p)

    params = w.midas_params_from_pth(str(p))
    ref = midas.init_params(jax.random.PRNGKey(0))
    # Tree structure + every leaf shape must match our model exactly.
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    # Forward pass at the reference input size; output stride exactly 1.
    img = jnp.asarray(np.random.default_rng(0).random((1, 256, 256, 3)), jnp.float32)
    out = midas.MidasSmall().apply(params, img)
    assert out.shape == (1, 256, 256)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # non_negative head

    # OIHW -> HWIO layout spot check on the stem kernel.
    kj = np.asarray(params["params"]["encoder"]["stem_conv"]["kernel"])
    kt = sd["pretrained.layer1.0.weight"].numpy()
    np.testing.assert_allclose(kj[1, 2, 0, 5], kt[5, 0, 1, 2], atol=1e-6)

    # load_or_init picks the checkpoint up from a search dir.
    _, src = w.load_or_init_midas(search_dirs=(str(tmp_path),))
    assert src.endswith("midas_v21_small_256.pt")


def test_superpoint_torch_forward_parity(tmp_path):
    """GOLDEN forward parity: the public MagicLeap SuperPointNet
    (`FeatureExtractor.cpp:87-118` runs its ONNX export) reimplemented
    in torch drives the same random checkpoint through both stacks —
    our Flax forward must reproduce torch's semi/desc numerically.
    Pins conv strides, SAME padding, pool placement, and head wiring,
    not just state-dict key mapping."""
    import torch
    import torch.nn.functional as F

    from vslam_tpu.models import weights as w

    shapes = {
        "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
        "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
        "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
        "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
        "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
        "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
    }
    g = torch.Generator().manual_seed(7)
    sd = {}
    for name, s in shapes.items():
        # Kaiming-scaled so activations stay O(1) through the 12-layer
        # stack — unnormalized random weights blow up to ~1e5 where f32
        # reassociation noise drowns a meaningful comparison.
        std = (2.0 / (s[1] * s[2] * s[3])) ** 0.5
        sd[f"{name}.weight"] = torch.randn(s, generator=g) * std
        sd[f"{name}.bias"] = torch.randn(s[0], generator=g) * 0.01
    p = tmp_path / "superpoint_v1.pth"
    torch.save(sd, p)
    params = w.superpoint_params_from_pth(str(p))

    def torch_forward(x):
        def c(x, n, pad=1):
            return F.conv2d(x, sd[n + ".weight"], sd[n + ".bias"], padding=pad)

        x = F.relu(c(x, "conv1a"))
        x = F.relu(c(x, "conv1b"))
        x = F.max_pool2d(x, 2, 2)
        x = F.relu(c(x, "conv2a"))
        x = F.relu(c(x, "conv2b"))
        x = F.max_pool2d(x, 2, 2)
        x = F.relu(c(x, "conv3a"))
        x = F.relu(c(x, "conv3b"))
        x = F.max_pool2d(x, 2, 2)
        x = F.relu(c(x, "conv4a"))
        x = F.relu(c(x, "conv4b"))
        cPa = F.relu(c(x, "convPa"))
        semi = c(cPa, "convPb", 0)
        cDa = F.relu(c(x, "convDa"))
        desc = c(cDa, "convDb", 0)
        return semi, desc

    rng = np.random.default_rng(3)
    img = rng.random((1, 64, 80, 1)).astype(np.float32)
    with torch.no_grad():
        semi_t, desc_t = torch_forward(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )

    # f32 compute for an exact comparison (production runs bf16).
    model = sp.SuperPoint(compute_dtype=jnp.float32)
    semi_j, desc_j = model.apply(params, jnp.asarray(img))

    np.testing.assert_allclose(
        np.asarray(semi_j), semi_t.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(desc_j), desc_t.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
