"""GOLDEN forward parity for MiDaS v2.1-small: the MidasNet_small
architecture (timm tf_efficientnet_lite3 encoder + MiDaS scratch decoder,
the network inside `midas_v21_small_256` that the reference runs as ONNX,
`DepthEstimator.cpp:15-112`) reimplemented functionally in torch, driven
by the SAME random checkpoint as our Flax model.

Pins: TF-SAME padding on stride-2 convs, BN epsilon 1e-3
(timm BN_EPS_TF_DEFAULT for tf_ variants), ReLU6 placement, residual
conditions, tap locations, align_corners=True 2x upsampling, fusion-block
wiring, and head structure — not just state-dict key mapping."""

import numpy as np

import jax
import jax.numpy as jnp

from vslam_tpu.models import midas

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m "not slow"`

BN_EPS = 1e-3


def _flax_to_torch_sd(params):
    """Inverse of weights.midas_params_from_pth: Flax tree -> the
    MidasNet_small state_dict keys the converter consumes."""
    import torch

    p = params["params"]
    s = params["batch_stats"]
    sd = {}

    def put_conv(key, kern):
        sd[key] = torch.from_numpy(np.transpose(np.asarray(kern), (3, 2, 0, 1)).copy())

    def put_dwconv(key, kern):
        # Flax depthwise (k, k, 1, C) -> torch (C, 1, k, k)
        sd[key] = torch.from_numpy(np.transpose(np.asarray(kern), (3, 2, 0, 1)).copy())

    def put_bn(prefix, pp, ss):
        sd[prefix + ".weight"] = torch.from_numpy(np.asarray(pp["scale"]).copy())
        sd[prefix + ".bias"] = torch.from_numpy(np.asarray(pp["bias"]).copy())
        sd[prefix + ".running_mean"] = torch.from_numpy(np.asarray(ss["mean"]).copy())
        sd[prefix + ".running_var"] = torch.from_numpy(np.asarray(ss["var"]).copy())

    enc_p, enc_s = p["encoder"], s["encoder"]
    put_conv("pretrained.layer1.0.weight", enc_p["stem_conv"]["kernel"])
    put_bn("pretrained.layer1.1", enc_p["stem_bn"], enc_s["stem_bn"])

    stage_prefix = {
        0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
        2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
        4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
        6: "pretrained.layer4.1",
    }
    reps = [1, 3, 3, 5, 5, 6, 1]
    for si, r in enumerate(reps):
        for bi in range(r):
            tp = f"{stage_prefix[si]}.{bi}"
            bp = enc_p[f"s{si}_b{bi}"]
            bs = enc_s[f"s{si}_b{bi}"]
            if si == 0:
                put_dwconv(tp + ".conv_dw.weight", bp["dw_conv"]["kernel"])
                put_bn(tp + ".bn1", bp["bn1"], bs["bn1"])
                put_conv(tp + ".conv_pw.weight", bp["project_conv"]["kernel"])
                put_bn(tp + ".bn2", bp["bn2"], bs["bn2"])
            else:
                put_conv(tp + ".conv_pw.weight", bp["expand_conv"]["kernel"])
                put_bn(tp + ".bn1", bp["bn0"], bs["bn0"])
                put_dwconv(tp + ".conv_dw.weight", bp["dw_conv"]["kernel"])
                put_bn(tp + ".bn2", bp["bn1"], bs["bn1"])
                put_conv(tp + ".conv_pwl.weight", bp["project_conv"]["kernel"])
                put_bn(tp + ".bn3", bp["bn2"], bs["bn2"])

    for i in range(1, 5):
        put_conv(f"scratch.layer{i}_rn.weight", p[f"scratch_rn{i}"]["kernel"])

    def put_convb(key, blk):
        put_conv(key + ".weight", blk["kernel"])
        import torch as _t

        sd[key + ".bias"] = _t.from_numpy(np.asarray(blk["bias"]).copy())

    for i in range(1, 5):
        tp = f"scratch.refinenet{i}"
        blk = p[f"refine{i}"]
        put_convb(tp + ".resConfUnit2.conv1", blk["rcu2"]["conv1"])
        put_convb(tp + ".resConfUnit2.conv2", blk["rcu2"]["conv2"])
        put_convb(tp + ".out_conv", blk["out_conv"])
        if i != 4:
            put_convb(tp + ".resConfUnit1.conv1", blk["rcu1"]["conv1"])
            put_convb(tp + ".resConfUnit1.conv2", blk["rcu1"]["conv2"])

    put_convb("scratch.output_conv.0", p["head_conv1"])
    put_convb("scratch.output_conv.2", p["head_conv2"])
    put_convb("scratch.output_conv.4", p["head_conv3"])
    return sd


def _torch_forward(x, sd):
    """Functional MidasNet_small forward (normalized input, NCHW)."""
    import torch
    import torch.nn.functional as F

    def same_pad(x, k, s):
        # TF-SAME: pad_total = max((ceil(H/s)-1)*s + k - H, 0), extra on
        # the bottom/right (matches JAX "SAME").
        H, W = x.shape[-2:]

        def tot(n):
            return max((-(-n // s) - 1) * s + k - n, 0)

        th, tw = tot(H), tot(W)
        return F.pad(x, (tw // 2, tw - tw // 2, th // 2, th - th // 2))

    def conv(x, key, s=1, groups=1, bias=False):
        w = sd[key + ".weight"]
        k = w.shape[-1]
        x = same_pad(x, k, s)
        return F.conv2d(
            x, w, sd[key + ".bias"] if bias else None, stride=s, groups=groups
        )

    def bn(x, prefix):
        return F.batch_norm(
            x, sd[prefix + ".running_mean"], sd[prefix + ".running_var"],
            sd[prefix + ".weight"], sd[prefix + ".bias"], eps=BN_EPS,
        )

    def relu6(x):
        return torch.clamp(x, 0.0, 6.0)

    # ---- encoder (tf_efficientnet_lite3) ----
    x = relu6(bn(conv(x, "pretrained.layer1.0", s=2), "pretrained.layer1.1"))

    stage_prefix = {
        0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
        2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
        4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
        6: "pretrained.layer4.1",
    }
    reps = [1, 3, 3, 5, 5, 6, 1]
    strides = [1, 2, 2, 2, 1, 2, 1]  # B0 stage strides
    taps = {}
    stride = 2
    for si, r in enumerate(reps):
        for bi in range(r):
            tp = f"{stage_prefix[si]}.{bi}"
            st = strides[si] if bi == 0 else 1
            if st == 2 and stride in (4, 8, 16):
                taps[stride] = x
            inp = x
            if si == 0:
                g = x.shape[1]
                x = relu6(bn(conv(x, tp + ".conv_dw", s=st, groups=g), tp + ".bn1"))
                x = bn(conv(x, tp + ".conv_pw"), tp + ".bn2")
            else:
                x = relu6(bn(conv(x, tp + ".conv_pw"), tp + ".bn1"))
                g = x.shape[1]
                x = relu6(bn(conv(x, tp + ".conv_dw", s=st, groups=g), tp + ".bn2"))
                x = bn(conv(x, tp + ".conv_pwl"), tp + ".bn3")
            if st == 1 and inp.shape[1] == x.shape[1]:
                x = x + inp
            if bi == 0:
                stride *= st
    taps[32] = x
    l1, l2, l3, l4 = taps[4], taps[8], taps[16], taps[32]

    # ---- scratch + refinenets ----
    r1 = conv(l1, "scratch.layer1_rn")
    r2 = conv(l2, "scratch.layer2_rn")
    r3 = conv(l3, "scratch.layer3_rn")
    r4 = conv(l4, "scratch.layer4_rn")

    def rcu(x, tp):
        r = F.relu(x)
        r = conv(r, tp + ".conv1", bias=True)
        r = F.relu(r)
        r = conv(r, tp + ".conv2", bias=True)
        return x + r

    def fuse(x, tp, skip=None):
        if skip is not None:
            x = x + rcu(skip, tp + ".resConfUnit1")
        x = rcu(x, tp + ".resConfUnit2")
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return conv(x, tp + ".out_conv", bias=True)

    p4 = fuse(r4, "scratch.refinenet4")
    p3 = fuse(p4, "scratch.refinenet3", r3)
    p2 = fuse(p3, "scratch.refinenet2", r2)
    p1 = fuse(p2, "scratch.refinenet1", r1)

    h = conv(p1, "scratch.output_conv.0", bias=True)
    h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
    h = F.relu(conv(h, "scratch.output_conv.2", bias=True))
    h = F.relu(conv(h, "scratch.output_conv.4", bias=True))
    return h[:, 0]


def test_midas_pt_checkpoint_roundtrip(tmp_path):
    """Fabricated `midas_v21_small_256.pt` with the OFFICIAL MidasNet_small
    state-dict key names (including `num_batches_tracked` counters and the
    unused `refinenet4.resConfUnit1` block that real checkpoints carry)
    saved to disk and round-tripped through `weights.midas_params_from_pth`
    + `load_or_init_midas` — pins the converter against the opaque-
    checkpoint contract (`src/DepthEstimator.cpp:15-112`) without needing
    the real weights in this image."""
    import torch

    from vslam_tpu.models import weights as w

    params = midas.init_params(jax.random.PRNGKey(3), size=64)
    sd = _flax_to_torch_sd(params)

    # Spot-pin literal official key names (MidasNet_small over timm
    # tf_efficientnet_lite3) so the layout cannot silently drift with the
    # builder's own torch reimplementation.
    for key in [
        "pretrained.layer1.0.weight",
        "pretrained.layer1.1.running_var",
        "pretrained.layer1.3.0.conv_dw.weight",
        "pretrained.layer1.3.0.conv_pw.weight",
        "pretrained.layer1.4.2.conv_pwl.weight",
        "pretrained.layer2.0.0.conv_pw.weight",
        "pretrained.layer3.0.4.bn3.running_mean",
        "pretrained.layer3.1.0.conv_dw.weight",
        "pretrained.layer4.0.5.bn2.weight",
        "pretrained.layer4.1.0.conv_pwl.weight",
        "scratch.layer1_rn.weight",
        "scratch.layer4_rn.weight",
        "scratch.refinenet1.resConfUnit1.conv1.weight",
        "scratch.refinenet2.resConfUnit2.conv2.bias",
        "scratch.refinenet4.resConfUnit2.conv1.weight",
        "scratch.refinenet4.out_conv.weight",
        "scratch.output_conv.0.weight",
        "scratch.output_conv.2.bias",
        "scratch.output_conv.4.bias",
    ]:
        assert key in sd, key

    # Real checkpoints also carry BN bookkeeping + the unused refinenet4
    # skip unit; the converter must tolerate both.
    for key in [k for k in sd if k.endswith(".running_mean")]:
        sd[key.replace(".running_mean", ".num_batches_tracked")] = torch.tensor(0)
    c256 = sd["scratch.refinenet4.resConfUnit2.conv1.weight"]
    sd["scratch.refinenet4.resConfUnit1.conv1.weight"] = torch.randn_like(c256)
    sd["scratch.refinenet4.resConfUnit1.conv1.bias"] = torch.zeros(c256.shape[0])
    sd["scratch.refinenet4.resConfUnit1.conv2.weight"] = torch.randn_like(c256)
    sd["scratch.refinenet4.resConfUnit1.conv2.bias"] = torch.zeros(c256.shape[0])

    p = tmp_path / "midas_v21_small_256.pt"
    torch.save(sd, p)

    loaded, src = w.load_or_init_midas(search_dirs=(str(tmp_path),))
    assert src.endswith("midas_v21_small_256.pt")

    # Round trip must reproduce the original Flax tree exactly.
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(loaded)}
    for k, va in flat_a:
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(flat_b[jax.tree_util.keystr(k)]),
            atol=1e-6, err_msg=jax.tree_util.keystr(k),
        )

    # And the converted tree drives the model.
    img = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    d = midas.estimate_depth(loaded, img)
    assert d.shape == (1, 64, 64)


def test_midas_torch_forward_parity():
    import torch

    key = jax.random.PRNGKey(0)
    params = midas.init_params(key, size=64)
    # Scale running vars away from the init (all-ones) so the BN eps
    # actually matters, and randomize stats for a meaningful check.
    rng = np.random.default_rng(1)

    def jitter(path, x):
        x = np.asarray(x)
        return jnp.asarray(x + rng.normal(0, 0.05, x.shape).astype(x.dtype))

    params = jax.tree_util.tree_map_with_path(jitter, params)
    # Variances must stay positive.
    stats = jax.tree_util.tree_map(
        lambda x: x, params["batch_stats"]
    )

    def fix_var(d):
        for k, v in d.items():
            if isinstance(v, dict):
                fix_var(v)
            elif k == "var":
                d[k] = jnp.abs(v) + 0.5

    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    fix_var(params["batch_stats"])

    sd = _flax_to_torch_sd(params)

    img = rng.uniform(0.0, 1.0, (1, 64, 64, 3)).astype(np.float32)
    mean = np.asarray(midas.IMAGENET_MEAN, np.float32)
    std = np.asarray(midas.IMAGENET_STD, np.float32)
    x_norm = (img - mean) / std

    with torch.no_grad():
        out_t = _torch_forward(
            torch.from_numpy(x_norm.transpose(0, 3, 1, 2)), sd
        ).numpy()

    model = midas.MidasSmall(compute_dtype=jnp.float32)
    out_j = np.asarray(model.apply(params, jnp.asarray(img)))

    assert out_j.shape == out_t.shape == (1, 64, 64)
    scale = max(float(np.abs(out_t).max()), 1e-3)
    np.testing.assert_allclose(out_j, out_t, atol=2e-3 * scale, rtol=2e-3)
