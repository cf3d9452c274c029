"""Checkpoint conversion: public SuperPoint/MiDaS weights -> Flax params.

The reference ships ONNX files (`models/superpoint_v1.onnx`,
`models/midas_v21_small_256.onnx`, `/root/reference/README.md:42-43`).
This environment has neither the weights nor the `onnx` package, so
conversion is gated on file presence:

- SuperPoint: `.pth` (MagicLeap SuperPointNet state_dict) via torch-CPU:
  OIHW conv kernels -> HWIO, biases passthrough.
- MiDaS v2.1-small: `.pt` (`MidasNet_small` state_dict, timm
  efficientnet_lite3 encoder + scratch decoder) via `midas_params_from_pth`.
- If nothing is found, `load_or_init_*` falls back to deterministic random
  init — every downstream test is weight-agnostic (synthetic scenes), and
  real checkpoints drop in without code changes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# MagicLeap SuperPointNet layer names -> our Flax module names (identical
# architecture, so it is a pure rename + layout transpose).
_SP_LAYERS = [
    "conv1a", "conv1b", "conv2a", "conv2b",
    "conv3a", "conv3b", "conv4a", "conv4b",
    "convPa", "convPb", "convDa", "convDb",
]


def superpoint_params_from_pth(path: str):
    """Convert a MagicLeap `superpoint_v1.pth` state_dict to Flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = {}
    for name in _SP_LAYERS:
        w = sd[f"{name}.weight"].numpy()  # OIHW
        b = sd[f"{name}.bias"].numpy()
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
            "bias": jnp.asarray(b),
        }
    return {"params": params}


def midas_params_from_pth(path: str):
    """Convert the public MiDaS v2.1-small checkpoint
    (`midas_v21_small_256.pt`, a `MidasNet_small` state_dict wrapping a
    timm efficientnet_lite3) to our Flax tree.

    The reference consumes the ONNX export of the same weights
    (`/root/reference/src/DepthEstimator.cpp:15-112`). Key layout:
      pretrained.layer1 = [conv_stem, bn1, act1, blocks0, blocks1]
      pretrained.layer2 = [blocks2]; layer3 = [blocks3, blocks4];
      layer4 = [blocks5, blocks6]          (timm stage Sequentials)
      scratch.layer{1-4}_rn / refinenet{1-4} / output_conv.{0,2,4}
    Conv kernels transpose OIHW -> HWIO (depthwise (C,1,k,k) -> (k,k,1,C));
    BatchNorm weight/bias -> scale/bias, running stats -> batch_stats.
    refinenet4.resConfUnit1 exists in the checkpoint but is unused (no
    skip input at the top level) and is dropped.
    """
    import torch

    sd = {k: v.numpy() for k, v in torch.load(
        path, map_location="cpu", weights_only=True
    ).items()}

    def conv(k):
        return jnp.asarray(np.transpose(sd[k], (2, 3, 1, 0)))

    def convb(k):
        return {"kernel": conv(k + ".weight"), "bias": jnp.asarray(sd[k + ".bias"])}

    def bn(prefix):
        p = {
            "scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }
        s = {
            "mean": jnp.asarray(sd[prefix + ".running_mean"]),
            "var": jnp.asarray(sd[prefix + ".running_var"]),
        }
        return p, s

    params, stats = {}, {}
    enc_p, enc_s = {}, {}
    enc_p["stem_conv"] = {"kernel": conv("pretrained.layer1.0.weight")}
    p, s = bn("pretrained.layer1.1")
    enc_p["stem_bn"], enc_s["stem_bn"] = p, s

    stage_prefix = {
        0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
        2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
        4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
        6: "pretrained.layer4.1",
    }
    reps = [1, 3, 3, 5, 5, 6, 1]  # lite3: depth 1.4, ends unscaled
    for si, r in enumerate(reps):
        for bi in range(r):
            tp = f"{stage_prefix[si]}.{bi}"
            bp, bs = {}, {}
            if si == 0:
                # DepthwiseSeparableConv: dw -> bn1 -> pw -> bn2
                bp["dw_conv"] = {"kernel": conv(tp + ".conv_dw.weight")}
                p, s = bn(tp + ".bn1"); bp["bn1"], bs["bn1"] = p, s
                bp["project_conv"] = {"kernel": conv(tp + ".conv_pw.weight")}
                p, s = bn(tp + ".bn2"); bp["bn2"], bs["bn2"] = p, s
            else:
                # InvertedResidual: pw(expand) -> bn1 -> dw -> bn2 -> pwl -> bn3
                bp["expand_conv"] = {"kernel": conv(tp + ".conv_pw.weight")}
                p, s = bn(tp + ".bn1"); bp["bn0"], bs["bn0"] = p, s
                bp["dw_conv"] = {"kernel": conv(tp + ".conv_dw.weight")}
                p, s = bn(tp + ".bn2"); bp["bn1"], bs["bn1"] = p, s
                bp["project_conv"] = {"kernel": conv(tp + ".conv_pwl.weight")}
                p, s = bn(tp + ".bn3"); bp["bn2"], bs["bn2"] = p, s
            enc_p[f"s{si}_b{bi}"], enc_s[f"s{si}_b{bi}"] = bp, bs
    params["encoder"], stats["encoder"] = enc_p, enc_s

    for i in range(1, 5):
        params[f"scratch_rn{i}"] = {"kernel": conv(f"scratch.layer{i}_rn.weight")}

    def rcu(tp):
        return {"conv1": convb(tp + ".conv1"), "conv2": convb(tp + ".conv2")}

    for i in range(1, 5):
        tp = f"scratch.refinenet{i}"
        blk = {"rcu2": rcu(tp + ".resConfUnit2"), "out_conv": convb(tp + ".out_conv")}
        if i != 4:
            blk["rcu1"] = rcu(tp + ".resConfUnit1")
        params[f"refine{i}"] = blk

    params["head_conv1"] = convb("scratch.output_conv.0")
    params["head_conv2"] = convb("scratch.output_conv.2")
    params["head_conv3"] = convb("scratch.output_conv.4")
    return {"params": params, "batch_stats": stats}


def load_or_init_midas(
    key: Optional[jax.Array] = None,
    search_dirs=("models", "/root/models", "weights"),
    size=256,
):
    """Load converted MiDaS weights if a checkpoint exists, else
    deterministic random init. Returns (params, source_str)."""
    from vslam_tpu.models import midas

    ckpt = find_checkpoint(
        search_dirs,
        ("midas_v21_small_256.pt", "midas_v21_small.pt", "midas_small.pt"),
    )
    if ckpt is not None:
        return midas_params_from_pth(ckpt), ckpt
    if key is None:
        key = jax.random.PRNGKey(7)
    return midas.init_params(key, size=size), "random-init"


def find_checkpoint(search_dirs, names):
    for d in search_dirs:
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
    return None


# In-repo trained checkpoint (produced by scripts/train_superpoint.py on
# synthetic textured scenes; see models/train_superpoint.py).
TRAINED_SP_DIR = os.path.join(os.path.dirname(__file__), "checkpoints")


def save_superpoint_npz(path, params, dtype=np.float16):
    """Save SuperPoint Flax params as a flat npz (`layer/kernel` keys).

    float16 halves the artifact size; SuperPoint conv weights round-trip
    through f16 with <1e-3 relative error — irrelevant next to bf16
    inference compute."""
    flat = {}
    for layer, leaves in params["params"].items():
        for k, v in leaves.items():
            flat[f"{layer}/{k}"] = np.asarray(v).astype(dtype)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def superpoint_params_from_npz(path):
    """Load params saved by `save_superpoint_npz` (f32 tree)."""
    with np.load(path) as z:
        params = {}
        for key in z.files:
            layer, leaf = key.split("/")
            params.setdefault(layer, {})[leaf] = jnp.asarray(
                z[key].astype(np.float32)
            )
    return {"params": params}


def save_depthnet_npz(path, params, dtype=np.float16):
    """Save DepthNet Flax params as a flat npz (same scheme as
    `save_superpoint_npz`: `layer/leaf` keys, f16 storage)."""
    flat = {}
    for layer, leaves in params["params"].items():
        for k, v in leaves.items():
            flat[f"{layer}/{k}"] = np.asarray(v).astype(dtype)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def depthnet_params_from_npz(path):
    with np.load(path) as z:
        params = {}
        for key in z.files:
            layer, leaf = key.split("/")
            params.setdefault(layer, {})[leaf] = jnp.asarray(
                z[key].astype(np.float32)
            )
    return {"params": params}


def load_or_init_depthnet(
    key: Optional[jax.Array] = None,
    search_dirs=("models", "/root/models", "weights"),
):
    """Load the synthetically-trained DepthNet checkpoint
    (`models/checkpoints/depthnet_synth.npz`, see
    `models/train_depthnet.py`), else deterministic random init.
    Returns (params, source_str). The mono pipeline treats "random-init"
    as NO depth capability (a random net's depth would poison the scale
    chain — the round-4 C7 failure mode this trained checkpoint fixes)."""
    from vslam_tpu.models import depthnet as dn

    npz = find_checkpoint(
        tuple(search_dirs) + (TRAINED_SP_DIR,), ("depthnet_synth.npz",)
    )
    if npz is not None:
        return depthnet_params_from_npz(npz), npz
    if key is None:
        key = jax.random.PRNGKey(11)
    return dn.init_params(key), "random-init"


def load_or_init_superpoint(
    key: Optional[jax.Array] = None,
    search_dirs=("models", "/root/models", "weights"),
    height=480,
    width=640,
):
    """Load SuperPoint weights, preferring (1) a real converted `.pth`
    checkpoint, (2) the repo's own synthetically-trained npz, then
    (3) deterministic random init. Returns (params, source_str)."""
    from vslam_tpu.models import superpoint as sp

    ckpt = find_checkpoint(search_dirs, ("superpoint_v1.pth", "superpoint.pth"))
    if ckpt is not None:
        return superpoint_params_from_pth(ckpt), ckpt
    npz = find_checkpoint(
        tuple(search_dirs) + (TRAINED_SP_DIR,), ("superpoint_synth.npz",)
    )
    if npz is not None:
        return superpoint_params_from_npz(npz), npz
    if key is None:
        key = jax.random.PRNGKey(0)
    return sp.init_params(key, height=height, width=width), "random-init"
