"""Checkpoint conversion: public SuperPoint/MiDaS weights -> Flax params.

The reference ships ONNX files (`models/superpoint_v1.onnx`,
`models/midas_v21_small_256.onnx`, `/root/reference/README.md:42-43`).
This environment has neither the weights nor the `onnx` package, so
conversion is gated on file presence:

- `.pth` (MagicLeap SuperPointNet state_dict) via torch-CPU: OIHW conv
  kernels -> HWIO, biases passthrough.
- If nothing is found, `load_or_init` falls back to deterministic random
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


def find_checkpoint(search_dirs, names):
    for d in search_dirs:
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
    return None


def load_or_init_superpoint(
    key: Optional[jax.Array] = None,
    search_dirs=("models", "/root/models", "weights"),
    height=480,
    width=640,
):
    """Load converted SuperPoint weights if a checkpoint exists, else
    deterministic random init. Returns (params, source_str)."""
    from vslam_tpu.models import superpoint as sp

    ckpt = find_checkpoint(search_dirs, ("superpoint_v1.pth", "superpoint.pth"))
    if ckpt is not None:
        return superpoint_params_from_pth(ckpt), ckpt
    if key is None:
        key = jax.random.PRNGKey(0)
    return sp.init_params(key, height=height, width=width), "random-init"
