"""SuperPoint keypoint detector + descriptor network in JAX/Flax.

The reference runs SuperPoint as an opaque ONNX graph on the CUDA EP
(`/root/reference/src/FeatureExtractor.cpp:22-44, 87-118`): input
`image` (1, 1, H, W) in [0, 1], outputs `semi` (1, 65, H/8, W/8) and
`desc` (1, 256, H/8, W/8). Here the VGG-style backbone (the public
MagicLeap SuperPoint-v1 architecture) is a native Flax module in NHWC
with bfloat16 compute on the MXU, so the whole frontend fuses into one
jitted program — no host<->device round trip per frame.

Post-processing (65-way softmax decode, depth-to-space, NMS, top-k,
bilinear descriptor sampling — `FeatureExtractor.cpp:128-259`) lives in
`vslam_tpu.ops.nms` and is pure XLA, batched over frames.

Weight conversion from the public `superpoint_v1.pth` / ONNX checkpoint is
in `vslam_tpu.models.weights` (gated on file presence; this image has no
weights, so tests run with deterministic random init).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

CELL = 8  # decoder cell size: H/8 x W/8 grid, 64 pixels + dustbin channel


class SuperPoint(nn.Module):
    """VGG backbone + detector/descriptor heads.

    Layer widths (public SuperPoint-v1): (64, 64, 64, 64, 128, 128, 128, 128)
    with 2x2 max-pools after layers 2, 4, 6; detector head 256 -> 65;
    descriptor head 256 -> 256.
    """

    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        """image: (B, H, W, 1) float in [0, 1], H and W multiples of 8.

        Returns (semi, desc_coarse):
          semi: (B, H/8, W/8, 65) raw logits (pre-softmax).
          desc_coarse: (B, H/8, W/8, 256) raw (pre-normalization).
        """
        dt = self.compute_dtype

        def conv(x, ch, name, kernel=3):
            return nn.Conv(
                ch, (kernel, kernel), padding="SAME", dtype=dt, name=name
            )(x)

        x = image.astype(dt)
        x = nn.relu(conv(x, 64, "conv1a"))
        x = nn.relu(conv(x, 64, "conv1b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 64, "conv2a"))
        x = nn.relu(conv(x, 64, "conv2b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 128, "conv3a"))
        x = nn.relu(conv(x, 128, "conv3b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 128, "conv4a"))
        x = nn.relu(conv(x, 128, "conv4b"))

        # Detector head: 65 = 8x8 cell pixels + dustbin
        cPa = nn.relu(conv(x, 256, "convPa"))
        semi = conv(cPa, 65, "convPb", kernel=1)

        # Descriptor head
        cDa = nn.relu(conv(x, 256, "convDa"))
        desc = conv(cDa, 256, "convDb", kernel=1)

        return semi.astype(jnp.float32), desc.astype(jnp.float32)


def init_params(key, height=480, width=640, compute_dtype=jnp.bfloat16):
    """Deterministic parameter init (stand-in when no checkpoint exists)."""
    model = SuperPoint(compute_dtype=compute_dtype)
    dummy = jnp.zeros((1, height, width, 1), jnp.float32)
    return model.init(key, dummy)


def pad_to_multiple(image, multiple=CELL):
    """Pad H, W up to a multiple of 8 (reference pads the same way,
    `FeatureExtractor.cpp:90-105`). Returns (padded, (H, W) original)."""
    H, W = image.shape[-3], image.shape[-2]
    Hp = (H + multiple - 1) // multiple * multiple
    Wp = (W + multiple - 1) // multiple * multiple
    pad = [(0, 0)] * (image.ndim - 3) + [(0, Hp - H), (0, Wp - W), (0, 0)]
    return jnp.pad(image, pad), (H, W)
