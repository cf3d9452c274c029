"""MiDaS v2.1-small monocular relative-depth network in JAX/Flax.

The reference runs `midas_v21_small_256.onnx` through ONNX Runtime
(`/root/reference/src/DepthEstimator.cpp:15-112`): resize to 256x256,
ImageNet-normalize, run, resize back, min-max normalize to [0, 1]
relative inverse depth. The capability is LATENT in the reference (the
session is created and shown in the HUD, but `Frame::estimate_depth` is
never called — SURVEY.md C7); here it is a live, jittable model.

Architecture (matching the public MiDaS v2.1-small checkpoint,
`MidasNet_small(features=64, expand=True)` over timm efficientnet_lite3):
EfficientNet-Lite3 encoder (width 1.2 / depth 1.4, no squeeze-excite,
ReLU6, fixed stem) tapped at strides 4/8/16/32 with channels
(32, 48, 136, 384); scratch 3x3 convs to (64, 128, 256, 512); residual
feature-fusion blocks whose 1x1 out_convs halve channels level to level
(512->256->128->64, refinenet1 unexpanded); head 64->32 -> 2x -> 32 -> 1.
Output stride is exactly 1. Weight conversion from the public `.pt`
checkpoint lives in `vslam_tpu.models.weights.midas_params_from_pth`.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _round_filters(filters, multiplier=1.2, divisor=8):
    f = filters * multiplier
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def _round_repeats(repeats, multiplier=1.4):
    return int(math.ceil(multiplier * repeats))


# EfficientNet-B0 block args: (expand, kernel, stride, out_ch, repeats)
_B0_BLOCKS = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]


class MBConvLite(nn.Module):
    """Mobile inverted bottleneck, lite flavor: no SE, ReLU6."""

    out_ch: int
    expand: int
    kernel: int
    stride: int
    dtype: Any = jnp.bfloat16

    # timm tf_efficientnet_lite3 (the backbone inside the public MiDaS
    # v2.1-small checkpoint, exported with TF-SAME padding == JAX SAME)
    # uses BN_EPS_TF_DEFAULT = 1e-3, not torch's 1e-5.

    @nn.compact
    def __call__(self, x, train=False):
        inp = x
        ch_in = x.shape[-1]
        ch_mid = ch_in * self.expand
        if self.expand != 1:
            x = nn.Conv(ch_mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn0", epsilon=1e-3)(x)
            x = jnp.clip(x, 0, 6)
        x = nn.Conv(
            ch_mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=ch_mid, use_bias=False,
            dtype=self.dtype, name="dw_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1", epsilon=1e-3)(x)
        x = jnp.clip(x, 0, 6)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn2", epsilon=1e-3)(x)
        if self.stride == 1 and ch_in == self.out_ch:
            x = x + inp
        return x


class EfficientNetLite3(nn.Module):
    """Feature extractor returning stride-4/8/16/32 feature maps."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        # Lite rule: stem fixed at 32 channels.
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=dt, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=dt, name="stem_bn", epsilon=1e-3)(x)
        x = jnp.clip(x, 0, 6)

        feats = {}
        stride = 2
        for si, (e, k, s, c, r) in enumerate(_B0_BLOCKS):
            out_ch = _round_filters(c)
            # Lite rule: repeats of first and last stage not scaled.
            reps = r if si in (0, len(_B0_BLOCKS) - 1) else _round_repeats(r)
            for bi in range(reps):
                st = s if bi == 0 else 1
                if st == 2 and stride in (4, 8, 16):
                    feats[stride] = x
                x = MBConvLite(out_ch, e, k, st, dtype=dt, name=f"s{si}_b{bi}")(x)
                stride *= st if bi == 0 else 1
        feats[32] = x
        return [feats[4].astype(jnp.float32), feats[8].astype(jnp.float32),
                feats[16].astype(jnp.float32), feats[32].astype(jnp.float32)]


def _upsample2(x):
    """2x bilinear upsample with align_corners=True (the torch
    `Interpolate(scale_factor=2, mode="bilinear", align_corners=True)` the
    MiDaS decoder uses — jax.image.resize only does half-pixel centers)."""
    B, H, W, C = x.shape

    def lerp_axis(v, n_in, n_out, axis):
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        a = jnp.take(v, lo, axis=axis)
        b = jnp.take(v, hi, axis=axis)
        return a * (1.0 - w) + b * w

    x = lerp_axis(x, H, 2 * H, axis=1)
    x = lerp_axis(x, W, 2 * W, axis=2)
    return x


class ResidualConvUnit(nn.Module):
    """`ResidualConvUnit_custom` (MiDaS blocks.py): relu-conv-relu-conv
    plus skip."""

    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.relu(x)
        r = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(r)
        r = nn.relu(r)
        r = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(r)
        return x + r


class FeatureFusionBlock(nn.Module):
    """`FeatureFusionBlock_custom`: rcu1(skip)+x -> rcu2 -> 2x upsample ->
    1x1 out_conv. With expand=True the out_conv HALVES the channels — that
    single conv is the level-to-level alignment (there are no separate
    align convs in the checkpoint)."""

    ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.ch, dtype=self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.ch, dtype=self.dtype, name="rcu2")(x)
        x = _upsample2(x)
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="out_conv")(x)
        return x


class MidasSmall(nn.Module):
    """MiDaS v2.1-small: lite3 encoder + 4-level fusion decoder.

    Channel plan matches the shipped checkpoint (`MidasNet_small` with
    features=64, expand=True): scratch levels (64, 128, 256, 512), fusion
    out_convs halve down 512->256->128->64, refinenet1 keeps 64 (no
    expand), head 64->32 -> 2x -> 32 -> 1.
    """

    features: int = 64
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        """image: (B, H, W, 3) in [0, 1], H and W multiples of 32.
        Returns (B, H, W) relative inverse depth (unnormalized) — the
        decoder's output stride is exactly 1 (5 fusion upsamples + head
        upsample from stride 32), no resize needed."""
        B, H, W, _ = image.shape
        if H % 32 or W % 32:
            raise ValueError(f"MiDaS input must be a multiple of 32, got {H}x{W}")
        mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
        std = jnp.asarray(IMAGENET_STD, image.dtype)
        x = (image - mean) / std

        l1, l2, l3, l4 = EfficientNetLite3(dtype=self.compute_dtype, name="encoder")(x)

        f = self.features
        chs = [f, f * 2, f * 4, f * 8]  # 64, 128, 256, 512
        r1 = nn.Conv(chs[0], (3, 3), padding="SAME", use_bias=False, name="scratch_rn1")(l1)
        r2 = nn.Conv(chs[1], (3, 3), padding="SAME", use_bias=False, name="scratch_rn2")(l2)
        r3 = nn.Conv(chs[2], (3, 3), padding="SAME", use_bias=False, name="scratch_rn3")(l3)
        r4 = nn.Conv(chs[3], (3, 3), padding="SAME", use_bias=False, name="scratch_rn4")(l4)

        p4 = FeatureFusionBlock(chs[3], chs[3] // 2, name="refine4")(r4)
        p3 = FeatureFusionBlock(chs[2], chs[2] // 2, name="refine3")(p4, r3)
        p2 = FeatureFusionBlock(chs[1], chs[1] // 2, name="refine2")(p3, r2)
        # refinenet1 has expand=False in MidasNet_small: channels stay.
        p1 = FeatureFusionBlock(chs[0], chs[0], name="refine1")(p2, r1)

        # Output head (`scratch.output_conv`): conv 64->32, 2x upsample,
        # conv 32->32, relu, conv 32->1, relu.
        h = nn.Conv(f // 2, (3, 3), padding="SAME", name="head_conv1")(p1)
        h = _upsample2(h)
        h = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        h = nn.relu(h)
        out = h[..., 0]
        assert out.shape == (B, H, W), (out.shape, image.shape)
        return out


def init_params(key, size=256):
    model = MidasSmall()
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    return model.init(key, dummy)


def estimate_depth(params, image, model=None, size=256):
    """Full reference-parity wrapper (`DepthEstimator.cpp:35-112`):
    resize to MIDAS_INPUT_SIZE, run, resize back, min-max normalize to
    [0, 1]."""
    if model is None:
        model = MidasSmall()
    B, H, W, _ = image.shape
    x = jax.image.resize(image, (B, size, size, 3), method="bilinear")
    inv = model.apply(params, x)
    inv = jax.image.resize(inv, (B, H, W), method="bilinear")
    lo = jnp.min(inv, axis=(1, 2), keepdims=True)
    hi = jnp.max(inv, axis=(1, 2), keepdims=True)
    return (inv - lo) / jnp.maximum(hi - lo, 1e-6)
