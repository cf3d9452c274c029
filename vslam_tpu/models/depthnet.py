"""Small monocular depth network trained on the synthetic RGB-D worlds.

The reference ships MiDaS v2.1-small for monocular depth
(`/root/reference/src/DepthEstimator.cpp:15-112`) but the capability is
latent — the session exists, `Frame::estimate_depth` is never called, and
this image has no MiDaS checkpoint to load (`models/weights.py` falls
back to random init). Like SuperPoint (trained from scratch on the
synthetic worlds when no real weights were available), depth gets the
same treatment: a compact encoder-decoder is trained on (gray render ->
ground-truth metric depth) pairs from the same room-world family the
benchmarks rasterize, and the committed checkpoint
(`models/checkpoints/depthnet_synth.npz`) drives the mono pipeline's
scale chain (`src/Slam.cpp:162-207` consumes depth for scale; the MiDaS
design point). When a real `midas_v21_small_256.pt` exists, the full
MiDaS model (`models/midas.py`) remains the drop-in upgrade.

Design (TPU-first):
- gray input at HALF camera resolution (320x240 for the VGA bench
  camera); all convs, static shapes, bf16 compute on the MXU.
- U-shaped: 4 stride-2 stages (24/48/96/128) + 2 skip-fused upsample
  stages; predicts LOG metric depth at 1/4 of net input = 1/8 of full
  camera resolution (depth is smooth off plane boundaries).
- ~0.4 GFLOP/frame — noise next to the VGA SuperPoint frontend, so mono
  throughput keeps its margin.

Keypoint depth is read by bilinear sampling the log-depth map at kp/8
and exponentiating (`sample_depth_at_keypoints` analogue for the
predicted map).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# Full-camera-resolution pixels per predicted-depth cell: the net eats
# gray downsampled 2x and predicts at 1/4 of its input.
DOWNSAMPLE = 2
OUT_STRIDE = DOWNSAMPLE * 4  # 8 full-res pixels per output cell


class DepthNet(nn.Module):
    """Gray (B, H, W, 1) in [0,1] -> log metric depth (B, H/4, W/4)."""

    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        B, H, W, _ = x.shape
        if H % 16 or W % 16:
            raise ValueError(f"DepthNet input must be a multiple of 16, got {H}x{W}")
        x = x.astype(dt)
        c1 = nn.relu(nn.Conv(24, (3, 3), strides=(2, 2), dtype=dt, name="down1")(x))
        c2 = nn.relu(nn.Conv(48, (3, 3), strides=(2, 2), dtype=dt, name="down2")(c1))
        c3 = nn.relu(nn.Conv(96, (3, 3), strides=(2, 2), dtype=dt, name="down3")(c2))
        c4 = nn.relu(nn.Conv(128, (3, 3), strides=(2, 2), dtype=dt, name="down4")(c3))
        c4 = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="mid")(c4))

        u3 = _up2(c4)
        u3 = nn.relu(
            nn.Conv(96, (3, 3), dtype=dt, name="up3")(
                jnp.concatenate([u3, c3], axis=-1)
            )
        )
        u2 = _up2(u3)
        u2 = nn.relu(
            nn.Conv(64, (3, 3), dtype=dt, name="up2")(
                jnp.concatenate([u2, c2], axis=-1)
            )
        )
        out = nn.Conv(1, (3, 3), dtype=jnp.float32, name="head")(
            u2.astype(jnp.float32)
        )
        return out[..., 0]  # (B, H/4, W/4) log depth


def _up2(x):
    """2x nearest-neighbor upsample (cheap; the following conv smooths)."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def init_params(key, height=240, width=320):
    model = DepthNet()
    dummy = jnp.zeros((1, height, width, 1), jnp.float32)
    return model.init(key, dummy)


def predict_log_depth(params, gray_u8, model=None):
    """(C, H, W) uint8 full-resolution gray -> (C, ~H/8, ~W/8) log depth.

    Downsamples 2x by 2x2 mean (the training distribution: full-res
    renders box-downsampled), edge-pads to the net's x16 requirement
    (cropped back after — the same move the reference makes for
    SuperPoint's x8, `src/FeatureExtractor.cpp:90-105`), then runs the
    net. Output covers ceil(H/2 / 4) x ceil(W/2 / 4) cells.
    """
    if model is None:
        model = DepthNet()
    C, H, W = gray_u8.shape
    g = gray_u8.astype(jnp.float32) / 255.0
    Hh, Wh = H // 2, W // 2
    g = g[:, : Hh * 2, : Wh * 2].reshape(C, Hh, 2, Wh, 2).mean(axis=(2, 4))
    Hp = -(-Hh // 16) * 16
    Wp = -(-Wh // 16) * 16
    if (Hp, Wp) != (Hh, Wh):
        g = jnp.pad(g, ((0, 0), (0, Hp - Hh), (0, Wp - Wh)), mode="edge")
    out = model.apply(params, g[..., None])
    return out[:, : -(-Hh // 4), : -(-Wh // 4)]


def sample_log_depth_at_keypoints(log_depth, kp_xy):
    """Bilinear-sample per-frame log-depth maps at full-res keypoint
    pixels -> metric depth (C, K). `log_depth` (C, Hs, Ws) is at
    OUT_STRIDE; cell centers sit at full-res pixel (i + 0.5) * OUT_STRIDE
    - 0.5."""
    from vslam_tpu.ops.camera import bilinear_sample

    uv = (kp_xy + 0.5) / OUT_STRIDE - 0.5
    ld = jax.vmap(bilinear_sample)(log_depth, uv)
    return jnp.exp(ld)
