"""Experiments for the SuperPoint stem (conv1a/conv1b/pool/conv2a/conv2b):
alternative formulations vs stock lax.conv, timed on-device.

conv1a has C_in=1 — on the MXU that's <2% utilization; as an explicit
9-tap stencil it is VPU broadcast-FMA work. conv1b/2a/2b have N=64
output channels (50% MXU lane ceiling).

Usage: python scripts/bench_stem_variants.py [--cpu] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.models import superpoint as sp

    cfg = SlamConfig()
    c = cfg.camera
    B, C = args.batch, args.chunks
    H, W = c.height, c.width
    params = sp.init_params(jax.random.PRNGKey(0), height=H, width=W)
    p = params["params"]
    bf = jnp.bfloat16

    w1 = p["conv1a"]["kernel"].astype(bf)  # (3,3,1,64)
    b1 = p["conv1a"]["bias"].astype(bf)
    w2 = p["conv1b"]["kernel"].astype(bf)  # (3,3,64,64)
    b2 = p["conv1b"]["bias"].astype(bf)

    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (C, B, H, W, 1), dtype=np.uint8)
    )
    print(f"device={jax.devices()[0]}  batch={B} chunks={C}")

    def conv_stock(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b

    def conv1a_stencil(x, w, b):
        """x: (B,H,W) single channel; 9 shifted broadcast FMAs."""
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
        acc = jnp.broadcast_to(b, x.shape + (64,)).astype(bf)
        out = acc
        for dy in range(3):
            for dx in range(3):
                tap = xp[:, dy : dy + H, dx : dx + W]  # (B,H,W)
                out = out + tap[..., None] * w[dy, dx, 0][None, None, None, :]
        return out

    def timed(name, body):
        @jax.jit
        def prog(chunks, chain0):
            def step(cr, xu8):
                x = (xu8.astype(jnp.float32) / 255.0).astype(bf) + cr.astype(bf)
                return jnp.sum(body(x).astype(jnp.float32)), ()

            out, _ = jax.lax.scan(step, chain0, chunks)
            return out

        r = float(prog(imgs, jnp.asarray(0.0, jnp.float32)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog(imgs, jnp.asarray(r % 1.0, jnp.float32)))
            reps.append(time.perf_counter() - t0)
        dt = float(np.median(reps)) / (B * C)
        print(f"{name:34s} {dt*1e6:9.1f} us/frame")
        return dt

    # Baselines
    timed("conv1a stock", lambda x: jax.nn.relu(conv_stock(x, w1, b1)))
    timed("conv1a stencil", lambda x: jax.nn.relu(conv1a_stencil(x[..., 0], w1, b1)))

    def stem_stock(x):
        x = jax.nn.relu(conv_stock(x, w1, b1))
        x = jax.nn.relu(conv_stock(x, w2, b2))
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    def stem_stencil(x):
        x = jax.nn.relu(conv1a_stencil(x[..., 0], w1, b1))
        x = jax.nn.relu(conv_stock(x, w2, b2))
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    timed("stem stock (1a+1b+pool)", stem_stock)
    timed("stem stencil-1a", stem_stencil)

    # Correctness: stencil vs stock on one chunk
    x0 = (imgs[0].astype(jnp.float32) / 255.0).astype(bf)
    a = np.asarray(conv_stock(x0, w1, b1), np.float32)
    barr = np.asarray(conv1a_stencil(x0[..., 0], w1, b1), np.float32)
    print("conv1a stencil max |delta|:", np.abs(a - barr).max())


if __name__ == "__main__":
    main()
