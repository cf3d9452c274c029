"""Per-layer latency of the SuperPoint backbone: time cumulative prefixes
of the conv stack (each as a scanned jitted program with a readback
barrier) and difference them to attribute cost per layer.

Usage: python scripts/bench_conv_layers.py [--cpu] [--batch 32]
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
    import flax.linen as nn
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.models import superpoint as sp

    cfg = SlamConfig()
    c = cfg.camera
    B, C = args.batch, args.chunks
    params = sp.init_params(jax.random.PRNGKey(0), height=c.height, width=c.width)
    model = sp.SuperPoint()

    imgs = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (C, B, c.height, c.width, 1), dtype=np.uint8
        )
    )
    print(f"device={jax.devices()[0]}  batch={B} chunks={C}")

    # Layer plan mirroring SuperPoint.__call__ (models/superpoint.py).
    PLAN = [
        ("conv1a", 64, False),
        ("conv1b", 64, True),   # pool after
        ("conv2a", 64, False),
        ("conv2b", 64, True),
        ("conv3a", 128, False),
        ("conv3b", 128, True),
        ("conv4a", 128, False),
        ("conv4b", 128, False),
        ("convPa+Pb", 0, False),
        ("convDa+Db", 0, False),
    ]

    p = params["params"]
    dt_bf = jnp.bfloat16

    def apply_conv(x, name):
        w = p[name]["kernel"].astype(dt_bf)
        b = p[name]["bias"].astype(dt_bf)
        k = w.shape[0]
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return y

    def prefix_fn(n_layers):
        def run(images_u8, carry):
            x = (images_u8.astype(jnp.float32) / 255.0).astype(dt_bf) + carry.astype(dt_bf)
            acc = jnp.asarray(0.0, jnp.float32)
            for name, ch, pool in PLAN[:n_layers]:
                if name == "convPa+Pb":
                    cPa = nn.relu(apply_conv(x, "convPa"))
                    acc = acc + jnp.sum(apply_conv(cPa, "convPb").astype(jnp.float32))
                elif name == "convDa+Db":
                    cDa = nn.relu(apply_conv(x, "convDa"))
                    acc = acc + jnp.sum(apply_conv(cDa, "convDb").astype(jnp.float32))
                else:
                    x = nn.relu(apply_conv(x, name))
                    if pool:
                        x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return acc + jnp.sum(x.astype(jnp.float32))

        return run

    def timed(n_layers):
        body = prefix_fn(n_layers)

        @jax.jit
        def prog(chunks, chain0):
            def step(cr, x):
                return body(x, cr * 1e-20), ()

            out, _ = jax.lax.scan(step, chain0, chunks)
            return out

        r = float(prog(imgs, jnp.asarray(0.0, jnp.float32)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog(imgs, jnp.asarray(r % 1.0, jnp.float32)))
            reps.append(time.perf_counter() - t0)
        return float(np.median(reps)) / (B * C)

    prev = 0.0
    # Heads run sequentially here (convD on convP output) — fine for
    # attribution since each prefix adds exactly one head.
    for i in range(1, len(PLAN) + 1):
        name = PLAN[i - 1][0]
        dt = timed(i)
        print(f"thru {name:10s} {dt*1e6:9.1f} us/frame  (+{(dt-prev)*1e6:7.1f})")
        prev = dt


if __name__ == "__main__":
    main()
