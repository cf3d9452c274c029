"""Frontend latency breakdown: SuperPoint conv forward vs decode stages.

Times (a) the conv backbone alone, (b) heatmap decode (softmax + d2s +
window NMS), (c) tile top-k, (d) bilinear descriptor sampling, and (e) the
full extract pipeline — each as one jitted program scanned over chunks,
with a readback barrier (axon relay; CLAUDE.md).

Usage: python scripts/bench_frontend_components.py [--cpu] [--batch 32]
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
    from vslam_tpu.ops import nms

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

    def timed(name, chunk_fn):
        @jax.jit
        def prog(chain, chunks):
            def step(cr, x):
                return chunk_fn(cr, x), ()

            out, _ = jax.lax.scan(step, chain, chunks)
            return out

        r = float(prog(jnp.asarray(0.0), imgs))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(prog(jnp.asarray(r % 1.0, jnp.float32), imgs))
            reps.append(time.perf_counter() - t0)
        per_frame = float(np.median(reps)) / (B * C)
        print(f"{name:34s} {per_frame*1e6:9.1f} us/frame  ({B*C/float(np.median(reps)):8.1f} fps)")

    def conv_only(cr, x):
        im = x.astype(jnp.float32) / 255.0 + 0.0 * cr
        semi, desc_c = model.apply(params, im)
        return jnp.sum(semi[..., 0]) * 1e-9 + cr * 0.5

    timed("conv backbone + heads", conv_only)

    semi0, desc0 = model.apply(params, imgs[0].astype(jnp.float32) / 255.0)

    def decode_only(cr, x):
        heat = nms.decode_heatmap(semi0 + cr * 1e-9)
        heat = nms.nms_local_max(
            heat, radius=cfg.frontend.sp_nms_radius,
            conf_threshold=cfg.frontend.sp_confidence_threshold,
        )
        return jnp.sum(heat) * 1e-9 + cr * 0.5

    timed("softmax+d2s+window NMS", decode_only)

    heat0 = nms.nms_local_max(
        nms.decode_heatmap(semi0), radius=cfg.frontend.sp_nms_radius,
        conf_threshold=cfg.frontend.sp_confidence_threshold,
    )

    def topk_only(cr, x):
        kps = nms.topk_keypoints(
            heat0 + cr * 1e-12, max_keypoints=cfg.frontend.max_keypoints
        )
        return jnp.sum(kps.score) * 1e-9 + cr * 0.5

    timed("tiled top-k", topk_only)

    kp0 = nms.topk_keypoints(heat0, max_keypoints=cfg.frontend.max_keypoints)

    def sample_only(cr, x):
        d = nms.sample_descriptors(desc0, kp0.xy + cr * 1e-9, kp0.valid)
        return jnp.sum(d) * 1e-9 + cr * 0.5

    timed("bilinear desc sampling", sample_only)

    def full(cr, x):
        im = x.astype(jnp.float32) / 255.0 + 0.0 * cr
        semi, desc_c = model.apply(params, im)
        kps, desc = nms.extract_keypoints(
            semi, desc_c, max_keypoints=cfg.frontend.max_keypoints,
            radius=cfg.frontend.sp_nms_radius,
            conf=cfg.frontend.sp_confidence_threshold,
        )
        return jnp.sum(kps.score) + jnp.sum(desc) * 1e-6 + cr * 0.5

    timed("FULL extract pipeline", full)


if __name__ == "__main__":
    main()
