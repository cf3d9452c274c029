#!/usr/bin/env python
"""Batched multi-sequence runner: N sequences across the device mesh.

The production scaling configuration (`BASELINE.json` "batched
multi-sequence"): one tracking scan per device via shard_map (efficient
lax.cond branches), data parallel over sequences — e.g. all TUM fr1/fr2/
fr3 sequences across a v4-8. With fewer datasets than devices, synthetic
sequences fill the remainder (throughput demo mode).

Usage:
  python examples/run_batch.py [dataset_dir ...] [--devices N] [--cpu]
      [--frames N] [--frame-step 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="*", help="TUM sequence directories")
    ap.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="force a virtual CPU mesh of this size")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--frame-step", type=int, default=3)
    args = ap.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
    import jax

    if args.cpu or args.virtual_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.core import frontend as fe, pipeline
    from vslam_tpu.data import loader as loader_mod, synthetic, tum
    from vslam_tpu.eval import ate as ate_mod
    from vslam_tpu.parallel import mesh as pmesh

    cfg = SlamConfig()
    c = cfg.camera
    n_dev = args.devices or len(jax.devices())
    m = pmesh.make_mesh(n_dev)
    print(f"[mesh] {n_dev} device(s): {jax.devices()[:n_dev]}")

    # Build one FrameFeatures stream per device slot.
    streams, names, gts = [], [], []
    front = None
    for d in args.datasets[:n_dev]:
        ld = loader_mod.open_sequence(d, width=c.width, height=c.height,
                                      depth_scale=c.depth_scale)
        meta = tum.load_sequence(d)
        idxs = list(range(0, len(ld), args.frame_step))[: args.frames]
        grays, depths, stamps = [], [], []
        for i in idxs:
            rgb, depth, ts = ld.get(i)
            grays.append(np.mean(rgb, -1).astype(np.float32) / 255.0)
            depths.append(depth)
            stamps.append(ts)
        if front is None:
            front = fe.SuperPointFrontend(cfg)
        streams.append(
            fe.extract_sequence(front, np.stack(grays), np.stack(depths),
                                np.asarray(stamps))
        )
        names.append(os.path.basename(d.rstrip("/")))
        gts.append(meta.gt)
    while len(streams) < n_dev:
        i = len(streams)
        seq = synthetic.make_sequence(
            num_frames=args.frames, max_keypoints=cfg.frontend.max_keypoints,
            desc_dim=cfg.frontend.descriptor_dim,
            fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
            seed=i, num_landmarks=4000,
        )
        streams.append(pipeline.features_from_synthetic(seq))
        names.append(f"synthetic-{i}")
        gts.append(np.concatenate(
            [seq.timestamps[:, None], seq.t,
             np.zeros((len(seq.timestamps), 4))], axis=1))

    frames = jax.tree.map(lambda *xs: jnp.stack(xs), *streams)
    states = pmesh.shard_batched(pmesh.replicate_state(cfg, n_dev), m)
    frames = pmesh.shard_batched(frames, m)

    # Warm + timed
    fs, outs = pmesh.sharded_tracking_scan(states, frames, cfg, m)
    float(jnp.sum(outs.t))
    t0 = time.perf_counter()
    fs, outs = pmesh.sharded_tracking_scan(states, frames, cfg, m)
    float(jnp.sum(outs.t))
    dt = time.perf_counter() - t0
    total = n_dev * args.frames
    print(f"[batch] {total} frames across {n_dev} device(s) in {dt:.2f}s "
          f"= {total / dt:.1f} frames/s aggregate")

    for i, name in enumerate(names):
        t_est = np.asarray(outs.t)[i]
        ts = np.asarray(frames.timestamp)[i]
        if gts[i] is not None:
            res = ate_mod.compute_ate(ts, t_est, gts[i][:, 0], gts[i][:, 1:4],
                                      with_scale=False)
            print(f"  {name}: ATE RMSE {res.rmse:.4f} m ({res.num_pairs} pairs)")


if __name__ == "__main__":
    sys.exit(main())
