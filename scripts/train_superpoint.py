"""Train SuperPoint on synthetic textured scenes and commit a checkpoint.

The reference consumes a frozen `superpoint_v1.onnx` it cannot produce
(`/root/reference/src/FeatureExtractor.cpp:22-44`); this environment has
no weights and no egress, so the framework trains its own: supervised
interest points on the same textured-room renders the pixels-in E2E tests
rasterize, plus synthetic-shapes corners and homographic descriptor
pairs (models/train_superpoint.py). Deterministic for a fixed seed.

Usage:
  python scripts/train_superpoint.py                # TPU, full recipe
  python scripts/train_superpoint.py --cpu --steps 20 --images 16  # smoke

Writes vslam_tpu/models/checkpoints/superpoint_synth.npz (float16, ~2.5 MB)
which `weights.load_or_init_superpoint` picks up automatically, then
reports detector repeatability + match precision on fresh held-out renders.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def evaluate(params, **kw):
    from vslam_tpu.models import train_superpoint as tsp

    return tsp.evaluate_detector(params, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--desc-weight", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from vslam_tpu.models import train_superpoint as tsp
    from vslam_tpu.models import weights as w

    out = args.out or os.path.join(w.TRAINED_SP_DIR, "superpoint_synth.npz")

    if args.eval_only:
        params = w.superpoint_params_from_npz(out)
        print("eval:", evaluate(params))
        return

    t0 = time.time()
    state, history = tsp.train_textured(
        steps=args.steps,
        batch=args.batch,
        num_images=args.images,
        seed=args.seed,
        lr=args.lr,
        desc_weight=args.desc_weight,
    )
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s "
          f"(final loss {history[-1][0]:.4f})")

    w.save_superpoint_npz(out, state.params)
    print(f"saved {out} ({os.path.getsize(out) / 1e6:.2f} MB)")
    print("eval:", evaluate(state.params))


if __name__ == "__main__":
    main()
