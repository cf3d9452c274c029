"""Train the monocular DepthNet on synthetic RGB-D worlds and commit a
checkpoint.

The reference's monocular depth is a frozen MiDaS ONNX checkpoint
(`/root/reference/src/DepthEstimator.cpp:15-112`) that this image does
not ship; the renderer already emits ground-truth metric depth, so —
exactly like SuperPoint (scripts/train_superpoint.py) — the framework
trains its own (models/train_depthnet.py). Deterministic for a fixed seed.

Usage:
  python scripts/train_depthnet.py                  # TPU, full recipe
  python scripts/train_depthnet.py --cpu --steps 20 --images 8   # smoke

Writes vslam_tpu/models/checkpoints/depthnet_synth.npz (float16, ~1 MB),
auto-discovered by `weights.load_or_init_depthnet`, then reports held-out
depth metrics on fresh default-geometry worlds.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--images", type=int, default=448)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from vslam_tpu.models import train_depthnet as tdn
    from vslam_tpu.models import weights as w

    out = args.out or os.path.join(w.TRAINED_SP_DIR, "depthnet_synth.npz")

    if args.eval_only:
        params = w.depthnet_params_from_npz(out)
        print("eval:", tdn.evaluate(params))
        return

    t0 = time.time()
    state, history = tdn.train(
        steps=args.steps,
        batch=args.batch,
        num_images=args.images,
        seed=args.seed,
        lr=args.lr,
    )
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s "
          f"(final loss {history[-1]:.4f})")

    w.save_depthnet_npz(out, state.params)
    print(f"saved {out} ({os.path.getsize(out) / 1e6:.2f} MB)")
    print("eval:", tdn.evaluate(state.params))


if __name__ == "__main__":
    main()
