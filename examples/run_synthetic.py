"""One-command end-to-end demo on a generated synthetic sequence.

Generates a TUM-format dataset (rendered room depth + ground truth +
feature cache) under a temp/output directory, then drives the FULL app
path — `examples/run_tum.py`'s pipeline: cache-replay frontend, tracking
scan, RTS smoothing, PGO/BA backend, dense fusion, cloud epilogue,
ATE/RPE evaluation, trajectory + PLY exports — exactly as a user would
on real TUM data (no datasets or model weights exist in this image;
the reference validates on TUM fr2_pioneer_slam3, `README.md:5`).

Usage:
  python examples/run_synthetic.py              # CPU, 36 frames
  python examples/run_synthetic.py --frames 120 --out /tmp/demo --render
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--out", default="out/synthetic_demo")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: force CPU)")
    ap.add_argument("--render", action="store_true", help="render viewer frames")
    ap.add_argument("--mono", action="store_true", help="monocular mode")
    ap.add_argument("--poisson", action="store_true",
                    help="Poisson mesh the dense cloud at the end")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from vslam_tpu.data import synthetic

    data_dir = os.path.join(args.out, "dataset")
    cache = os.path.join(data_dir, "sp_cache.npz")
    print(f"[run_synthetic] generating {args.frames}-frame room sequence -> {data_dir}")
    seq = synthetic.make_room_sequence(num_frames=args.frames, seed=args.seed)
    synthetic.write_tum_sequence(data_dir, seq, write_cache="sp_cache.npz")

    from examples import run_tum

    argv = [
        data_dir,
        "--out", os.path.join(args.out, "run"),
        "--cache", cache,
        "--frame-step", "1",
        "--ba",
    ]
    if not args.tpu:
        argv.append("--cpu")
    if args.render:
        argv.append("--render")
    if args.mono:
        argv.append("--mono")
    if args.poisson:
        argv.append("--poisson")
    print(f"[run_synthetic] run_tum {' '.join(argv)}")
    sys.argv = ["run_tum.py"] + argv
    run_tum.main()


if __name__ == "__main__":
    main()
