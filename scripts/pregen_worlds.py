"""Pre-populate the rendered-world disk cache (`data/worldcache.py`).

The bench's wide-ATE, stress and reference-scale long stages each need
rasterized synthetic sequences that cost ~2 min of single-core host time
apiece; generating them inside the driver's budgeted bench run would eat
the budget. Run this out-of-band (it only uses numpy — no JAX device) so
`bench.py` finds every dataset on disk.

Usage: python scripts/pregen_worlds.py [--tiny] [--seeds 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vslam_tpu.config import SlamConfig, tiny_test_config  # noqa: E402
from vslam_tpu.data import worldcache as wc  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seeds", type=int, default=10,
                    help="image worlds seeds [0, N) (bench ate_wide uses 10)")
    ap.add_argument("--chunk", type=int, default=0)
    args = ap.parse_args()

    # EXACTLY the bench's geometry (bench.py sizing block).
    if args.tiny:
        cfg = tiny_test_config()
        n_frames, lm, radius, long_frames = 16, 600, 2.0, 48
    else:
        cfg = SlamConfig()
        n_frames, lm, radius, long_frames = 848, 6000, 3.0, 2560
    c = cfg.camera
    CHUNK = args.chunk or (4 if args.tiny else 128)
    S = max((n_frames + CHUNK - 1) // CHUNK, 1)
    nC = S * CHUNK
    S_l = (long_frames + CHUNK - 1) // CHUNK
    W, H = c.width, c.height
    intr = dict(width=W, height=H, fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy)

    def note(msg):
        print(f"[pregen +{time.time() - t0:5.0f}s] {msg}", flush=True)

    t0 = time.time()
    fkw = dict(fx=float(c.fx), fy=float(c.fy), cx=float(c.cx), cy=float(c.cy))
    for seed in range(args.seeds):
        tag = wc.image_world_tag(nC, W, H, seed, lm, radius,
                                 c.fx, c.fy, c.cx, c.cy)
        note(f"world seed={seed} ({'cached' if wc.is_cached(tag) else 'render'})")
        wc.image_world(nC, seed=seed, num_landmarks=lm, radius=radius, **intr)

    # Held-out v2-family worlds (bench ate_holdout uses seeds 40-41).
    for seed in (40, 41):
        tag = wc.image_world_tag(nC, W, H, seed, lm, radius,
                                 c.fx, c.fy, c.cx, c.cy, family="v2")
        note(f"holdout v2 seed={seed} "
             f"({'cached' if wc.is_cached(tag) else 'render'})")
        wc.image_world(nC, seed=seed, num_landmarks=lm, radius=radius,
                       family="v2", **intr)

    # Stress kwargs mirror bench.py's STRESS_KW table exactly.
    s101 = dict(seed=101, loops=1.0)
    s202 = dict(seed=202, loops=2.5, pause=(0.3, 0.02), dropout=(0.6, 0.01))

    tag = wc.stress_world_tag(nC, W, H, lm, "s101_l1", **fkw, **s101)
    note(f"stress ({'cached' if wc.is_cached(tag) else 'render'})")
    wc.stress_world("s101_l1", nC, num_landmarks=lm, **intr, **s101)

    tag = wc.stress_world_tag(S_l * CHUNK, W, H, lm, "s202_l2.5",
                              **fkw, **s202)
    note(f"long stress ({'cached' if wc.is_cached(tag) else 'render'})")
    wc.stress_world("s202_l2.5", S_l * CHUNK, num_landmarks=lm, **intr,
                    **s202)
    note("done")


if __name__ == "__main__":
    main()
