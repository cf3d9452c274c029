"""Disk cache for rasterized synthetic worlds.

Rasterizing an 896-frame room sequence costs ~2 min of single-core host
time (`synthetic.render_textured` + analytic depth, ~195 ms/frame at
VGA), which made wide ATE evidence (>= 10 worlds, VERDICT r3 #5) and the
reference-scale long run unaffordable inside the driver's bench budget.
Worlds are pure functions of their generation parameters, so they are
cached as npz keyed by every parameter + `synthetic.DATA_VERSION` (bump
it whenever any renderer/trajectory change alters outputs).

Used by `bench.py` (loads in seconds on the driver's budgeted run) and
`scripts/pregen_worlds.py` (populates the cache out-of-band).
"""

from __future__ import annotations

import os

import numpy as np

from vslam_tpu.data import synthetic

CACHE_DIR = os.path.expanduser("~/.cache/vslam_worlds")

# Keys persisted per world (the rest of make_*_sequence's dict — e.g. the
# landmark world object — is not needed by consumers).
IMAGE_KEYS = ("timestamps", "R", "t", "gray", "depth_u16")
STRESS_KEYS = IMAGE_KEYS + ("accel", "moving")


def _path(tag: str) -> str:
    return os.path.join(CACHE_DIR, f"v{synthetic.DATA_VERSION}_{tag}.npz")


def is_cached(tag: str) -> bool:
    return os.path.exists(_path(tag))


def _load_or_make(tag, keys, maker):
    path = _path(tag)
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        return {k: z[k] for k in z.files}
    d = maker()
    out = {k: np.asarray(d[k]) for k in keys if d.get(k) is not None}
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = path + ".tmp.npz"  # ends in .npz so np.savez won't rename
        np.savez(tmp, **out)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort
    return out


def image_world_tag(n, width, height, seed, num_landmarks, radius) -> str:
    return f"img_n{n}_{width}x{height}_s{seed}_lm{num_landmarks}_r{radius}"


def stress_world_tag(n, width, height, num_landmarks, variant: str) -> str:
    """`variant` encodes the non-default stress args (seed/loops/...)."""
    return f"stress_n{n}_{width}x{height}_lm{num_landmarks}_{variant}"


def image_world(n, *, width, height, fx, fy, cx, cy, seed, num_landmarks,
                radius):
    """Disk-cached `synthetic.make_image_sequence` (gray-only)."""
    tag = image_world_tag(n, width, height, seed, num_landmarks, radius)
    return _load_or_make(
        tag, IMAGE_KEYS,
        lambda: synthetic.make_image_sequence(
            n, width=width, height=height, fx=fx, fy=fy, cx=cx, cy=cy,
            seed=seed, num_landmarks=num_landmarks, radius=radius,
            with_rgb=False,
        ),
    )


def stress_world(variant, n, *, width, height, fx, fy, cx, cy,
                 num_landmarks, **kw):
    """Disk-cached `synthetic.make_stress_image_sequence`."""
    tag = stress_world_tag(n, width, height, num_landmarks, variant)
    return _load_or_make(
        tag, STRESS_KEYS,
        lambda: synthetic.make_stress_image_sequence(
            n, width=width, height=height, fx=fx, fy=fy, cx=cx, cy=cy,
            num_landmarks=num_landmarks, **kw,
        ),
    )
