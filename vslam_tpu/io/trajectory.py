"""TUM-format trajectory export.

Rebuilds `save_trajectory` / `save_trajectory_full`
(`/root/reference/src/main.cpp:391-446`): positions-only and full
quaternion TUM trajectories (`timestamp tx ty tz [qx qy qz qw]`).
Quaternion conversion uses the batched Shepperd method in ops.se3.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import se3


def save_trajectory(path, timestamps, positions):
    """Positions-only TUM file (`src/main.cpp:391-401`): full 8-column TUM
    lines with identity quaternion, like the reference, so standard TUM
    evaluation tools accept the file."""
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, p in zip(np.asarray(timestamps), np.asarray(positions)):
            f.write(f"{ts:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 0 0 0 1\n")


def save_trajectory_full(path, timestamps, rotations, positions):
    """Full TUM file with quaternions (`src/main.cpp:404-446`)."""
    q = np.asarray(se3.quat_from_matrix(jnp.asarray(np.asarray(rotations), dtype=jnp.float32)))
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, p, qi in zip(np.asarray(timestamps), np.asarray(positions), q):
            f.write(
                f"{ts:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{qi[0]:.6f} {qi[1]:.6f} {qi[2]:.6f} {qi[3]:.6f}\n"
            )


def load_trajectory(path):
    """Read back either format -> (timestamps, positions, quats|None)."""
    ts, pos, quat = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            p = line.split()
            ts.append(float(p[0]))
            pos.append([float(x) for x in p[1:4]])
            if len(p) >= 8:
                quat.append([float(x) for x in p[4:8]])
    return (
        np.asarray(ts),
        np.asarray(pos),
        np.asarray(quat) if quat else None,
    )
