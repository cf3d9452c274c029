"""Checkpoint / resume for tracking state and runs.

The reference persists only the feature cache and final artifacts
(SURVEY.md §5 — no mid-run checkpointing). For long sequences and
production serving, this module snapshots the full `TrackState` pytree
(map store, keyframe ring, EKF, loop constraints) plus run metadata to a
single compressed npz, and restores it to resume tracking mid-sequence —
`run_tracking(..., state=restored)` continues where the snapshot left
off. Orbax is available in the image for sharded multi-host checkpoints;
npz keeps the single-chip path dependency-free and fast.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.config import SlamConfig
from vslam_tpu.core.state import TrackState, init_state

_FORMAT_VERSION = 1


def save_state(path: str, state: TrackState, metadata: Optional[dict] = None):
    """Snapshot a TrackState pytree (+ JSON metadata) to one npz file."""
    leaves, treedef = jax.tree.flatten(state)

    def to_np(x):
        # npz cannot store bfloat16; widen to f32 (load_state casts back
        # to the template dtype).
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16:
            x = x.astype(jnp.float32)
        return np.asarray(x)

    arrays = {f"leaf_{i}": to_np(x) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "format_version": _FORMAT_VERSION,
                "num_leaves": len(leaves),
                "metadata": metadata or {},
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str, config: SlamConfig) -> Tuple[TrackState, dict]:
    """Restore a TrackState; shapes must match the config's capacities."""
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
    if meta["format_version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['format_version']}")
    template = init_state(config)
    leaves, treedef = jax.tree.flatten(template)
    if meta["num_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {meta['num_leaves']} leaves, config expects {len(leaves)}"
        )
    restored = []
    for i, ref in enumerate(leaves):
        arr = z[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(ref.shape):
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != config shape {ref.shape}"
            )
        restored.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree.unflatten(treedef, restored), meta["metadata"]
