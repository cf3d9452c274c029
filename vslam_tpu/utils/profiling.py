"""Tracing / profiling utilities.

The reference has NO observability beyond a per-frame HUD (SURVEY.md §5);
this module adds the TPU-native equivalents: `jax.profiler` trace capture,
stage timers that respect the axon relay's broken `block_until_ready`
(completion is forced via tiny host readbacks), and a step-metrics
recorder that turns StepOutputs diagnostics into a structured log.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a `jax.profiler` trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree):
    """Block until a pytree's computation truly finished.

    On the axon relay `block_until_ready` returns at dispatch; fetching a
    scalar reduction is the only reliable barrier. Cheap: 4 bytes/leaf.
    """
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        x = leaves[0]
        if x.dtype == bool or "int" in str(x.dtype):
            float(jnp.sum(x.astype(jnp.int32)))
        else:
            float(jnp.sum(x).astype(jnp.float32))
    return tree


@dataclass
class StageTimer:
    """Accumulating wall-clock stage timer with completion forcing."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, result_tree=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            if "result" in box:
                force_completion(box["result"])
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            lines.append(
                f"{k:24s} {self.totals[k]*1000:9.1f} ms total "
                f"({self.totals[k]/max(self.counts[k],1)*1000:7.2f} ms x{self.counts[k]})"
            )
        return "\n".join(lines)


def step_metrics_log(outputs, path=None) -> List[dict]:
    """StepOutputs -> per-frame structured metrics (JSONL when `path`)."""
    o = outputs
    n = np.asarray(o.num_matches).shape[0]
    rows = []
    for i in range(n):
        rows.append(
            {
                "frame": i,
                "matches": int(np.asarray(o.num_matches)[i]),
                "inliers": int(np.asarray(o.num_inliers)[i]),
                "tracked": int(np.asarray(o.num_tracked)[i]),
                "keyframe": bool(np.asarray(o.is_keyframe)[i]),
                "used_3d3d": bool(np.asarray(o.used_3d3d)[i]),
                "tracking_ok": bool(np.asarray(o.tracking_ok)[i]),
            }
        )
    if path:
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return rows


def summarize_run(outputs) -> dict:
    o = outputs
    out = {
        "frames": int(np.asarray(o.num_matches).shape[0]),
        "mean_matches": float(np.asarray(o.num_matches).mean()),
        "mean_inliers": float(np.asarray(o.num_inliers).mean()),
        "mean_tracked": float(np.asarray(o.num_tracked).mean()),
        "keyframes": int(np.asarray(o.is_keyframe).sum()),
        "tracked_frac": float(np.asarray(o.tracking_ok).mean()),
        "used_3d3d_frac": float(np.asarray(o.used_3d3d).mean()),
    }
    # Branch-execution counts + epipolar diagnostics (fields added round 3;
    # getattr so pre-existing FakeOuts-style stubs keep working).
    for name in ("bridged", "recovered"):
        v = getattr(o, name, None)
        if v is not None:
            out[name + "_count"] = int(np.asarray(v).sum())
    # Epipolar means average only frames where the F-gate actually RAN
    # (epi_before > 0): frames with the gate off / no model / bootstrap
    # emit 0.0 placeholders that would dilute the HUD-parity diagnostic
    # (`src/Slam.cpp:889-904` computes the mean over gated frames only).
    eb = getattr(o, "epi_before", None)
    ea = getattr(o, "epi_after", None)
    if eb is not None and ea is not None:
        eb = np.asarray(eb)
        ea = np.asarray(ea)
        ran = eb > 0
        out["fgate_frames"] = int(ran.sum())
        out["epi_before_mean_px"] = (
            float(eb[ran].mean()) if ran.any() else 0.0
        )
        out["epi_after_mean_px"] = (
            float(ea[ran].mean()) if ran.any() else 0.0
        )
    return out
