"""Multi-chip execution: batched multi-sequence data parallelism over a
`jax.sharding.Mesh`.

The reference's only concurrency is a 3-thread shared-memory pipeline
(SURVEY.md §2 C35); it has no multi-device story. The TPU-native scaling
axis (per `BASELINE.json` "batched multi-sequence") is data parallelism
over independent sequences: each device tracks its own sequence(s), the
tracking scan vmaps over the batch, and the SuperPoint frontend shards its
frame batch the same way. Collectives are only needed for metric
aggregation (`psum` on diagnostics) — laid out so they ride ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vslam_tpu.config import SlamConfig
from vslam_tpu.core.state import FrameFeatures, TrackState, init_state
from vslam_tpu.core.tracking import make_scan_step


def make_mesh(n_devices=None, axis="seq"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate_state(config: SlamConfig, batch: int) -> TrackState:
    """A batch of independent per-sequence tracking states."""
    single = init_state(config)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), single)


def shard_batched(tree, mesh: Mesh, axis="seq"):
    """Place a batched pytree with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, tree)


def batched_tracking_scan(states: TrackState, frames: FrameFeatures, config: SlamConfig, seed: int = 42):
    """Multi-sequence batch ON ONE DEVICE — the production per-chip
    throughput configuration (SURVEY §2 checklist).

    Delegates to the hand-batched step (`core.tracking_batched`): cheap
    always-on math is vmapped (batched MXU matmuls), rare expensive
    branches are hoisted behind scalar `lax.cond(any(...))` so they are
    skipped outright when no sequence needs them. The naive
    `vmap(scan(step))` (kept below as `vmapped_tracking_scan` for
    equivalence tests) lowers every cond to a both-branch select and
    collapses to ~37 fps aggregate.
    """
    from vslam_tpu.core.tracking_batched import batched_tracking_scan as hb

    return hb(states, frames, config, seed=seed)


@functools.partial(jax.jit, static_argnames=("config", "seed"))
def vmapped_tracking_scan(states: TrackState, frames: FrameFeatures, config: SlamConfig, seed: int = 42):
    """Reference implementation: vmap(scan(step)) — correct but slow
    (every lax.cond lowers to a both-branch select under vmap)."""
    step = make_scan_step(config, seed=seed)

    def one_seq(state, seq_frames):
        return jax.lax.scan(step, state, seq_frames)

    return jax.vmap(one_seq)(states, frames)


def sharded_tracking_scan(states: TrackState, frames: FrameFeatures,
                          config: SlamConfig, mesh: Mesh, seed: int = 42,
                          axis: str = "seq"):
    """One sequence per device via shard_map: each device runs its own
    UNBATCHED tracking scan, so data-dependent branches stay efficient
    `lax.cond`s (unlike vmap, which lowers them to both-branch selects).

    `states`/`frames` have leading batch dim == mesh size.
    """
    B = frames.timestamp.shape[0]
    n_dev = mesh.devices.size
    if B != n_dev:
        raise ValueError(
            f"sharded_tracking_scan needs batch == mesh size (got B={B}, "
            f"mesh={n_dev}); use batched_tracking_scan for within-device batching"
        )
    step = make_scan_step(config, seed=seed)

    def per_device(state_b, frames_b):
        # Local shard has batch 1: squeeze, scan, re-expand.
        state = jax.tree.map(lambda x: x[0], state_b)
        seq = jax.tree.map(lambda x: x[0], frames_b)
        fs, outs = jax.lax.scan(step, state, seq)
        return (
            jax.tree.map(lambda x: x[None], fs),
            jax.tree.map(lambda x: x[None], outs),
        )

    specs_in = P(axis)
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(specs_in, specs_in),
        out_specs=(specs_in, specs_in),
        check_vma=False,
    )
    return fn(states, frames)


def sharded_coupled_run(params, states, dense, gray, depth_u16, timestamps,
                        frame_ids, stationary, config: SlamConfig,
                        mesh: Mesh, axis: str = "seq", seed: int = 42):
    """The FULL coupled pipeline — uint8 frames -> SuperPoint -> decode ->
    keypoint depth -> tracking scan -> dense voxel fusion
    (`core.coupled.run_coupled`) — one sequence per device via shard_map.

    This is the production multi-chip configuration: pure data
    parallelism over independent sequences (SURVEY §2 checklist), each
    device running the complete single-sequence program so data-dependent
    branches stay efficient `lax.cond`s. SuperPoint parameters are
    replicated (`P()`); all sequence data is sharded on the leading batch
    axis. No cross-device communication is needed inside the pipeline —
    collectives only aggregate diagnostics (`batched_diagnostics`).

    Args have the single-sequence `run_coupled` layout plus a leading
    batch axis == mesh size: gray/depth (B, S, C, H, W), timestamps/
    frame_ids/stationary (B, S, C); states/dense leaves (B, ...).
    Returns (states, dense, outs) with leaves (B, ...)/(B, S*C, ...).
    """
    from vslam_tpu.core import coupled as coupled_mod

    B = gray.shape[0]
    n_dev = mesh.devices.size
    if B != n_dev:
        raise ValueError(
            f"sharded_coupled_run needs batch == mesh size (got B={B}, "
            f"mesh={n_dev}); use run_coupled_batched for within-device batching"
        )

    def per_device(params, st_b, dn_b, g_b, d_b, ts_b, fid_b, stat_b):
        st = jax.tree.map(lambda x: x[0], st_b)
        dn = jax.tree.map(lambda x: x[0], dn_b)
        st_f, dn_f, outs = coupled_mod.run_coupled(
            params, st, dn, g_b[0], d_b[0], None, ts_b[0], fid_b[0],
            stat_b[0], config, seed,
        )
        expand = lambda t: jax.tree.map(lambda x: x[None], t)  # noqa: E731
        return expand(st_f), expand(dn_f), expand(outs)

    sh = P(axis)
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), sh, sh, sh, sh, sh, sh, sh),
        out_specs=(sh, sh, sh),
        check_vma=False,
    )
    return fn(params, states, dense, gray, depth_u16, timestamps,
              frame_ids, stationary)


def batched_diagnostics(outputs, mesh: Mesh, axis="seq"):
    """Cross-sequence metric aggregation — the lone collective."""

    @functools.partial(
        jax.jit,
        out_shardings=NamedSharding(mesh, P()),
    )
    def agg(outs):
        return {
            "mean_matches": jnp.mean(outs.num_matches.astype(jnp.float32)),
            "mean_inliers": jnp.mean(outs.num_inliers.astype(jnp.float32)),
            "keyframes": jnp.sum(outs.is_keyframe.astype(jnp.int32)),
            "tracked_frac": jnp.mean(outs.tracking_ok.astype(jnp.float32)),
        }

    return agg(outputs)
