"""Device-side voxel grid hashing: dense-cloud dedup accumulation.

Rebuilds the reference's dense Kinect cloud accumulation
(`/root/reference/src/main.cpp:1081-1146`): back-project every Nth pixel
<= 5 m, transform to world, insert iff its 2 cm voxel is new — the
reference keeps an FNV-style `unordered_set` of voxel keys
(`main.cpp:1087-1094`). Here the voxel set is a fixed-capacity open hash
table in device memory updated with scatter ops, so accumulation runs
inside the jitted per-frame pipeline with zero host traffic; collisions
(different voxel, same slot) drop the point, exactly like a Bloom-ish
accept of the reference's behavior at ~2x table load.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Large primes for coordinate hashing (same spirit as the reference's FNV
# mix, `main.cpp:1087-1094`).
_P1 = 73856093
_P2 = 19349663
_P3 = 83492791


# Empty-slot sentinel for the winner table (any real insert id is
# smaller, so scatter-min claims free slots).
_EMPTY = 2**31 - 1

# Extra rows past the reported cloud capacity. The sort-compacted append
# (see insert_points) writes its whole K-row block starting at
# cloud_count <= capacity; winners past capacity land in this scratch
# region and are dropped by the count clamp — identical to per-point
# "drop when full" without a row-scatter. Bounds the K of a single
# insert call.
_APPEND_SCRATCH = 81920


class DenseMapState(NamedTuple):
    # (C,) int32 — global insert id of the first point to claim the
    # slot; _EMPTY while free. (Occupancy + election in ONE array: row
    # scatters and per-pass occupancy scatters measured 4x / 2x the cost
    # of this single scalar scatter-min — scripts/bench_scatter_variants.)
    table_winner: jnp.ndarray
    cloud_xyz: jnp.ndarray  # (N + scratch, 3) float32; [:cloud_count] valid
    cloud_rgb: jnp.ndarray  # (N + scratch, 3) uint8
    cloud_count: jnp.ndarray  # () int32, <= reported capacity N
    insert_epoch: jnp.ndarray  # () int32 — total candidates ever offered


def init_dense_map(hash_capacity: int, cloud_capacity: int) -> DenseMapState:
    return DenseMapState(
        table_winner=jnp.full(hash_capacity, _EMPTY, jnp.int32),
        cloud_xyz=jnp.zeros((cloud_capacity + _APPEND_SCRATCH, 3), jnp.float32),
        cloud_rgb=jnp.zeros((cloud_capacity + _APPEND_SCRATCH, 3), jnp.uint8),
        cloud_count=jnp.asarray(0, jnp.int32),
        insert_epoch=jnp.asarray(0, jnp.int32),
    )


def dense_cloud_capacity(state: DenseMapState) -> int:
    """Reported capacity (cloud arrays carry append scratch past it)."""
    return state.cloud_xyz.shape[0] - _APPEND_SCRATCH


def voxel_coords(points, voxel_size):
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def voxel_hash(coords, capacity):
    h = coords[..., 0] * _P1 ^ coords[..., 1] * _P2 ^ coords[..., 2] * _P3
    return jnp.abs(h) % capacity


def insert_points(
    state: DenseMapState, points, colors, valid, voxel_size=0.02
) -> DenseMapState:
    """Insert a batch of candidate points; only first-in-voxel survive.

    Batch-internal dedup: when several batch points share a slot, the
    lowest batch index wins (scatter-min election on a monotone global
    insert id). Collisions with a DIFFERENT occupied voxel drop the
    point (open hash, no probing — at the default 2^21 slots vs ~1M
    points the loss is <~5%, comparable to the reference's
    unordered_set memory/speed trade, `main.cpp:1087-1094`).

    TPU scatter economics (scripts/bench_scatter_variants.py, v5e,
    614k updates): scalar scatter ~7-8 ms, (1,3)-row scatter ~29 ms,
    row gather ~6.5 ms, argsort ~4.6 ms. So this does exactly ONE
    scalar scatter-min (election + occupancy in the winner table) and
    NO row scatters: winners are sorted to the front of the batch
    (stable argsort on a win-keyed index, preserving insertion order)
    and appended as one contiguous dynamic_update_slice block into the
    scratch-padded cloud arrays. Semantics are identical to per-point
    sequential insertion: same winners, same order, same drop-when-full.
    """
    C = state.table_winner.shape[0]
    N = dense_cloud_capacity(state)
    K = points.shape[0]
    if K > _APPEND_SCRATCH:
        raise ValueError(
            f"insert batch {K} exceeds append scratch {_APPEND_SCRATCH}; "
            "split the batch (fuse_chunk_scan frames_per_step does this)"
        )

    coords = voxel_coords(points, voxel_size)
    slots = voxel_hash(coords, C)
    gid = state.insert_epoch + jnp.arange(K, dtype=jnp.int32)

    prev = state.table_winner[slots]
    # Invalid points dump to the OOB slot C (dropped under mode="drop").
    tabw = state.table_winner.at[jnp.where(valid, slots, C)].min(
        jnp.where(valid, gid, _EMPTY), mode="drop"
    )
    # Won = slot was free before this batch AND this point's id is the
    # minimum the slot saw (ids are globally monotone, so a free slot's
    # post-scatter winner is always from this batch).
    win = valid & (prev == _EMPTY) & (tabw[slots] == gid)

    # Sort-compact append: winners first, in batch (= insertion) order.
    idx = jnp.arange(K, dtype=jnp.int32)
    perm = jnp.argsort(jnp.where(win, idx, K), stable=True)
    n_win = jnp.sum(win).astype(jnp.int32)
    start = state.cloud_count  # always <= N; block fits in scratch
    cloud_xyz = jax.lax.dynamic_update_slice(
        state.cloud_xyz, points[perm], (start, jnp.int32(0))
    )
    cloud_rgb = jax.lax.dynamic_update_slice(
        state.cloud_rgb, colors[perm].astype(jnp.uint8),
        (start, jnp.int32(0)),
    )
    new_count = jnp.minimum(start + n_win, N)

    return DenseMapState(
        tabw, cloud_xyz, cloud_rgb, new_count,
        state.insert_epoch + K,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "pixel_step", "max_depth", "voxel_size", "depth_min", "frames_per_step"
    ),
)
def fuse_chunk_scan(
    state: DenseMapState, depths, rgbs, Rs, ts, fx, fy, cx, cy,
    pixel_step=8, max_depth=5.0, voxel_size=0.02, depth_min=0.1,
    frames_per_step=1,
) -> DenseMapState:
    """Dense accumulation over a CHUNK of frames as one jitted scan.

    The reference accumulates per frame inside its hot loop
    (`/root/reference/src/main.cpp:1081-1146`); a per-frame host dispatch
    here would cost ~50 ms relay RTT each (CLAUDE.md), so the whole chunk
    is state-threaded through `lax.scan` on device — O(1) dispatches.

    `frames_per_step` batches F frames into ONE insert per scan step.
    This is EXACTLY equivalent to per-frame insertion: the batch-internal
    lowest-index-wins election (see `insert_points`) makes the earlier
    frame win contested voxels, drops later-frame points whose voxel an
    earlier frame filled, and appends winners in frame order — but the
    scatter latency amortizes over F frames (the scan is latency-bound,
    not bandwidth-bound; equivalence pinned by
    tests/test_pipeline.py::test_dense_fusion_frame_batching_exact).

    depths: (N, H, W) float32 meters (0 = invalid); rgbs (N, H, W, 3) uint8
    or None; Rs (N, 3, 3); ts (N, 3). Padding frames with all-zero depth is
    a no-op insert; N must be a multiple of frames_per_step (callers pad).
    """
    if rgbs is None:
        rgbs = jnp.zeros(depths.shape + (3,), jnp.uint8)

    F = frames_per_step
    N = depths.shape[0]
    assert N % F == 0, (N, F)
    if F > 1:
        depths = depths.reshape(N // F, F, *depths.shape[1:])
        rgbs = rgbs.reshape(N // F, F, *rgbs.shape[1:])
        Rs = Rs.reshape(N // F, F, 3, 3)
        ts = ts.reshape(N // F, F, 3)

    def bp(depth, rgb, R, t):
        return backproject_frame(
            depth, rgb, R, t, fx, fy, cx, cy,
            pixel_step=pixel_step, max_depth=max_depth, depth_min=depth_min,
        )

    def step(st, inp):
        depth, rgb, R, t = inp
        if F > 1:
            pts, cols, valid = jax.vmap(bp)(depth, rgb, R, t)
            pts = pts.reshape(-1, 3)
            cols = cols.reshape(-1, 3)
            valid = valid.reshape(-1)
        else:
            pts, cols, valid = bp(depth, rgb, R, t)
        return insert_points(st, pts, cols, valid, voxel_size), None

    state, _ = jax.lax.scan(step, state, (depths, rgbs, Rs, ts))
    return state


def fuse_sequence(
    state: DenseMapState, depths, rgbs, Rs, ts, fx, fy, cx, cy,
    pixel_step=8, max_depth=5.0, voxel_size=0.02, depth_min=0.1,
    chunk: int = 64, frames_per_step: int = 16,
) -> DenseMapState:
    """Fuse a whole sequence in fixed-size scanned chunks (bounds both the
    per-dispatch transfer size and the compiled program's memory)."""
    import numpy as np

    N = depths.shape[0]
    for k in range(0, N, chunk):
        d = np.asarray(depths[k : k + chunk], np.float32)
        r = None if rgbs is None else np.asarray(rgbs[k : k + chunk], np.uint8)
        R = np.asarray(Rs[k : k + chunk], np.float32)
        t = np.asarray(ts[k : k + chunk], np.float32)
        pad = chunk - d.shape[0]
        if pad:
            d = np.concatenate([d, np.zeros((pad,) + d.shape[1:], d.dtype)])
            if r is not None:
                r = np.concatenate([r, np.zeros((pad,) + r.shape[1:], r.dtype)])
            R = np.concatenate([R, np.tile(np.eye(3, dtype=R.dtype), (pad, 1, 1))])
            t = np.concatenate([t, np.zeros((pad, 3), t.dtype)])
        state = fuse_chunk_scan(
            state, jnp.asarray(d), None if r is None else jnp.asarray(r),
            jnp.asarray(R), jnp.asarray(t), fx, fy, cx, cy,
            pixel_step=pixel_step, max_depth=max_depth,
            voxel_size=voxel_size, depth_min=depth_min,
            frames_per_step=math.gcd(chunk, frames_per_step),
        )
    return state


def backproject_frame(
    depth, rgb, R, t, fx, fy, cx, cy, pixel_step=8, max_depth=5.0,
    depth_min=0.1,
):
    """Back-project every Nth pixel of a depth frame to world points
    (`main.cpp:1116-1141`). Returns (points (M, 3), colors (M, 3) uint8,
    valid (M,)) with M = (H/step) * (W/step)."""
    H, W = depth.shape
    vs = jnp.arange(0, H - (H % pixel_step), pixel_step)
    us = jnp.arange(0, W - (W % pixel_step), pixel_step)
    vv, uu = jnp.meshgrid(vs, us, indexing="ij")
    z = depth[vv, uu]
    valid = (z > depth_min) & (z <= max_depth)
    x = (uu.astype(jnp.float32) - cx) / fx * z
    y = (vv.astype(jnp.float32) - cy) / fy * z
    pc = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    pts_w = pc @ R.T + t
    cols = rgb[vv, uu].reshape(-1, 3) if rgb is not None else jnp.zeros(
        (pc.shape[0], 3), jnp.uint8
    )
    return pts_w, cols, valid.reshape(-1)
