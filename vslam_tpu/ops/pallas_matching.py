"""Pallas TPU kernel: streaming masked descriptor top-2 matching.

The matchers in `ops.matching` materialize full distance matrices in HBM
— fine at (400, 400), but the loop-closure all-keyframe matcher computes
a (KFC, K, K) block (128x400x400 = 82 MB of f32 traffic) just to reduce
it to per-query top-2, and the local-map matcher streams (16384, 400).
This kernel fuses distance computation + validity masking + top-2
reduction in VMEM, flash-attention style: database tiles are matmul'd on
the MXU against the resident query block and merged into a running
(best, second, argbest) accumulator, so HBM only ever sees the (K, 2)
result.

All kernels fall back to the pure-JAX implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _round_up(x, m):
    return (x + m - 1) // m * m


def _match_kernel(db_ref, dbv_ref, q_ref, best_ref, second_ref, idx_ref):
    """Grid: (num_db_tiles,). Accumulates running top-2 per query column.

    db_ref: (TILE, D) database tile (VMEM)
    dbv_ref: (TILE, 1) validity (f32 0/1)
    q_ref: (Kq, D) queries (VMEM, resident across tiles)
    best/second: (1, Kq) running smallest distances
    idx_ref: (1, Kq) int32 argbest (global db row)
    """
    j = pl.program_id(0)
    tile = db_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        second_ref[:] = jnp.full_like(second_ref, _BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    dots = jnp.dot(
        db_ref[:], q_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (TILE, Kq)
    d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))
    d = jnp.where(dbv_ref[:] > 0.5, d, _BIG)  # mask invalid db rows

    # Tile-local top-2 per query column.
    t_min = jnp.min(d, axis=0, keepdims=True)  # (1, Kq)
    t_arg = jnp.argmin(d, axis=0).astype(jnp.int32)[None, :] + j * tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + j * tile
    d2 = jnp.where(row_ids == t_arg, _BIG, d)
    t_min2 = jnp.min(d2, axis=0, keepdims=True)

    b, s, bi = best_ref[:], second_ref[:], idx_ref[:]
    new_best = jnp.minimum(b, t_min)
    new_idx = jnp.where(t_min < b, t_arg, bi)
    # second smallest of {b, s, t_min, t_min2}
    new_second = jnp.minimum(jnp.maximum(b, t_min), jnp.minimum(s, t_min2))
    best_ref[:] = new_best
    second_ref[:] = new_second
    idx_ref[:] = new_idx


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def top2_match_pallas(desc_db, valid_db, desc_q, tile=512, interpret=False):
    """Streaming top-2 match: for each QUERY, the two nearest DB rows.

    Args:
      desc_db: (M, D) unit descriptors; valid_db (M,).
      desc_q: (Kq, D) unit query descriptors.

    Returns (d1 (Kq,), d2 (Kq,), idx (Kq,) int32).
    """
    M, D = desc_db.shape
    Kq = desc_q.shape[0]
    Mp = _round_up(M, tile)
    Kp = _round_up(Kq, 128)
    db = jnp.zeros((Mp, D), desc_db.dtype).at[:M].set(desc_db)
    dbv = jnp.zeros((Mp, 1), jnp.float32).at[:M, 0].set(valid_db.astype(jnp.float32))
    q = jnp.zeros((Kp, D), desc_q.dtype).at[:Kq].set(desc_q)

    grid = (Mp // tile,)
    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.int32),
        ),
        interpret=interpret,
    )(db, dbv, q)
    return best[0, :Kq], second[0, :Kq], idx[0, :Kq]


def knn2_ratio_match_pallas(desc_q, desc_db, valid_q, valid_db, ratio=0.75,
                            tile=512, interpret=False):
    """Drop-in variant of `matching.knn2_ratio_match` (without mutual
    check) built on the streaming kernel: returns (idx, valid, dist)."""
    d1, d2, idx = top2_match_pallas(desc_db, valid_db, desc_q, tile=tile,
                                    interpret=interpret)
    ok = (d1 < ratio * d2) & (d1 < _BIG * 0.5) & valid_q
    return idx, ok, d1


def _radius_kernel(
    db_ref, dbuv_ref, dbv_ref, q_ref, quvT_ref, qv_ref,
    best_ref, idx_ref, minpix_ref,
    *, radius2, desc_thresh,
):
    """Grid: (num_db_tiles,). Fused local-map radius matcher
    (`matching.radius_descriptor_match` semantics, `src/Slam.cpp:380-469`).

    Per database tile: descriptor distances (MXU) + pixel-radius gate +
    per-db-row best keypoint + per-keypoint claim dedup, merged into a
    running (1, K) accumulator; also emits the per-db-row min squared
    pixel distance for the found counter (`src/Slam.cpp:1099-1104`).
    HBM never sees an (M, K) block.
    """
    j = pl.program_id(0)
    tile = db_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    # Explicit DEFAULT precision: descriptor matmuls are deliberately bf16
    # (see matching.l2_distance_matrix), and Mosaic rejects an fp32
    # contract precision on bf16 operands — the tracking step's f32 pin
    # must not leak into the kernel trace.
    dots = jnp.dot(
        db_ref[:], q_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (TILE, K)
    desc_d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))

    dx = dbuv_ref[:, 0:1] - quvT_ref[0:1, :]  # (TILE, K)
    dy = dbuv_ref[:, 1:2] - quvT_ref[1:2, :]
    pix_d2 = dx * dx + dy * dy

    qv = qv_ref[0:1, :] > 0.5  # (1, K)
    dbv = dbv_ref[:] > 0.5  # (TILE, 1)
    d = jnp.where(qv & dbv & (pix_d2 <= radius2), desc_d, _BIG)

    # Per-db-row best keypoint (argmin along lanes).
    bd = jnp.min(d, axis=1, keepdims=True)  # (TILE, 1)
    bk = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]  # (TILE, 1)
    mp_ok = (bd < desc_thresh) & dbv

    # Claim matrix for this tile: db row i claims keypoint bk[i] at bd[i].
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    claims = jnp.where((cols == bk) & mp_ok, bd, _BIG)  # (TILE, K)
    t_min = jnp.min(claims, axis=0, keepdims=True)  # (1, K)
    rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + j * tile
    t_arg = jnp.min(jnp.where(claims == t_min, rows, jnp.int32(2**30)), axis=0)[None, :]

    b, bi = best_ref[:], idx_ref[:]
    # Strict < keeps the earlier (lower-index) tile on ties, matching
    # jnp.argmin's first-match convention; within a tile the row-min above
    # picks the lowest db row among equal distances.
    take = t_min < b
    best_ref[:] = jnp.where(take, t_min, b)
    idx_ref[:] = jnp.where(take, t_arg, bi)

    # Found counter: min squared pixel distance to any valid keypoint.
    minpix_ref[:] = jnp.min(jnp.where(qv, pix_d2, _BIG), axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("radius_px", "desc_thresh", "tile", "interpret")
)
def radius_match_pallas(
    desc_q, uv_q, valid_q, desc_db, uv_db, valid_db,
    radius_px, desc_thresh, tile=512, interpret=False,
):
    """Fused drop-in for `matching.radius_descriptor_match` (+ the found
    counter's min pixel distance). Returns (mp_idx (K,), kp_ok (K,),
    dist (K,), min_pix_d2 (M,))."""
    M, D = desc_db.shape
    K = desc_q.shape[0]
    Mp = _round_up(M, tile)
    Kp = _round_up(K, 128)
    f32 = jnp.float32
    db = jnp.zeros((Mp, D), desc_db.dtype).at[:M].set(desc_db)
    dbuv = jnp.zeros((Mp, 2), f32).at[:M].set(uv_db.astype(f32))
    dbv = jnp.zeros((Mp, 1), f32).at[:M, 0].set(valid_db.astype(f32))
    q = jnp.zeros((Kp, D), desc_q.dtype).at[:K].set(desc_q)
    quvT = jnp.zeros((2, Kp), f32).at[:, :K].set(uv_q.astype(f32).T)
    qv = jnp.zeros((1, Kp), f32).at[0, :K].set(valid_q.astype(f32))

    grid = (Mp // tile,)
    kernel = functools.partial(
        _radius_kernel,
        radius2=float(radius_px) * float(radius_px),
        desc_thresh=float(desc_thresh),
    )
    best, idx, minpix = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(db, dbuv, dbv, q, quvT, qv)

    dist = best[0, :K]
    kp_ok = dist < _BIG * 0.5
    mp_idx = jnp.where(kp_ok, idx[0, :K], -1)
    return mp_idx, kp_ok, dist, minpix[:M, 0]


def _radius_kernel_batched(
    db_ref, dbuv_ref, dbv_ref, q_ref, quvT_ref, qv_ref,
    best_ref, idx_ref, minpix_ref,
    *, radius2, desc_thresh, B,
):
    """Grid: (num_db_tiles,). Batched `_radius_kernel`: B independent
    (db, query) pairs advance through the SAME grid step via an unrolled
    member loop, so per-grid-step latency is paid once per tile instead
    of once per (member, tile). Under `vmap(radius_match_pallas)` the
    grid gains a leading batch dim — B=4 costs 4x the grid steps and the
    hand-batched tracking step measured local-map tracking at 862 us/iter
    vs 289 us single (scripts/bench_batched_step.py), i.e. the pass is
    grid-step-latency bound, not MXU bound."""
    j = pl.program_id(0)
    tile = db_ref.shape[1]

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    for b in range(B):
        dots = jnp.dot(
            db_ref[b], q_ref[b].T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (TILE, K)
        desc_d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))

        dx = dbuv_ref[b, :, 0:1] - quvT_ref[b, 0:1, :]  # (TILE, K)
        dy = dbuv_ref[b, :, 1:2] - quvT_ref[b, 1:2, :]
        pix_d2 = dx * dx + dy * dy

        qv = qv_ref[b, 0:1, :] > 0.5  # (1, K)
        dbv = dbv_ref[b] > 0.5  # (TILE, 1)
        d = jnp.where(qv & dbv & (pix_d2 <= radius2), desc_d, _BIG)

        bd = jnp.min(d, axis=1, keepdims=True)  # (TILE, 1)
        bk = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]  # (TILE, 1)
        mp_ok = (bd < desc_thresh) & dbv

        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        claims = jnp.where((cols == bk) & mp_ok, bd, _BIG)  # (TILE, K)
        t_min = jnp.min(claims, axis=0, keepdims=True)  # (1, K)
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + j * tile
        t_arg = jnp.min(
            jnp.where(claims == t_min, rows, jnp.int32(2**30)), axis=0
        )[None, :]

        bcur, bicur = best_ref[b], idx_ref[b]
        take = t_min < bcur
        best_ref[b] = jnp.where(take, t_min, bcur)
        idx_ref[b] = jnp.where(take, t_arg, bicur)

        minpix_ref[b] = jnp.min(
            jnp.where(qv, pix_d2, _BIG), axis=1, keepdims=True
        )


@functools.partial(
    jax.jit, static_argnames=("radius_px", "desc_thresh", "tile", "interpret")
)
def radius_match_pallas_batched(
    desc_q, uv_q, valid_q, desc_db, uv_db, valid_db,
    radius_px, desc_thresh, tile=512, interpret=False,
):
    """Batched fused local-map matcher: B members in one kernel launch.

    Args mirror `radius_match_pallas` with a leading batch dim:
      desc_q (B, K, D), uv_q (B, K, 2), valid_q (B, K),
      desc_db (B, M, D), uv_db (B, M, 2), valid_db (B, M).

    Returns (mp_idx (B, K), kp_ok (B, K), dist (B, K), min_pix_d2 (B, M)).
    """
    Bb, M, D = desc_db.shape
    K = desc_q.shape[1]
    Mp = _round_up(M, tile)
    Kp = _round_up(K, 128)
    f32 = jnp.float32
    db = jnp.zeros((Bb, Mp, D), desc_db.dtype).at[:, :M].set(desc_db)
    dbuv = jnp.zeros((Bb, Mp, 2), f32).at[:, :M].set(uv_db.astype(f32))
    dbv = jnp.zeros((Bb, Mp, 1), f32).at[:, :M, 0].set(
        valid_db.astype(f32)
    )
    q = jnp.zeros((Bb, Kp, D), desc_q.dtype).at[:, :K].set(desc_q)
    quvT = jnp.zeros((Bb, 2, Kp), f32).at[:, :, :K].set(
        jnp.swapaxes(uv_q.astype(f32), 1, 2)
    )
    qv = jnp.zeros((Bb, 1, Kp), f32).at[:, 0, :K].set(valid_q.astype(f32))

    grid = (Mp // tile,)
    kernel = functools.partial(
        _radius_kernel_batched,
        radius2=float(radius_px) * float(radius_px),
        desc_thresh=float(desc_thresh),
        B=Bb,
    )
    best, idx, minpix = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, tile, D), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, tile, 2), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, tile, 1), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Kp, D), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 2, Kp), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, Kp), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bb, 1, Kp), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, Kp), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, tile, 1), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bb, 1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Bb, 1, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Bb, Mp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(db, dbuv, dbv, q, quvT, qv)

    dist = best[:, 0, :K]
    kp_ok = dist < _BIG * 0.5
    mp_idx = jnp.where(kp_ok, idx[:, 0, :K], -1)
    return mp_idx, kp_ok, dist, minpix[:, :M, 0]


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
