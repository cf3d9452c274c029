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
        db_ref[:], q_ref[:].T, preferred_element_type=jnp.float32
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


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
