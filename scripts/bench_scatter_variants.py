"""Microbench TPU scatter/gather variants at the dense-insert scale to
pin which op shape is slow: scalar scatters vs row ((1,3)-window)
scatters vs row gathers vs argsort. Drives the voxel-hash insert design
(ops/gridhash.py). One JSON line to stdout.

Usage: python scripts/bench_scatter_variants.py [--k 614400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=614400)
    ap.add_argument("--cap", type=int, default=1 << 21)
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=8, help="scan reps per program")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    K, C, N, R = args.k, args.cap, args.n, args.reps
    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.integers(0, C, K, dtype=np.int32))
    dests = jnp.asarray(rng.integers(0, N, K, dtype=np.int32))
    vals_f = jnp.asarray(rng.random(K, dtype=np.float32))
    rows_f = jnp.asarray(rng.random((K, 3), dtype=np.float32))
    rows_i = jnp.asarray(rng.integers(0, 1 << 20, (K, 3), dtype=np.int32))

    def timed(fn, *xs):
        f = jax.jit(fn)
        for _ in range(2):
            float(f(*xs))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(f(*xs))
            ts.append(time.perf_counter() - t0)
        # per-rep microseconds
        return round(1e6 * float(np.median(ts)) / R, 1)

    def rep(body):
        """Scan body R times with an index-perturbed input so reps don't
        collapse into one."""

        def fn(slots, payload):
            def step(carry, i):
                out = body((slots + i) % C, payload)
                return carry + out, None

            s, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(R, dtype=jnp.int32)
            )
            return s

        return fn


    def _col3(s, p):
        out = jnp.zeros((C, 3), jnp.float32)
        for j in range(3):
            out = out.at[s, j].set(p[:, j])
        return out

    res = {"K": K, "reps": R}

    res["scalar_set_bool_us"] = timed(
        rep(lambda s, p: jnp.sum(
            jnp.zeros(C, bool).at[s].set(True).astype(jnp.float32)
        )), slots, vals_f,
    )
    res["scalar_set_f32_us"] = timed(
        rep(lambda s, p: jnp.sum(jnp.zeros(C, jnp.float32).at[s].set(p))),
        slots, vals_f,
    )
    res["scalar_min_i32_us"] = timed(
        rep(lambda s, p: jnp.sum(
            jnp.full(C, K, jnp.int32).at[s].min(
                jnp.arange(K, dtype=jnp.int32)
            ).astype(jnp.float32)
        )), slots, vals_f,
    )
    res["row3_set_f32_us"] = timed(
        rep(lambda s, p: jnp.sum(
            jnp.zeros((C, 3), jnp.float32).at[s].set(p)
        )), slots, rows_f,
    )
    res["row3_set_i32_us"] = timed(
        rep(lambda s, p: jnp.sum(
            jnp.zeros((C, 3), jnp.int32).at[s].set(p).astype(jnp.float32)
        )), slots, rows_i,
    )
    res["split3_scalar_set_f32_us"] = timed(
        rep(lambda s, p: sum(
            jnp.sum(jnp.zeros(C, jnp.float32).at[s].set(p[:, j]))
            for j in range(3)
        )), slots, rows_f,
    )
    res["col3_set_f32_us"] = timed(
        rep(lambda s, p: jnp.sum(
            _col3(s, p)
        )), slots, rows_f,
    )
    res["row3_gather_f32_us"] = timed(
        rep(lambda s, p: jnp.sum(p[s % K])), slots, rows_f,
    )
    res["argsort_i32_us"] = timed(
        rep(lambda s, p: jnp.sum(jnp.argsort(s).astype(jnp.float32))),
        slots, vals_f,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
