"""DepthNet training on the synthetic RGB-D room worlds.

The reference's depth capability is a frozen MiDaS checkpoint
(`/root/reference/src/DepthEstimator.cpp:15-112`, latent); this image
ships no weights, so — exactly like SuperPoint
(`models/train_superpoint.py`) — the framework trains its own: the room
renderer (`data.synthetic.render_textured`) already emits ground-truth
metric depth (`render_depth_room`), which makes monocular depth a
supervised regression.

Recipe:
- Frames rendered at full camera resolution (VGA, fx=525 — the benchmark
  camera) from random in-room poses, box-downsampled 2x to the net input;
  LOG metric depth targets at the net's output stride (8 full-res px).
- Room geometry is jittered around the benchmark defaults (wall_dist
  8±1 m, floor 1.5±0.2 m, camera height ±0.25 m, pitch ±0.12 rad, and
  3k-9k landmarks/world) so the net reads depth from IMAGE cues (floor
  row, patch density/perspective) rather than memorizing one room box.
  The benchmark's eval worlds (fresh seeds, default geometry) are inside
  this distribution but never seen in training.
- Masked L1 on log depth; photometric augments (gain/bias/read noise)
  per step; scanned-step epochs on device (one dispatch per ~50 steps —
  the axon relay costs ~50 ms per dispatch, CLAUDE.md).

Training from `scripts/train_depthnet.py` writes
`models/checkpoints/depthnet_synth.npz`, auto-discovered by
`weights.load_or_init_depthnet` and consumed by the coupled pipeline's
mono mode (`core.coupled.run_coupled(depth_params=...)`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vslam_tpu.models import depthnet

FULL_W, FULL_H = 640, 480
FX = FY = 525.0
CX, CY = 319.5, 239.5


def _pose(rng, wall_dist):
    """Random in-room camera pose: planar-ish (the benchmark trajectory
    family) with height/pitch/roll jitter."""
    lim = wall_dist - 2.0
    t = np.array(
        [rng.uniform(-lim, lim), rng.uniform(-0.25, 0.3), rng.uniform(-lim, lim)],
        np.float32,
    )
    yaw = rng.uniform(-np.pi, np.pi)
    pitch = rng.uniform(-0.12, 0.12)
    roll = rng.uniform(-0.05, 0.05)
    cy_, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return (Ry @ Rx @ Rz).astype(np.float32), t


def render_dataset(rng, num_images, jitter=True):
    """Render (gray_half (N, 240, 320, 1) f32, log_depth (N, 60, 80) f32,
    valid (N, 60, 80) bool) training triples."""
    from vslam_tpu.data import synthetic

    S = depthnet.OUT_STRIDE
    Hs, Ws = FULL_H // S, FULL_W // S
    gray = np.zeros((num_images, FULL_H // 2, FULL_W // 2, 1), np.float32)
    logd = np.zeros((num_images, Hs, Ws), np.float32)
    valid = np.zeros((num_images, Hs, Ws), bool)
    for i in range(num_images):
        wall = rng.uniform(7.0, 9.0) if jitter else 8.0
        floor = rng.uniform(1.3, 1.7) if jitter else 1.5
        n_lm = int(rng.integers(3000, 9001)) if jitter else 6000
        world = synthetic.make_room_world(
            rng, num_landmarks=n_lm, desc_dim=8, floor_y=floor, wall_dist=wall
        )
        R, t = _pose(rng, wall)
        img = synthetic.render_textured(
            world, R, t, FX, FY, CX, CY, FULL_W, FULL_H,
            seed=int(rng.integers(1 << 31)),
        )
        d = synthetic.render_depth_room(
            R.astype(np.float64), t.astype(np.float64), FX, FY, CX, CY,
            FULL_W, FULL_H, floor_y=floor, wall_dist=wall,
        )
        # 2x box downsample (the inference-path preprocessing).
        gray[i, ..., 0] = img.reshape(FULL_H // 2, 2, FULL_W // 2, 2).mean((1, 3))
        # Target at the output cell center (full-res pixel 8i + 3.5):
        # mean of the 2x2 pixel block around it, valid iff all four hit
        # geometry (avoids blending across the zero-invalid sentinel).
        blk = np.stack(
            [d[3::S, 3::S], d[3::S, 4::S], d[4::S, 3::S], d[4::S, 4::S]]
        )
        v = (blk > 0.1).all(axis=0)
        dm = blk.mean(axis=0)
        logd[i] = np.log(np.maximum(dm, 0.1))
        valid[i] = v
    return gray, logd, valid


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_trainer(lr=2e-3, height=FULL_H // 2, width=FULL_W // 2,
                 total_steps=None):
    model = depthnet.DepthNet()
    if total_steps:
        # Warmup + cosine decay to ~0: the flat-lr run plateaued at
        # L1(log) ~0.08 with visible step noise; annealing buys the last
        # factor toward the data floor.
        tx = optax.adam(
            optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup_steps=min(200, total_steps // 10),
                decay_steps=total_steps, end_value=lr * 1e-2,
            )
        )
    else:
        tx = optax.adam(lr)

    def init(key):
        params = model.init(key, jnp.zeros((1, height, width, 1), jnp.float32))
        return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    def train_step_inner(state: TrainState, gray, logd, valid, key):
        kg, kb, kn = jax.random.split(key, 3)
        B = gray.shape[0]
        gain = jax.random.uniform(kg, (B, 1, 1, 1), minval=0.8, maxval=1.2)
        bias = jax.random.uniform(kb, (B, 1, 1, 1), minval=-0.08, maxval=0.08)
        g = jnp.clip(
            gray * gain + bias + 0.01 * jax.random.normal(kn, gray.shape),
            0.0, 1.0,
        )

        def loss_fn(params):
            pred = model.apply(params, g)
            err = jnp.abs(pred - logd) * valid
            return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def make_epoch(steps: int, batch: int):
        @jax.jit
        def epoch(state, gray, logd, valid, base_key):
            N = gray.shape[0]

            def body(st, i):
                k = jax.random.fold_in(base_key, i)
                k1, k2 = jax.random.split(k)
                idx = jax.random.randint(k1, (batch,), 0, N)
                return train_step_inner(st, gray[idx], logd[idx], valid[idx], k2)

            return jax.lax.scan(body, state, jnp.arange(steps))

        return epoch

    return init, jax.jit(train_step_inner), make_epoch


def train(
    steps=2000,
    batch=8,
    num_images=256,
    seed=0,
    lr=2e-3,
    steps_per_scan=50,
    log=print,
):
    """Full training run; deterministic for a fixed seed.
    Returns (TrainState, history list of losses)."""
    rng = np.random.default_rng(seed)
    steps_per_scan = max(min(steps_per_scan, steps), 1)
    init, _, make_epoch = make_trainer(lr=lr, total_steps=steps)
    state = init(jax.random.PRNGKey(seed))
    if log:
        log(f"rendering {num_images} training frames...")
    gray, logd, valid = render_dataset(rng, num_images)
    gray, logd, valid = jnp.asarray(gray), jnp.asarray(logd), jnp.asarray(valid)

    epoch = make_epoch(steps_per_scan, batch)
    history = []
    n_scans = max(steps // steps_per_scan, 1)
    for e in range(n_scans):
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 29), e)
        state, losses = epoch(state, gray, logd, valid, key)
        losses = np.asarray(losses)
        history.extend(losses.tolist())
        if log:
            log(
                f"scan {e + 1}/{n_scans} (step {(e + 1) * steps_per_scan}): "
                f"L1(log depth) {losses[-1]:.4f}"
            )
    return state, history


def evaluate(params, seed=321, n_images=16):
    """Held-out eval on FRESH default-geometry worlds (the benchmark
    distribution): standard monocular depth metrics on valid cells."""
    rng = np.random.default_rng(seed)
    gray, logd, valid = render_dataset(rng, n_images, jitter=False)
    model = depthnet.DepthNet()
    pred = np.asarray(jax.jit(model.apply)(params, jnp.asarray(gray)))
    d_gt = np.exp(logd)
    d_pr = np.exp(pred)
    m = valid
    abs_rel = float(np.mean(np.abs(d_pr[m] - d_gt[m]) / d_gt[m]))
    rmse_log = float(np.sqrt(np.mean((pred[m] - logd[m]) ** 2)))
    ratio = np.maximum(d_pr[m] / d_gt[m], d_gt[m] / d_pr[m])
    delta1 = float(np.mean(ratio < 1.25))
    return {
        "abs_rel": abs_rel,
        "rmse_log": rmse_log,
        "delta_1.25": delta1,
        "n_cells": int(m.sum()),
    }
