"""SuperPoint training: synthetic-shapes pretraining + homographic pairs.

The reference consumes frozen ONNX weights and has no training capability
at all. This module adds the standard MagicLeap-style recipe natively:

- A synthetic-shapes corner dataset (random line/polygon renderings with
  exact corner labels) generated on the host.
- Detector loss: per-cell 65-way cross-entropy against the corner grid
  (dustbin channel for empty cells).
- Descriptor loss: hinge contrastive loss over homography-related cell
  pairs (positive where cells correspond under the known homography).
- A jitted optax train step; data parallel over devices via vmap/psum is
  inherited from the surrounding pipeline utilities.

This both exercises the model end-to-end (gradients through the whole
backbone on the MXU) and gives the framework a path to produce its own
weights in environments without checkpoints.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vslam_tpu.models import superpoint as sp

CELL = 8


# ---------------------------------------------------------------------------
# Synthetic shapes data
# ---------------------------------------------------------------------------


def synthetic_shapes_batch(rng, batch, height=120, width=160, max_corners=48):
    """Random segments/polygons with exact corner coordinates.

    Returns (images (B, H, W, 1) f32, corners (B, C, 2) f32, cmask (B, C)).
    """
    imgs = np.zeros((batch, height, width), np.float32)
    corners = np.zeros((batch, max_corners, 2), np.float32)
    cmask = np.zeros((batch, max_corners), bool)
    for b in range(batch):
        img = np.full((height, width), rng.uniform(0.1, 0.4), np.float32)
        pts = []
        for _ in range(rng.integers(3, 8)):
            x0, y0 = rng.uniform(5, width - 5), rng.uniform(5, height - 5)
            x1, y1 = rng.uniform(5, width - 5), rng.uniform(5, height - 5)
            n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
            xs = np.linspace(x0, x1, n).astype(int)
            ys = np.linspace(y0, y1, n).astype(int)
            shade = rng.uniform(0.6, 1.0)
            img[np.clip(ys, 0, height - 1), np.clip(xs, 0, width - 1)] = shade
            # thicken
            img[np.clip(ys + 1, 0, height - 1), np.clip(xs, 0, width - 1)] = shade
            pts.append((x0, y0))
            pts.append((x1, y1))
        pts = pts[:max_corners]
        for i, (x, y) in enumerate(pts):
            corners[b, i] = (x, y)
            cmask[b, i] = True
        imgs[b] = img + rng.normal(0, 0.02, img.shape)
    return imgs[..., None].astype(np.float32), corners, cmask


def corners_to_cell_labels(corners, cmask, height, width):
    """Corner coords -> per-cell 65-way labels (64 positions + dustbin).

    When multiple corners land in a cell, the first wins (any is fine)."""
    B, C, _ = corners.shape
    Hc, Wc = height // CELL, width // CELL
    labels = jnp.full((B, Hc, Wc), 64, jnp.int32)  # dustbin default
    cx = jnp.clip(corners[..., 0].astype(jnp.int32), 0, width - 1)
    cy = jnp.clip(corners[..., 1].astype(jnp.int32), 0, height - 1)
    cell_x = cx // CELL
    cell_y = cy // CELL
    sub = (cy % CELL) * CELL + (cx % CELL)  # position within cell [0, 64)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None].repeat(C, 1)
    flat = labels.reshape(B, Hc * Wc)
    pos = cell_y * Wc + cell_x
    flat = flat.at[jnp.where(cmask, bidx, B - 1), jnp.where(cmask, pos, 0)].min(
        jnp.where(cmask, sub, 64), mode="drop"
    )
    return flat.reshape(B, Hc, Wc)


def random_homographies(key, batch, height, width, max_angle=0.15, max_scale=0.15,
                        max_shift=0.1):
    """Mild random similarity+perspective homographies (pixel coords)."""
    ks = jax.random.split(key, 4)
    ang = jax.random.uniform(ks[0], (batch,), minval=-max_angle, maxval=max_angle)
    sc = 1.0 + jax.random.uniform(ks[1], (batch,), minval=-max_scale, maxval=max_scale)
    tx = jax.random.uniform(ks[2], (batch,), minval=-max_shift, maxval=max_shift) * width
    ty = jax.random.uniform(ks[3], (batch,), minval=-max_shift, maxval=max_shift) * height
    c, s = jnp.cos(ang) * sc, jnp.sin(ang) * sc
    cx, cy = width / 2.0, height / 2.0
    # H = T(center+shift) R S T(-center)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    H = jnp.stack(
        [
            jnp.stack([c, -s, -c * cx + s * cy + cx + tx], -1),
            jnp.stack([s, c, -s * cx - c * cy + cy + ty], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )
    return H


def warp_images(images, H):
    """Inverse-warp images by homographies (bilinear)."""
    B, Ht, Wt, _ = images.shape
    ys, xs = jnp.meshgrid(jnp.arange(Ht, dtype=jnp.float32),
                          jnp.arange(Wt, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).reshape(-1, 3)  # (P, 3)
    Hinv = jnp.linalg.inv(H)
    src = jnp.einsum("bij,pj->bpi", Hinv, grid)
    sx = src[..., 0] / jnp.maximum(src[..., 2], 1e-8)
    sy = src[..., 1] / jnp.maximum(src[..., 2], 1e-8)

    def sample(img, sx, sy):
        from vslam_tpu.ops.camera import bilinear_sample

        uv = jnp.stack([sx, sy], -1)
        return bilinear_sample(img[..., 0], uv)

    out = jax.vmap(sample)(images, sx, sy).reshape(B, Ht, Wt, 1)
    inb = ((sx >= 0) & (sx < Wt) & (sy >= 0) & (sy < Ht)).reshape(B, Ht, Wt)
    return out, inb


# ---------------------------------------------------------------------------
# Losses + train step
# ---------------------------------------------------------------------------


def detector_loss(semi, labels, valid=None):
    """65-way cross-entropy per cell."""
    logp = jax.nn.log_softmax(semi, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if valid is not None:
        ll = ll * valid
        return -jnp.sum(ll) / jnp.maximum(jnp.sum(valid), 1.0)
    return -jnp.mean(ll)


def descriptor_loss(desc_a, desc_b, H, margin_pos=1.0, margin_neg=0.2, lam=0.05):
    """Hinge contrastive loss over cell-center correspondences
    (SuperPoint eq. 4): cells whose centers map within half a cell are
    positives."""
    B, Hc, Wc, D = desc_a.shape
    da = desc_a / jnp.maximum(jnp.linalg.norm(desc_a, axis=-1, keepdims=True), 1e-8)
    db = desc_b / jnp.maximum(jnp.linalg.norm(desc_b, axis=-1, keepdims=True), 1e-8)
    ys, xs = jnp.meshgrid(jnp.arange(Hc, dtype=jnp.float32),
                          jnp.arange(Wc, dtype=jnp.float32), indexing="ij")
    centers = jnp.stack([xs * CELL + CELL / 2, ys * CELL + CELL / 2, jnp.ones_like(xs)], -1)
    centers = centers.reshape(-1, 3)  # (P, 3)
    warped = jnp.einsum("bij,pj->bpi", H, centers)
    wx = warped[..., 0] / jnp.maximum(warped[..., 2], 1e-8)
    wy = warped[..., 1] / jnp.maximum(warped[..., 2], 1e-8)
    # correspondence: warped center of cell p near center of cell q
    cq = centers[:, :2]  # (P, 2)
    d2 = (
        (wx[:, :, None] - cq[None, None, :, 0]) ** 2
        + (wy[:, :, None] - cq[None, None, :, 1]) ** 2
    )  # (B, P, P)
    s_corr = (d2 <= (CELL / 2.0) ** 2).astype(da.dtype)
    dots = jnp.einsum("bpd,bqd->bpq", da.reshape(B, -1, D), db.reshape(B, -1, D))
    loss = lam * s_corr * jnp.maximum(0.0, margin_pos - dots) + (1 - s_corr) * jnp.maximum(
        0.0, dots - margin_neg
    )
    return jnp.mean(loss)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_trainer(height=120, width=160, lr=1e-3, desc_weight=0.1):
    model = sp.SuperPoint()
    tx = optax.adam(lr)

    def init(key):
        params = model.init(key, jnp.zeros((1, height, width, 1), jnp.float32))
        return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    @jax.jit
    def train_step(state: TrainState, images, labels, key):
        H = random_homographies(key, images.shape[0], height, width)
        warped, inb = warp_images(images, H)
        # warped labels: recompute via warped corner grid is host-side; for
        # the descriptor term only the homography itself is needed.

        def loss_fn(params):
            semi_a, desc_a = model.apply(params, images)
            semi_b, desc_b = model.apply(params, warped)
            l_det = detector_loss(semi_a, labels)
            l_desc = descriptor_loss(desc_a, desc_b, H)
            return l_det + desc_weight * l_desc, (l_det, l_desc)

        (loss, (l_det, l_desc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "det": l_det, "desc": l_desc},
        )

    return init, train_step


def train_synthetic(steps=50, batch=8, height=120, width=160, seed=0, log_every=10):
    """Short self-supervised pretraining run on synthetic shapes."""
    rng = np.random.default_rng(seed)
    init, step_fn = make_trainer(height, width)
    state = init(jax.random.PRNGKey(seed))
    history = []
    for i in range(steps):
        imgs, corners, cmask = synthetic_shapes_batch(rng, batch, height, width)
        labels = corners_to_cell_labels(jnp.asarray(corners), jnp.asarray(cmask),
                                        height, width)
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 1), i)
        state, metrics = step_fn(state, jnp.asarray(imgs), labels, key)
        history.append({k: float(v) for k, v in metrics.items()})
        if log_every and i % log_every == 0:
            print(f"step {i}: {history[-1]}")
    return state, history
