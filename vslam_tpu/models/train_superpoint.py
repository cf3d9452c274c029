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


def _yaw_pitch_R(yaw, pitch):
    cy_, sy = np.cos(yaw), np.sin(yaw)
    cp, sp_ = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]], np.float32)
    Rx = np.array([[1, 0, 0], [0, cp, -sp_], [0, sp_, cp]], np.float32)
    return Ry @ Rx


def textured_batch(rng, batch, height=120, width=160, max_corners=160,
                   num_landmarks=300, fx=None, fy=None, family="v1"):
    """Textured room renders with exact keypoint labels.

    Scenes come from the same generator the pixels-in E2E tests rasterize
    (`data.synthetic.make_room_world` + `render_textured`): landmarks on
    room surfaces drawn as unique random texture patches. Labels are the
    landmark projections (patch centers) — supervised interest points with
    exact coordinates, the synthetic-data leg of the MagicLeap recipe.
    Each image uses a fresh world + fresh patch textures, so descriptors
    must encode local appearance rather than memorize patches.

    Returns (images (B, H, W, 1) f32, corners (B, C, 2), cmask (B, C)).
    """
    from vslam_tpu.data import synthetic

    fx = fx or 0.75 * width
    fy = fy or 0.75 * width
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    imgs = np.zeros((batch, height, width), np.float32)
    corners = np.zeros((batch, max_corners, 2), np.float32)
    cmask = np.zeros((batch, max_corners), bool)
    for b in range(batch):
        world = synthetic.make_room_world(
            rng, num_landmarks=num_landmarks, desc_dim=8
        )
        R = _yaw_pitch_R(rng.uniform(-np.pi, np.pi), rng.uniform(-0.2, 0.2))
        t = np.array(
            [rng.uniform(-2.5, 2.5), rng.uniform(-0.3, 0.9), rng.uniform(-2.5, 2.5)],
            np.float32,
        )
        render = (
            synthetic.render_textured_v2 if family == "v2"
            else synthetic.render_textured
        )
        imgs[b] = render(
            world, R, t, fx, fy, cx, cy, width, height,
            seed=int(rng.integers(1 << 31)),
        ) + rng.normal(0, 0.01, (height, width))
        # Labels: visible in-bounds projections (patch centers);
        # camera-frame coords are R^T (X - t), i.e. (X - t) @ R row-wise.
        pc = (world.landmarks - t) @ R
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = fx * pc[:, 0] / z + cx
            v = fy * pc[:, 1] / z + cy
        vis = (z > 0.5) & (u >= 4) & (u < width - 4) & (v >= 4) & (v < height - 4)
        ids = np.nonzero(vis)[0][:max_corners]
        corners[b, : len(ids), 0] = u[ids]
        corners[b, : len(ids), 1] = v[ids]
        cmask[b, : len(ids)] = True
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


def descriptor_loss(desc_a, desc_b, H, margin_pos=1.0, margin_neg=0.2):
    """Hinge contrastive loss over cell-center correspondences
    (SuperPoint eq. 4): cells whose centers map within half a cell are
    positives. Positive and negative terms are normalized by their PAIR
    COUNTS — positives are ~1/P of all pairs, so an unbalanced sum is
    dominated by the push-apart term and collapses matching (the paper
    uses a fixed lambda=250 positive weight for the same reason)."""
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
    pos = s_corr * jnp.maximum(0.0, margin_pos - dots)
    neg = (1.0 - s_corr) * jnp.maximum(0.0, dots - margin_neg)
    return jnp.sum(pos) / jnp.maximum(jnp.sum(s_corr), 1.0) + jnp.sum(
        neg
    ) / jnp.maximum(jnp.sum(1.0 - s_corr), 1.0)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def warp_corners(corners, cmask, H, height, width):
    """Forward-warp corner pixels by homographies; drop out-of-bounds.

    corners (B, C, 2), H (B, 3, 3) -> (warped (B, C, 2), mask (B, C))."""
    hom = jnp.concatenate([corners, jnp.ones_like(corners[..., :1])], -1)
    w = jnp.einsum("bij,bcj->bci", H, hom)
    wx = w[..., 0] / jnp.maximum(w[..., 2], 1e-8)
    wy = w[..., 1] / jnp.maximum(w[..., 2], 1e-8)
    inb = (wx >= 0) & (wx < width) & (wy >= 0) & (wy < height)
    return jnp.stack([wx, wy], -1), cmask & inb


def make_trainer(height=120, width=160, lr=1e-3, desc_weight=1.0):
    model = sp.SuperPoint()
    tx = optax.adam(lr)

    def init(key):
        params = model.init(key, jnp.zeros((1, height, width, 1), jnp.float32))
        return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    def train_step_inner(state: TrainState, images, corners, cmask, key):
        """One step on a (B, H, W, 1) batch with exact corner labels:
        detector CE on BOTH views (original + homography-warped, warped
        labels come from warping the corners) + descriptor hinge loss over
        the cell correspondence grid."""
        labels_a = corners_to_cell_labels(corners, cmask, height, width)
        k_h, k_p = jax.random.split(key)
        H = random_homographies(k_h, images.shape[0], height, width)
        warped, _ = warp_images(images, H)
        wc, wmask = warp_corners(corners, cmask, H, height, width)
        labels_b = corners_to_cell_labels(wc, wmask, height, width)
        # Photometric augmentation on the warped view only: descriptors
        # must match across exposure/sharpness changes (the band-limited
        # renderer varies effective sharpness with subpixel phase).
        kb, kg, ko, kn = jax.random.split(k_p, 4)
        B = images.shape[0]
        gain = jax.random.uniform(kg, (B, 1, 1, 1), minval=0.8, maxval=1.2)
        bias = jax.random.uniform(ko, (B, 1, 1, 1), minval=-0.08, maxval=0.08)
        blur_on = jax.random.bernoulli(kb, 0.5, (B, 1, 1, 1))

        def binomial_blur(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
            x = 0.25 * xp[:, :-2] + 0.5 * xp[:, 1:-1] + 0.25 * xp[:, 2:]
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
            return 0.25 * xp[:, :, :-2] + 0.5 * xp[:, :, 1:-1] + 0.25 * xp[:, :, 2:]

        warped = jnp.where(blur_on, binomial_blur(warped), warped)
        warped = warped * gain + bias + 0.02 * jax.random.normal(
            kn, warped.shape
        )

        def loss_fn(params):
            semi_a, desc_a = model.apply(params, images)
            semi_b, desc_b = model.apply(params, warped)
            l_det = detector_loss(semi_a, labels_a) + detector_loss(semi_b, labels_b)
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

    train_step = jax.jit(train_step_inner)

    def make_epoch(steps: int, batch: int):
        """Scan `steps` training steps in ONE device program, sampling
        batches from a staged dataset — on the axon relay each separate
        dispatch costs ~50 ms, so per-step host loops would be dominated
        by round trips (CLAUDE.md)."""

        @jax.jit
        def epoch(state, images, corners, cmask, base_key):
            N = images.shape[0]

            def body(st, i):
                k = jax.random.fold_in(base_key, i)
                k1, k2 = jax.random.split(k)
                idx = jax.random.randint(k1, (batch,), 0, N)
                st2, metrics = train_step_inner(
                    st, images[idx], corners[idx], cmask[idx], k2
                )
                return st2, jnp.stack(
                    [metrics["loss"], metrics["det"], metrics["desc"]]
                )

            state, ms = jax.lax.scan(body, state, jnp.arange(steps))
            return state, ms

        return epoch

    return init, train_step, make_epoch


def train_synthetic(steps=50, batch=8, height=120, width=160, seed=0, log_every=10):
    """Short supervised pretraining run on synthetic shapes (corners)."""
    rng = np.random.default_rng(seed)
    init, step_fn, _ = make_trainer(height, width)
    state = init(jax.random.PRNGKey(seed))
    history = []
    for i in range(steps):
        imgs, corners, cmask = synthetic_shapes_batch(rng, batch, height, width)
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 1), i)
        state, metrics = step_fn(
            state, jnp.asarray(imgs), jnp.asarray(corners), jnp.asarray(cmask), key
        )
        history.append({k: float(v) for k, v in metrics.items()})
        if log_every and i % log_every == 0:
            print(f"step {i}: {history[-1]}")
    return state, history


def evaluate_detector(params, seed=123, n_pairs=8, height=120, width=160,
                      max_keypoints=100, conf=0.015, ratio=0.85,
                      family="v1"):
    """Held-out self-eval of trained SuperPoint weights: detector
    repeatability + descriptor match precision between homography-related
    views of FRESH textured renders (worlds never seen in training).

    `family="v2"` evaluates on the HELD-OUT renderer family
    (`synthetic.render_textured_v2`: structured textures, illumination
    field, vignette/gamma) — image statistics the training set never
    contained, bounding the renderer-overfit gap.

    repeatability: fraction of view-A keypoints whose warp lands within
    3 px of a detected view-B keypoint. match_precision: ratio-test
    matches that are geometrically correct under the homography (< 4 px).
    """
    from vslam_tpu.models import superpoint as sp_mod
    from vslam_tpu.ops import matching, nms

    rng = np.random.default_rng(seed)
    imgs, _, _ = textured_batch(rng, n_pairs, height, width, family=family)
    imgs = jnp.asarray(imgs)
    H = random_homographies(jax.random.PRNGKey(seed), n_pairs, height, width)
    warped, _ = warp_images(imgs, H)

    model = sp_mod.SuperPoint()

    @jax.jit
    def extract(images):
        semi, desc_c = model.apply(params, images)
        kps, desc = nms.extract_keypoints(
            semi, desc_c, max_keypoints=max_keypoints, radius=4, conf=conf
        )
        return kps.xy, kps.score, kps.valid, desc

    xy_a, _, va, da = extract(imgs)
    xy_b, _, vb, db = extract(warped)

    hom = jnp.concatenate([xy_a, jnp.ones_like(xy_a[..., :1])], -1)
    w = jnp.einsum("bij,bkj->bki", H, hom)
    wx = w[..., 0] / jnp.maximum(w[..., 2], 1e-8)
    wy = w[..., 1] / jnp.maximum(w[..., 2], 1e-8)
    inb = (wx >= 0) & (wx < width) & (wy >= 0) & (wy < height) & va
    d2 = (wx[:, :, None] - xy_b[:, None, :, 0]) ** 2 + (
        wy[:, :, None] - xy_b[:, None, :, 1]
    ) ** 2
    d2 = jnp.where(vb[:, None, :], d2, 1e9)
    nearest = jnp.sqrt(jnp.min(d2, axis=-1))
    rep = float(jnp.sum((nearest < 3.0) & inb) / jnp.maximum(jnp.sum(inb), 1))

    n_correct = n_matched = 0
    for b in range(n_pairs):
        m = matching.knn2_ratio_match(da[b], db[b], va[b], vb[b], ratio=ratio)
        mv = np.asarray(m.valid)
        j = np.asarray(m.idx)
        err = np.sqrt(
            (np.asarray(wx[b]) - np.asarray(xy_b[b])[j, 0]) ** 2
            + (np.asarray(wy[b]) - np.asarray(xy_b[b])[j, 1]) ** 2
        )
        ok = mv & np.asarray(inb[b])
        n_matched += int(ok.sum())
        n_correct += int((ok & (err < 4.0)).sum())
    return {
        "repeatability": rep,
        "match_precision": n_correct / max(n_matched, 1),
        "matches_per_pair": n_matched / n_pairs,
        "kps_per_image": float(np.asarray(va).sum(-1).mean()),
    }


def train_textured(
    steps=2000,
    batch=16,
    height=120,
    width=160,
    num_images=384,
    seed=0,
    lr=1e-3,
    desc_weight=1.0,
    steps_per_scan=50,
    mix_shapes=0.25,
    log=print,
):
    """The full training recipe behind the committed checkpoint
    (`models/checkpoints/superpoint_synth.npz`): supervised interest
    points on textured room renders (the E2E test distribution) mixed
    with classic synthetic-shapes corners, homographic descriptor pairs,
    scanned-step epochs on device. Deterministic for a fixed seed.

    Returns (TrainState, history: list of (loss, det, desc) rows)."""
    rng = np.random.default_rng(seed)
    steps_per_scan = max(min(steps_per_scan, steps), 1)
    init, _, make_epoch = make_trainer(height, width, lr=lr, desc_weight=desc_weight)
    state = init(jax.random.PRNGKey(seed))

    n_shapes = int(num_images * mix_shapes)
    n_tex = num_images - n_shapes
    imgs_t, c_t, m_t = textured_batch(rng, n_tex, height, width)
    C = c_t.shape[1]
    imgs_s, c_s, m_s = synthetic_shapes_batch(
        rng, n_shapes, height, width, max_corners=C
    )
    images = jnp.asarray(np.concatenate([imgs_t, imgs_s]))
    corners = jnp.asarray(np.concatenate([c_t, c_s]))
    cmask = jnp.asarray(np.concatenate([m_t, m_s]))

    epoch = make_epoch(steps_per_scan, batch)
    history = []
    n_scans = max(steps // steps_per_scan, 1)
    for e in range(n_scans):
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 13), e)
        state, ms = epoch(state, images, corners, cmask, key)
        ms = np.asarray(ms)
        history.extend(ms.tolist())
        if log:
            log(
                f"scan {e + 1}/{n_scans} (step {(e + 1) * steps_per_scan}): "
                f"loss {ms[-1][0]:.4f} det {ms[-1][1]:.4f} desc {ms[-1][2]:.4f}"
            )
    return state, history
