"""Feature frontend: batched SuperPoint (or ORB fallback) over frame stacks.

The reference extracts features frame-by-frame on the SLAM thread through
ONNX Runtime (`/root/reference/src/FeatureExtractor.cpp:49-118`) with a
binary replay cache for determinism (`:262-381`). Here extraction is a
jitted batch program: frames are stacked into (B, H, W, 1) chunks that
saturate the MXU, keypoint depth is sampled from the depth map at the
detected corners (reference does the nearest-pixel read in the 3D-3D
path, `src/Slam.cpp:243-246`), and the same SPCF/npz cache formats are
supported for deterministic replay.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.config import SlamConfig
from vslam_tpu.core.state import FrameFeatures
from vslam_tpu.models import superpoint as sp
from vslam_tpu.ops import nms


class SuperPointFrontend:
    """Batched SuperPoint extractor bound to a config + params."""

    def __init__(self, config: SlamConfig, params=None, key=None):
        self.config = config
        if params is None:
            from vslam_tpu.models import weights

            params, src = weights.load_or_init_superpoint(
                key or jax.random.PRNGKey(0),
                height=config.camera.height,
                width=config.camera.width,
            )
            self.weight_source = src
        else:
            self.weight_source = "provided"
        self.params = params
        self.model = sp.SuperPoint()
        fc = config.frontend

        @jax.jit
        def _extract(params, images):
            semi, desc_c = self.model.apply(params, images)
            kps, desc = nms.extract_keypoints(
                semi,
                desc_c,
                max_keypoints=fc.max_keypoints,
                radius=fc.sp_nms_radius,
                conf=fc.sp_confidence_threshold,
            )
            return kps.xy, kps.score, kps.valid, desc

        self._extract = _extract

    def extract(self, gray_batch: np.ndarray):
        """(B, H, W) uint8/float grayscale -> (xy, score, valid, desc)."""
        img = jnp.asarray(gray_batch, jnp.float32)
        if img.max() > 1.5:
            img = img / 255.0
        img = img[..., None]
        img, _ = sp.pad_to_multiple(img)
        return self._extract(self.params, img)


class OrbFrontend:
    """ORB fallback frontend with the SuperPointFrontend interface
    (the reference swaps in `cv::ORB::create(3000, 1.2, 8)` when the
    SuperPoint model is absent, `src/FeatureExtractor.cpp:12-15, 210-214`;
    `include/Config.h:48-50`).

    Detection runs at the reference's pyramid parameters (8 levels,
    factor 1.2), vmapped over the whole frame stack in one jitted program
    — no host per-image loop. The keypoint CAPACITY is the pipeline's
    `frontend.max_keypoints` static shape; use `orb_parity_config` to run
    the whole pipeline at the reference's 3000-keypoint budget and
    Hamming-equivalent match gates.
    """

    def __init__(self, config: SlamConfig, num_levels: Optional[int] = None):
        from vslam_tpu.ops import orb

        self.config = config
        fc = config.frontend
        self.num_levels = num_levels or fc.orb_num_levels
        self.weight_source = "orb-fallback"
        K, D = fc.max_keypoints, fc.descriptor_dim
        levels, sf, thr = self.num_levels, fc.orb_scale_factor, fc.orb_fast_threshold

        @jax.jit
        def _extract(imgs):
            def one(img):
                xy, score, valid, desc = orb.detect_orb(
                    img, max_keypoints=K, num_levels=levels,
                    scale_factor=sf, threshold=thr,
                )
                d = desc[:, :D]
                d = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8
                )
                return xy, score, valid, d

            return jax.vmap(one)(imgs)

        self._extract = _extract

    def extract(self, gray_batch: np.ndarray):
        imgs = jnp.asarray(gray_batch, jnp.float32)
        if float(imgs.max()) > 1.5:
            imgs = imgs / 255.0
        return self._extract(imgs)


def orb_parity_config(config: SlamConfig) -> SlamConfig:
    """Config adjusted to the reference's ORB-fallback run semantics
    (`include/Config.h:48-56`): 3000-keypoint capacity and L2 equivalents
    of the BF-Hamming gates. For +-1/sqrt(D) unit descriptors,
    L2^2 = 4*Hamming/D, so DISTANCE_THRESHOLD=30 bits -> L2 =
    2*sqrt(30/D) (~0.68 at D=256) and HAMMING_RATIO_THRESHOLD=0.8 on
    Hamming counts -> sqrt(0.8) on L2."""
    import dataclasses
    import math

    fc = config.frontend
    return config.replace(
        frontend=dataclasses.replace(
            fc,
            max_keypoints=fc.orb_max_keypoints,
            l2_ratio_threshold=math.sqrt(fc.orb_ratio_threshold),
            l2_max_distance=2.0
            * math.sqrt(fc.orb_distance_threshold / fc.descriptor_dim),
        )
    )


def make_frontend(config: SlamConfig, kind: str = "auto", params=None, key=None):
    """Frontend factory: 'superpoint', 'orb', or 'auto' (SuperPoint with
    checkpoint weights if found, else still SuperPoint random-init —
    pass 'orb' explicitly for the classical fallback)."""
    if kind == "orb":
        return OrbFrontend(config)
    return SuperPointFrontend(config, params=params, key=key)


def sample_depth_at_keypoints(depth_maps, kp_xy):
    """Nearest-pixel depth lookup per keypoint (`src/Slam.cpp:243-246`).

    depth_maps: (B, H, W) meters; kp_xy (B, K, 2). Returns (B, K)."""
    B, H, W = depth_maps.shape
    u = jnp.clip(jnp.round(kp_xy[..., 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(kp_xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return jax.vmap(lambda d, vv, uu: d[vv, uu])(depth_maps, v, u)


def extract_sequence(
    frontend: SuperPointFrontend,
    gray_frames: np.ndarray,
    depth_frames: Optional[np.ndarray],
    timestamps: np.ndarray,
    stationary: Optional[np.ndarray] = None,
    batch: Optional[int] = None,
    cache_path: Optional[str] = None,
    frame_indices: Optional[np.ndarray] = None,
) -> FrameFeatures:
    """Run the frontend over a whole sequence -> stacked FrameFeatures.

    If `cache_path` exists it is replayed instead of running inference
    (the reference's sp_cache.bin behavior, `src/main.cpp:1048-1051`);
    otherwise features are extracted and saved there (when given).
    `frame_indices` are the dataset frame ids of `gray_frames` rows, used
    to select cache entries when replaying a cache written at a different
    frame step.
    """
    import os

    from vslam_tpu.io import feature_cache as fc

    cfg = frontend.config
    N = gray_frames.shape[0]
    K = cfg.frontend.max_keypoints
    D = cfg.frontend.descriptor_dim

    if cache_path and os.path.exists(cache_path):
        if cache_path.endswith(".npz"):
            xy, score, desc, valid, cache_ids = fc.load_npz(cache_path)
        else:
            xy, score, desc, valid, cache_ids = fc.to_padded(
                fc.load_spcf(cache_path), K, D
            )
        # Reconcile by dataset frame id whenever possible: a cache written
        # at a different --frame-step must not silently associate features
        # with the wrong frames.
        need_reselect = xy.shape[0] != N or (
            frame_indices is not None
            and not np.array_equal(
                np.asarray(cache_ids, np.int64), np.asarray(frame_indices, np.int64)
            )
        )
        if need_reselect:
            if frame_indices is None:
                raise ValueError(
                    f"feature cache has {xy.shape[0]} frames but the run has "
                    f"{N}; pass frame_indices to subselect (cache written at "
                    f"a different --frame-step?)"
                )
            id_to_row = {int(fid): i for i, fid in enumerate(cache_ids)}
            try:
                rows = np.asarray([id_to_row[int(i)] for i in frame_indices])
            except KeyError as e:
                raise ValueError(f"frame {e} not present in feature cache")
            xy, score, desc, valid = xy[rows], score[rows], desc[rows], valid[rows]
    else:
        B = batch or cfg.runtime.inference_batch
        xs, ss, vs, ds = [], [], [], []
        for i in range(0, N, B):
            chunk = gray_frames[i : i + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:pad])])
            cxy, cs, cv, cd = frontend.extract(chunk)
            n = B - pad
            xs.append(np.asarray(cxy)[:n])
            ss.append(np.asarray(cs)[:n])
            vs.append(np.asarray(cv)[:n])
            ds.append(np.asarray(cd)[:n])
        xy = np.concatenate(xs)
        score = np.concatenate(ss)
        valid = np.concatenate(vs)
        desc = np.concatenate(ds)
        if cache_path:
            # Key entries by DATASET frame id (not row index) so a replay at
            # a different --frame-step reselects correctly.
            ids = frame_indices if frame_indices is not None else np.arange(N)
            if cache_path.endswith(".npz"):
                fc.save_npz(cache_path, xy, score, desc, valid, frame_ids=ids)
            else:
                fc.save_spcf(
                    cache_path,
                    fc.from_padded(xy, score, desc, valid, frame_ids=ids),
                )

    if depth_frames is not None:
        depth = np.asarray(
            sample_depth_at_keypoints(jnp.asarray(depth_frames), jnp.asarray(xy))
        )
    else:
        depth = np.zeros((N, K), np.float32)

    if stationary is None:
        stationary = np.zeros(N, bool)

    return FrameFeatures(
        xy=jnp.asarray(xy),
        desc=jnp.asarray(desc),
        depth=jnp.asarray(depth),
        valid=jnp.asarray(valid),
        timestamp=jnp.asarray(timestamps, jnp.float32),
        stationary=jnp.asarray(stationary),
        frame_id=jnp.arange(N, dtype=jnp.int32),
    )
