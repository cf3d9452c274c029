"""One-program end-to-end pipeline: uint8 frames in, trajectory + dense
cloud out.

The reference does everything per frame under one clock on the SLAM
thread (`/root/reference/src/main.cpp:1096-1309`): decode -> SuperPoint ->
track -> dense voxel accumulation. The round-2 bench timed each stage as
a separate program and summed the per-frame costs; this module is the
measured counterpart — ONE jitted program scanned over frame chunks whose
tracking consumes the frontend's actual output:

  per chunk of C frames:
    uint8 gray  -> normalize -> SuperPoint conv backbone (batched over C)
                -> softmax/d2s decode + NMS + top-K + descriptor sampling
    uint16 depth -> meters -> keypoint depth gather
    -> lax.scan of the full tracking step over the C frames
    -> dense voxel-hash fusion of the chunk (batched insert)

so the MXU-heavy frontend batches across frames while the sequential
state machine scans, all without leaving the device. A multi-sequence
variant batches B independent streams through the same program (the
production throughput configuration).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from vslam_tpu.config import SlamConfig
from vslam_tpu.core import frontend as frontend_mod
from vslam_tpu.core.state import FrameFeatures, TrackState
from vslam_tpu.core.tracking import make_scan_step
from vslam_tpu.core.tracking_batched import make_batched_scan_step
from vslam_tpu.models import superpoint as sp
from vslam_tpu.ops import gridhash, nms


def _frontend_chunk(params, model, gray_u8, config: SlamConfig):
    """(C, H, W) uint8 -> (kps, desc): the whole SuperPoint frontend."""
    fc = config.frontend
    images = (gray_u8.astype(jnp.float32) / 255.0)[..., None]
    semi, desc_c = model.apply(params, images)
    kps, desc = nms.extract_keypoints(
        semi, desc_c, max_keypoints=fc.max_keypoints,
        radius=fc.sp_nms_radius, conf=fc.sp_confidence_threshold,
    )
    if desc.shape[-1] != fc.descriptor_dim:
        # Small-descriptor configs (tests): truncate + renormalize, the
        # same contract the ORB frontend applies.
        desc = desc[..., : fc.descriptor_dim]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
    return kps, desc


def _kp_depth(depth_m, kp_xy, config: SlamConfig):
    """Nearest-pixel keypoint depth (`src/Slam.cpp:243-246`), batched.
    Single implementation lives in `frontend.sample_depth_at_keypoints`."""
    return frontend_mod.sample_depth_at_keypoints(depth_m, kp_xy)


@functools.partial(jax.jit, static_argnames=("config", "seed"))
def run_coupled(
    params,
    state: TrackState,
    dense: gridhash.DenseMapState,
    gray,        # (S, C, H, W) uint8
    depth_u16,   # (S, C, H, W) uint16 (value/depth_scale = meters)
    rgb,         # (S, C, H, W, 3) uint8 or None
    timestamps,  # (S, C) f32
    frame_ids,   # (S, C) int32
    stationary,  # (S, C) bool
    config: SlamConfig,
    seed: int = 42,
    depth_params=None,
):
    """Run the full coupled pipeline over S chunks of C frames.

    `depth_params`: optional DepthNet checkpoint (the mono/MiDaS design
    point, `src/DepthEstimator.cpp:15-112` + scale chain
    `src/Slam.cpp:162-207`): keypoints whose SENSOR depth is invalid get
    depth predicted from the gray image (models/depthnet.py), feeding the
    mono scale chain and depth-backprojected map points. With all-zero
    depth_u16 this is the depth-assisted monocular mode.

    Returns (final TrackState, DenseMapState, StepOutputs stacked
    (S*C, ...)). The caller times this ONE program; a scalar readback of
    the outputs is the completion barrier (CLAUDE.md relay rules).
    """
    model = sp.SuperPoint()
    track = make_scan_step(config, seed=seed)
    c = config.camera
    C = gray.shape[1]
    dn = config.dense

    # Phase 1: frontend + tracking, scanned over chunks. Dense fusion is
    # deliberately NOT in this scan body: sharing a chunk step with the
    # conv stack + tracking scan made the fuse's scatters ~8x slower
    # (1.4 ms/frame vs 0.18 in isolation — XLA schedules the combined
    # body pathologically; scripts/bench_coupled_bisect.py). Keypoint
    # depth reads fuse into the gather, so full-res f32 depth is never
    # materialized here.
    def chunk_step(st, xs):
        g, d16, ts, fids, stat = xs
        kps, desc = _frontend_chunk(params, model, g, config)
        depth_m = d16.astype(jnp.float32) / c.depth_scale
        kpd = _kp_depth(depth_m, kps.xy, config)
        if depth_params is not None:
            from vslam_tpu.models import depthnet

            logd = depthnet.predict_log_depth(depth_params, g)
            kpd_pred = depthnet.sample_log_depth_at_keypoints(logd, kps.xy)
            kpd = jnp.where(kpd > c.depth_min, kpd, kpd_pred)
        frames = FrameFeatures(
            xy=kps.xy, desc=desc, depth=kpd, valid=kps.valid,
            timestamp=ts, stationary=stat, frame_id=fids,
        )
        n_loops0 = jnp.sum(st.loops.valid)
        st, outs = jax.lax.scan(track, st, frames)
        if config.opt.inrun_pgo:
            # In-run loop correction (`pipeline.inrun_pgo_correct`): when
            # this chunk accepted a new loop constraint, relax the pose
            # graph device-side and fold the correction back into the
            # live state so the NEXT chunks track loop-consistently. The
            # cond is never taken on loop-free runs (zero steady cost).
            from vslam_tpu.core import pipeline as pipeline_mod

            st = jax.lax.cond(
                jnp.sum(st.loops.valid) > n_loops0,
                lambda s: pipeline_mod.inrun_pgo_correct(s, config),
                lambda s: s,
                st,
            )
        return st, outs

    state, outs = jax.lax.scan(
        chunk_step, state,
        (gray, depth_u16, timestamps, frame_ids, stationary),
    )

    # Phase 2 (same jitted program): dense voxel fusion over the chunks,
    # consuming the poses phase 1 estimated. Insertion order is identical
    # to per-frame interleaving, so the accumulated cloud is bit-identical
    # — the reference accumulates per frame on the SLAM thread
    # (`src/main.cpp:1081-1146`); here the phases share one clock.
    if rgb is None:
        rgb = jnp.zeros(gray.shape + (3,), jnp.uint8)

    def fuse_step(dst, xs):
        d16, rgb_c, R_c, t_c = xs
        depth_m = d16.astype(jnp.float32) / c.depth_scale
        dst = gridhash.fuse_chunk_scan(
            dst, depth_m, rgb_c, R_c, t_c, c.fx, c.fy, c.cx, c.cy,
            pixel_step=dn.pixel_step, max_depth=dn.max_depth,
            voxel_size=dn.voxel_size,
            frames_per_step=math.gcd(C, dn.fuse_frames_per_insert),
        )
        return dst, None

    dense, _ = jax.lax.scan(
        fuse_step, dense, (depth_u16, rgb, outs.R, outs.t)
    )
    outs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), outs)
    return state, dense, outs


@functools.partial(jax.jit, static_argnames=("config", "seed"))
def run_coupled_batched(
    params,
    states: TrackState,            # leaves (B, ...)
    dense: gridhash.DenseMapState,  # leaves (B, ...)
    gray,        # (S, C, B, H, W) uint8
    depth_u16,   # (S, C, B, H, W) uint16
    timestamps,  # (S, C, B) f32
    frame_ids,   # (S, C, B) int32
    stationary,  # (S, C, B) bool
    config: SlamConfig,
    seed: int = 42,
):
    """Multi-sequence coupled pipeline: B independent streams per chip.

    The frontend batches C*B frames per chunk (one big conv batch); the
    tracking inner scan advances all B members per frame via the
    hand-batched step (rare branches hoisted, `core.tracking_batched`);
    dense fusion vmaps over per-member voxel tables. Dense colors are
    dropped (gray clouds) to keep B full streams resident in HBM.

    Returns (states, dense, outs) with outs leaves (S*C, B, ...).
    """
    model = sp.SuperPoint()
    track = make_batched_scan_step(config, seed=seed)
    c = config.camera
    dn = config.dense
    S, C, B = gray.shape[:3]

    def fuse_member(dst, depth_m, Rs, ts_):
        return gridhash.fuse_chunk_scan(
            dst, depth_m, None, Rs, ts_, c.fx, c.fy, c.cx, c.cy,
            pixel_step=dn.pixel_step, max_depth=dn.max_depth,
            voxel_size=dn.voxel_size,
            frames_per_step=math.gcd(C, dn.fuse_frames_per_insert),
        )

    # Phase 1: frontend + batched tracking over chunks (dense fusion is
    # phase-separated for the same scheduling pathology as run_coupled —
    # see the bisect note there).
    def chunk_step(sts, xs):
        g, d16, ts, fids, stat = xs
        flat = g.reshape((C * B,) + g.shape[2:])
        kps, desc = _frontend_chunk(params, model, flat, config)
        depth_m = d16.astype(jnp.float32) / c.depth_scale
        kpd = _kp_depth(
            depth_m.reshape((C * B,) + depth_m.shape[2:]), kps.xy, config
        )

        def unflat(x):
            return x.reshape((C, B) + x.shape[1:])

        frames = FrameFeatures(
            xy=unflat(kps.xy), desc=unflat(desc), depth=unflat(kpd),
            valid=unflat(kps.valid), timestamp=ts, stationary=stat,
            frame_id=fids,
        )
        sts, outs = jax.lax.scan(track, sts, frames)  # outs: (C, B, ...)
        return sts, outs

    states, outs = jax.lax.scan(
        chunk_step, states,
        (gray, depth_u16, timestamps, frame_ids, stationary),
    )

    # Phase 2: per-member dense fusion over the chunks with the estimated
    # poses (identical insertion order to per-frame interleaving).
    def fuse_step(dst, xs):
        d16, R_c, t_c = xs
        depth_m = d16.astype(jnp.float32) / c.depth_scale
        # (C, B, H, W) -> (B, C, H, W) per-member chunks
        dmem = jnp.swapaxes(depth_m, 0, 1)
        Rs = jnp.swapaxes(R_c, 0, 1)
        tps = jnp.swapaxes(t_c, 0, 1)
        dst = jax.vmap(fuse_member)(dst, dmem, Rs, tps)
        return dst, None

    dense, _ = jax.lax.scan(
        fuse_step, dense, (depth_u16, outs.R, outs.t)
    )
    outs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), outs)
    return states, dense, outs
