"""Offline 3D viewer + HUD: the Pangolin-viewer equivalent.

The reference runs a live Pangolin GL window (`/root/reference/src/
Viewer.cpp:1-437`): trajectory line, keyframe frustums, EMA-smoothed
current-camera frustum, height-colored dense points, cyan sparse points,
follow/top/side camera modes, plus an OpenCV HUD with match statistics
(`src/main.cpp:1218-1302`). A TPU batch pipeline has no interactive GL
loop, so this module renders the same content headlessly (matplotlib Agg)
to PNG frames / an MP4, with the same visual vocabulary: call
`render_scene` per frame or `render_run` for a whole RunResult.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


@dataclass
class ViewerConfig:
    width: int = 1024
    height: int = 768
    follow: bool = True  # follow-camera (Viewer.cpp:402-437)
    mode: str = "free"  # free | top | side (UI buttons, Viewer.cpp:60-66)
    show_dense: bool = True
    show_sparse: bool = True
    frustum_scale: float = 0.15
    ema_alpha: float = 0.15  # current-frustum smoothing (Viewer.cpp:244-253)
    trajectory_scale: float = 1.0
    max_points_drawn: int = 60000


def _frustum_lines(R, t, scale):
    """Camera frustum wireframe points (world frame)."""
    w, h, z = 0.8 * scale, 0.6 * scale, 1.0 * scale
    corners = np.array(
        [[0, 0, 0], [w, h, z], [-w, h, z], [-w, -h, z], [w, -h, z]], dtype=np.float32
    )
    pts = corners @ R.T + t
    segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[a], pts[b]) for a, b in segs]


def _height_colors(y):
    """Height-based color ramp (viridis-like, Viewer.cpp:328-344)."""
    lo, hi = np.percentile(y, 5), np.percentile(y, 95)
    tt = np.clip((y - lo) / max(hi - lo, 1e-6), 0, 1)
    return plt.cm.viridis(1.0 - tt)


@dataclass
class Viewer:
    config: ViewerConfig = field(default_factory=ViewerConfig)
    _ema_R: Optional[np.ndarray] = None
    _ema_t: Optional[np.ndarray] = None

    def render_scene(
        self,
        trajectory,
        cur_R=None,
        cur_t=None,
        kf_R=None,
        kf_t=None,
        dense_xyz=None,
        dense_rgb=None,
        sparse_xyz=None,
        gt_trajectory=None,
        loop_edges=None,
        hud_lines=(),
        out_path=None,
    ):
        """Render one 3D scene frame; returns the figure (or saves PNG)."""
        cfg = self.config
        fig = plt.figure(figsize=(cfg.width / 100, cfg.height / 100), dpi=100)
        ax = fig.add_subplot(111, projection="3d")
        ax.set_facecolor("black")
        fig.patch.set_facecolor("black")

        traj = np.asarray(trajectory) * cfg.trajectory_scale
        if len(traj):
            ax.plot(traj[:, 0], traj[:, 2], -traj[:, 1], color="lime", lw=1.2)
        if gt_trajectory is not None:
            g = np.asarray(gt_trajectory) * cfg.trajectory_scale
            ax.plot(g[:, 0], g[:, 2], -g[:, 1], color="orange", lw=0.8, alpha=0.7)

        # Keyframe frustums
        if kf_R is not None and kf_t is not None:
            for R, t in zip(np.asarray(kf_R), np.asarray(kf_t)):
                for a, b in _frustum_lines(R, t, cfg.frustum_scale * 0.6):
                    ax.plot(*zip([a[0], a[2], -a[1]], [b[0], b[2], -b[1]]),
                            color="deepskyblue", lw=0.5, alpha=0.7)

        # Current camera frustum with EMA interpolation (Viewer.cpp:244-253)
        if cur_R is not None and cur_t is not None:
            cur_R = np.asarray(cur_R)
            cur_t = np.asarray(cur_t)
            if self._ema_R is None:
                self._ema_R, self._ema_t = cur_R, cur_t
            a = cfg.ema_alpha
            self._ema_t = (1 - a) * self._ema_t + a * cur_t
            self._ema_R = cur_R  # rotation snaps (visual nicety only)
            for p, q in _frustum_lines(self._ema_R, self._ema_t, cfg.frustum_scale):
                ax.plot(*zip([p[0], p[2], -p[1]], [q[0], q[2], -q[1]]),
                        color="red", lw=1.5)

        # Dense cloud, height-colored
        if cfg.show_dense and dense_xyz is not None and len(dense_xyz):
            d = np.asarray(dense_xyz)
            if len(d) > cfg.max_points_drawn:
                sel = np.random.default_rng(0).choice(len(d), cfg.max_points_drawn, replace=False)
                d = d[sel]
                dense_rgb = None if dense_rgb is None else np.asarray(dense_rgb)[sel]
            colors = (
                np.asarray(dense_rgb) / 255.0
                if dense_rgb is not None
                else _height_colors(-d[:, 1])
            )
            ax.scatter(d[:, 0], d[:, 2], -d[:, 1], c=colors, s=0.3, linewidths=0)

        # Sparse map points, cyan (Viewer.cpp:311-325)
        if cfg.show_sparse and sparse_xyz is not None and len(sparse_xyz):
            s = np.asarray(sparse_xyz)
            if len(s) > cfg.max_points_drawn:
                s = s[np.random.default_rng(1).choice(len(s), cfg.max_points_drawn, replace=False)]
            ax.scatter(s[:, 0], s[:, 2], -s[:, 1], c="cyan", s=0.8, linewidths=0)

        if loop_edges is not None:
            for (p, q) in loop_edges:
                ax.plot(*zip([p[0], p[2], -p[1]], [q[0], q[2], -q[1]]),
                        color="magenta", lw=1.0)

        # Camera modes
        if cfg.mode == "top":
            ax.view_init(elev=89, azim=-90)
        elif cfg.mode == "side":
            ax.view_init(elev=0, azim=-90)
        else:
            ax.view_init(elev=25, azim=-60)
        if cfg.follow and cur_t is not None:
            c = np.asarray(cur_t)
            r = 3.0
            ax.set_xlim(c[0] - r, c[0] + r)
            ax.set_ylim(c[2] - r, c[2] + r)
            ax.set_zlim(-c[1] - r, -c[1] + r)
        ax.set_axis_off()

        # HUD text block (match counts etc., main.cpp:1220-1260)
        for i, line in enumerate(hud_lines):
            fig.text(0.01, 0.97 - 0.03 * i, line, color="white", fontsize=9,
                     family="monospace")

        fig.tight_layout(pad=0)
        if out_path:
            fig.savefig(out_path, facecolor="black")
            plt.close(fig)
            return out_path
        return fig


def hud_text(outputs, i):
    """Per-frame HUD lines from StepOutputs diagnostics
    (`src/main.cpp:1220-1260`): counters, epipolar error before/after the
    fundamental gate, backend label, and event badges."""
    o = outputs
    lines = [
        f"frame {i}",
        f"matches  {int(np.asarray(o.num_matches)[i])}",
        f"inliers  {int(np.asarray(o.num_inliers)[i])}",
        f"tracked  {int(np.asarray(o.num_tracked)[i])}",
        f"epi err  {float(np.asarray(o.epi_before)[i]):.2f} -> "
        f"{float(np.asarray(o.epi_after)[i]):.2f} px",
        f"backend  {'3D-3D' if bool(np.asarray(o.used_3d3d)[i]) else 'E-matrix'}",
        f"keyframe {'YES' if bool(np.asarray(o.is_keyframe)[i]) else 'no'}",
        f"tracking {'OK' if bool(np.asarray(o.tracking_ok)[i]) else 'LOST'}",
    ]
    if bool(np.asarray(o.bridged)[i]):
        lines.append("BRIDGE KF")
    if bool(np.asarray(o.recovered)[i]):
        lines.append("PNP RECOVERY")
    return lines


def loop_edges_from_state(st):
    """Loop-closure edge segments (world positions of the two keyframe
    endpoints) from the tracked state's constraint ring — the reference
    implements `draw_loop_edges` (`src/Viewer.cpp:76-130`) but never calls
    it; here the edges render whenever constraints exist."""
    kf_t = np.asarray(st.keyframes.t)
    kf_valid = np.asarray(st.keyframes.valid)
    edges = []
    for a, b, v in zip(
        np.asarray(st.loops.kf_from), np.asarray(st.loops.kf_to),
        np.asarray(st.loops.valid),
    ):
        if v and 0 <= a < len(kf_t) and 0 <= b < len(kf_t):
            if kf_valid[a] and kf_valid[b]:
                edges.append((kf_t[a], kf_t[b]))
    return edges


def render_run(result, out_dir, every=10, seq=None, dense=None, config=None):
    """Render a RunResult to PNG frames (one per `every` frames) plus a
    final overview; returns the list of file paths."""
    os.makedirs(out_dir, exist_ok=True)
    viewer = Viewer(config or ViewerConfig())
    st = result.final_state
    kf_valid = np.asarray(st.keyframes.valid)
    kf_R = np.asarray(st.keyframes.R)[kf_valid]
    kf_t = np.asarray(st.keyframes.t)[kf_valid]
    sparse = np.asarray(st.map.pos)[np.asarray(st.map.valid)]
    loop_edges = loop_edges_from_state(st) or None
    paths = []
    N = result.t.shape[0]
    for i in range(0, N, every):
        p = os.path.join(out_dir, f"frame_{i:05d}.png")
        viewer.render_scene(
            result.t_smoothed[: i + 1],
            cur_R=result.R[i],
            cur_t=result.t_smoothed[i],
            kf_R=kf_R,
            kf_t=kf_t,
            sparse_xyz=sparse,
            dense_xyz=None if dense is None else dense[0],
            dense_rgb=None if dense is None else dense[1],
            gt_trajectory=None if seq is None else seq.t[: i + 1],
            loop_edges=loop_edges,
            hud_lines=hud_text(result.outputs, i),
            out_path=p,
        )
        paths.append(p)
    return paths
