"""Incremental SLAM viewer on viser (reference viewer.py:12-434).

Feature parity with the reference viewer: accumulating world point cloud
with confidence-percentile filtering, per-frame camera frusta with fly-to
on click, frame-selector filtering, and a demo fly-through mode.  The
backprojection runs through the framework's canonical geometry
(core/geometry.py) instead of the vendored VGGT copy the reference used
(viewer.py:198 → src/vggt/utils/geometry.py:14).

Two deliberate improvements over the reference:

- **Incremental cloud updates.** The reference re-vstacks and re-sends the
  entire accumulated cloud to the browser on every frame
  (viewer.py:317-356 — its known viz hot spot, SURVEY.md §3.1).  Here each
  frame owns its own scene handle, so steady-state ingest sends only the
  new frame's points; full re-sends happen only on GUI filter changes or
  when the global point budget forces a coarser display stride (amortized
  O(log total)).
- **Trajectory fly-through.** The reference demo mode flies the client
  camera between recorded *camera poses* (viewer.py:366-389); this one
  does too, with slerp/lerp interpolation between keyframes instead of
  discrete jumps.

Importing this module requires ``viser``; callers (SLAMSolver) degrade to
headless when it is missing, like the reference (solver.py:73-78).
"""

from __future__ import annotations

import threading
import time

import numpy as np

import viser  # hard import by design: ImportError → headless fallback upstream

import jax.numpy as jnp

from da3slam_tpu.core.geometry import backproject_depth
from da3slam_tpu.core.transforms import rotmat_to_quat, se3_inverse


def _slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    """Spherical interpolation between wxyz quaternions."""
    d = float(np.dot(q0, q1))
    if d < 0.0:  # take the short arc
        q1, d = -q1, -d
    if d > 0.9995:  # nearly parallel: lerp + renormalise
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    theta = np.arccos(np.clip(d, -1.0, 1.0))
    s = np.sin(theta)
    return (np.sin((1.0 - t) * theta) * q0 + np.sin(t * theta) * q1) / s


class SLAMViewer:
    def __init__(
        self,
        port: int = 8080,
        point_stride: int = 4,
        max_depth: float = 50.0,
        min_depth: float = 0.1,
        max_points: int = 2_000_000,
    ):
        self.server = viser.ViserServer(host="0.0.0.0", port=port)
        self.point_stride = point_stride
        self.max_depth = max_depth
        self.min_depth = min_depth
        self.max_points = max_points

        self.all_points: list[np.ndarray] = []
        self.all_colors: list[np.ndarray] = []
        self.all_confs: list[np.ndarray] = []
        self.frame_ids: list[int] = []
        self.cam_poses: list[tuple[np.ndarray, np.ndarray]] = []  # (wxyz, pos)
        self._frame_count = 0
        self._lock = threading.Lock()

        self.gui_conf_percentile = self.server.gui.add_slider(
            "conf percentile", min=0, max=99, step=1, initial_value=0
        )
        self.gui_frame_filter = self.server.gui.add_dropdown(
            "frames", options=["all"], initial_value="all"
        )
        self.gui_point_size = self.server.gui.add_slider(
            "point size", min=0.0005, max=0.02, step=0.0005, initial_value=0.002
        )

        @self.gui_conf_percentile.on_update
        def _(_evt) -> None:
            self._refresh_all()

        @self.gui_frame_filter.on_update
        def _(_evt) -> None:
            self._refresh_all()

        @self.gui_point_size.on_update
        def _(_evt) -> None:
            self._refresh_all()

        # per-frame scene handles; display stride applied on top of the
        # ingest stride when the point budget is exceeded
        self._clouds: dict[int, object] = {}
        self._display_stride = 1

    # -- ingestion ---------------------------------------------------------
    def add_frame(self, image, depth, conf, extrinsic, intrinsic) -> None:
        """image [H,W,3] uint8 or [3,H,W] float; depth/conf [H,W];
        extrinsic [3,4] w2c; intrinsic [3,3]."""
        image = np.asarray(image)
        if image.ndim == 3 and image.shape[0] == 3:  # CHW float -> HWC uint8
            image = np.transpose(image, (1, 2, 0))
            if image.max() <= 1.0:
                image = (image * 255).astype(np.uint8)
        depth = np.asarray(depth).squeeze()
        conf = np.asarray(conf).squeeze()

        pts = np.asarray(
            backproject_depth(
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(intrinsic, jnp.float32),
                jnp.asarray(extrinsic, jnp.float32),
            )
        )
        s = self.point_stride
        pts_s = pts[::s, ::s].reshape(-1, 3)
        cols_s = image[::s, ::s].reshape(-1, 3)
        conf_s = conf[::s, ::s].reshape(-1)
        d_s = depth[::s, ::s].reshape(-1)
        valid = (
            np.isfinite(pts_s).all(axis=1)
            & (d_s > self.min_depth)
            & (d_s < self.max_depth)
        )

        with self._lock:
            idx = self._frame_count
            self._frame_count += 1
            self.all_points.append(pts_s[valid])
            self.all_colors.append(cols_s[valid])
            self.all_confs.append(conf_s[valid])
            self.frame_ids.append(idx)
            self.gui_frame_filter.options = ["all"] + [str(i) for i in self.frame_ids]

        self._add_camera_visualization(idx, extrinsic, intrinsic, image)

        total = sum(p.shape[0] for p in self.all_points)
        stride = max(1, int(np.ceil(total / self.max_points)))
        if stride != self._display_stride:
            self._display_stride = stride
            self._refresh_all()  # budget crossed: re-send everything coarser
        else:
            self._send_frame(idx)  # steady state: send only the new frame

    # -- camera frusta -----------------------------------------------------
    def _add_camera_visualization(self, idx, extrinsic, intrinsic, image) -> None:
        c2w = np.asarray(se3_inverse(jnp.asarray(extrinsic, jnp.float32)))
        quat = np.asarray(rotmat_to_quat(jnp.asarray(c2w[:3, :3])))
        pos = c2w[:3, 3]
        with self._lock:
            self.cam_poses.append((quat, pos))
        h, w = image.shape[:2]
        fov = 2 * np.arctan2(h / 2, float(np.asarray(intrinsic)[1, 1]))
        frustum = self.server.scene.add_camera_frustum(
            f"/cameras/frame_{idx}",
            fov=float(fov),
            aspect=w / h,
            scale=0.03,
            wxyz=quat,
            position=pos,
            image=image[::4, ::4],
        )

        @frustum.on_click
        def _(_evt) -> None:
            for client in self.server.get_clients().values():
                with client.atomic():
                    client.camera.wxyz = quat
                    client.camera.position = pos

    # -- point cloud -------------------------------------------------------
    def _conf_threshold(self) -> float | None:
        """Global confidence-percentile threshold over all kept points."""
        pct = self.gui_conf_percentile.value
        if pct <= 0 or not self.all_confs:
            return None
        confs = np.concatenate(self.all_confs)
        return float(np.percentile(confs, pct)) if confs.size else None

    def _send_frame(self, idx: int, thresh: float | None = ...) -> None:
        """(Re-)send one frame's points under the current filters."""
        with self._lock:
            pts = self.all_points[idx]
            cols = self.all_colors[idx]
            confs = self.all_confs[idx]
        if thresh is ...:
            thresh = self._conf_threshold()
        sel = self.gui_frame_filter.value
        visible = sel == "all" or int(sel) == idx
        if thresh is not None:
            keep = confs >= thresh
            pts, cols = pts[keep], cols[keep]
        ds = self._display_stride
        if ds > 1:
            pts, cols = pts[::ds], cols[::ds]
        if not visible:
            pts = pts[:0]
            cols = cols[:0]

        old = self._clouds.get(idx)
        self._clouds[idx] = self.server.scene.add_point_cloud(
            f"/map/frame_{idx}",
            points=pts.astype(np.float32),
            colors=cols.astype(np.uint8),
            point_size=float(self.gui_point_size.value),
        )
        if old is not None:
            try:
                old.remove()
            except Exception:
                pass

    def _refresh_all(self) -> None:
        thresh = self._conf_threshold()
        for idx in list(self.frame_ids):
            self._send_frame(idx, thresh)

    # kept for API compatibility with round-1 callers/tests
    def _update_point_cloud(self) -> None:
        self._refresh_all()

    # -- mesh overlay --------------------------------------------------------
    def set_mesh(self, vertices, faces, colors=None) -> None:
        """Show (or replace) a fused TSDF mesh (inout/mesh.py) alongside the
        per-frame clouds.  Per-vertex ``colors`` (uint8) render as such when
        the viser build exposes a vertex-color mesh API (``scene.add_mesh``);
        older builds only take one color per mesh (``add_mesh_simple``), so
        the mean color is used there — the exported PLY always keeps the
        full per-vertex colors either way."""
        import numpy as _np

        verts = _np.asarray(vertices, _np.float32)
        tris = _np.asarray(faces, _np.int32)
        with self._lock:
            if getattr(self, "_mesh_handle", None) is not None:
                self._mesh_handle.remove()
            handle = None
            add_mesh = getattr(self.server.scene, "add_mesh", None)
            if colors is not None and add_mesh is not None:
                try:
                    handle = add_mesh(
                        "/scene_mesh", vertices=verts, faces=tris,
                        colors=_np.asarray(colors, _np.uint8).reshape(-1, 3),
                    )
                except TypeError:  # older signature without per-vertex colors
                    handle = None
            if handle is None:
                color = (
                    tuple(int(c) for c in _np.asarray(colors).reshape(-1, 3).mean(0))
                    if colors is not None
                    else (160, 160, 170)
                )
                handle = self.server.scene.add_mesh_simple(
                    "/scene_mesh", vertices=verts, faces=tris, color=color,
                )
            self._mesh_handle = handle

    # -- demo mode ---------------------------------------------------------
    def run_demo_flythrough(
        self, interval_s: float = 0.5, steps_per_edge: int = 12
    ) -> None:
        """Fly the client camera along the recorded trajectory, slerping
        rotation and lerping position between consecutive camera poses
        (reference viewer.py:366-389 demo mode, plus interpolation)."""
        with self._lock:
            poses = list(self.cam_poses)
        if not poses:
            return
        dt = interval_s / max(steps_per_edge, 1)
        for (q0, p0), (q1, p1) in zip(poses[:-1], poses[1:]):
            for step in range(steps_per_edge):
                t = (step + 1) / steps_per_edge
                quat = _slerp(q0, q1, t)
                pos = (1.0 - t) * p0 + t * p1
                for client in self.server.get_clients().values():
                    with client.atomic():
                        client.camera.wxyz = quat
                        client.camera.position = pos
                time.sleep(dt)

    def keep_alive(self) -> None:
        while True:
            time.sleep(1.0)
