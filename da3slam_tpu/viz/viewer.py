"""Incremental SLAM viewer on viser (reference viewer.py:12-434).

Feature parity with the reference viewer: accumulating world point cloud
with confidence-percentile filtering, per-frame camera frusta with fly-to
on click, frame-selector filtering, and a demo fly-through mode.  The
backprojection runs through the framework's canonical geometry
(core/geometry.py) instead of the vendored VGGT copy the reference used
(viewer.py:198 → src/vggt/utils/geometry.py:14).

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


class SLAMViewer:
    def __init__(
        self,
        port: int = 8080,
        point_stride: int = 4,
        max_depth: float = 50.0,
        min_depth: float = 0.1,
    ):
        self.server = viser.ViserServer(host="0.0.0.0", port=port)
        self.point_stride = point_stride
        self.max_depth = max_depth
        self.min_depth = min_depth

        self.all_points: list[np.ndarray] = []
        self.all_colors: list[np.ndarray] = []
        self.all_confs: list[np.ndarray] = []
        self.frame_ids: list[int] = []
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
            self._update_point_cloud()

        @self.gui_frame_filter.on_update
        def _(_evt) -> None:
            self._update_point_cloud()

        @self.gui_point_size.on_update
        def _(_evt) -> None:
            self._update_point_cloud()

        self._cloud = None

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
            self.all_points.append(pts_s[valid])
            self.all_colors.append(cols_s[valid])
            self.all_confs.append(conf_s[valid])
            self.frame_ids.append(self._frame_count)
            self.gui_frame_filter.options = ["all"] + [str(i) for i in self.frame_ids]

        self._add_camera_visualization(extrinsic, intrinsic, image)
        self._update_point_cloud()
        self._frame_count += 1

    # -- camera frusta -----------------------------------------------------
    def _add_camera_visualization(self, extrinsic, intrinsic, image) -> None:
        c2w = np.asarray(se3_inverse(jnp.asarray(extrinsic, jnp.float32)))
        quat = np.asarray(rotmat_to_quat(jnp.asarray(c2w[:3, :3])))
        pos = c2w[:3, 3]
        h, w = image.shape[:2]
        fov = 2 * np.arctan2(h / 2, float(np.asarray(intrinsic)[1, 1]))
        idx = self._frame_count
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
    def _update_point_cloud(self) -> None:
        with self._lock:
            if not self.all_points:
                return
            sel = self.gui_frame_filter.value
            if sel == "all":
                pts = np.concatenate(self.all_points)
                cols = np.concatenate(self.all_colors)
                confs = np.concatenate(self.all_confs)
            else:
                i = self.frame_ids.index(int(sel))
                pts, cols, confs = self.all_points[i], self.all_colors[i], self.all_confs[i]

        pct = self.gui_conf_percentile.value
        if pct > 0 and confs.size:
            thresh = np.percentile(confs, pct)
            keep = confs >= thresh
            pts, cols = pts[keep], cols[keep]

        if self._cloud is not None:
            self._cloud.remove()
        self._cloud = self.server.scene.add_point_cloud(
            "/map",
            points=pts.astype(np.float32),
            colors=cols.astype(np.uint8),
            point_size=float(self.gui_point_size.value),
        )

    # -- demo mode ---------------------------------------------------------
    def run_demo_flythrough(self, interval_s: float = 0.5) -> None:
        """Fly the client camera along the recorded trajectory."""
        for idx in self.frame_ids:
            for client in self.server.get_clients().values():
                client.camera.position = self.all_points[idx].mean(axis=0)
            time.sleep(interval_s)

    def keep_alive(self) -> None:
        while True:
            time.sleep(1.0)
