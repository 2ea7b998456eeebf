"""SLAMViewer logic tests against a mock viser module.

viser isn't installed in this environment; a structural mock lets the
viewer's real logic run (backprojection, validity masks, percentile
filtering, frame filters, frustum poses) and catches API drift.
"""

import sys
import types

import numpy as np
import pytest


class _GuiHandle:
    def __init__(self, value):
        self.value = value
        self.options = ["all"]

    def on_update(self, fn):
        self._cb = fn
        return fn

    def trigger(self):
        self._cb(None)


class _Cloud:
    def __init__(self, **kw):
        self.__dict__.update(kw)
        self.removed = False

    def remove(self):
        self.removed = True


class _Frustum(_Cloud):
    def on_click(self, fn):
        self._cb = fn
        return fn


class _Gui:
    def __init__(self):
        self.handles = {}

    def add_slider(self, name, min, max, step, initial_value):
        h = _GuiHandle(initial_value)
        self.handles[name] = h
        return h

    def add_dropdown(self, name, options, initial_value):
        h = _GuiHandle(initial_value)
        h.options = options
        self.handles[name] = h
        return h


class _Scene:
    def __init__(self):
        self.clouds = []
        self.frusta = []
        self.meshes = []

    def add_mesh_simple(self, name, vertices, faces, color):
        m = _Cloud(name=name, vertices=vertices, faces=faces, color=color)
        self.meshes.append(m)
        return m

    def add_mesh(self, name, vertices, faces, colors):
        m = _Cloud(name=name, vertices=vertices, faces=faces, colors=colors)
        self.meshes.append(m)
        return m

    def add_point_cloud(self, name, points, colors, point_size):
        c = _Cloud(name=name, points=points, colors=colors, point_size=point_size)
        self.clouds.append(c)
        return c

    def add_camera_frustum(self, name, fov, aspect, scale, wxyz, position, image):
        f = _Frustum(name=name, fov=fov, aspect=aspect, wxyz=wxyz,
                     position=position, image=image)
        self.frusta.append(f)
        return f


class _Server:
    def __init__(self, host, port):
        self.host, self.port = host, port
        self.gui = _Gui()
        self.scene = _Scene()

    def get_clients(self):
        return {}


@pytest.fixture()
def viewer_cls():
    fake = types.ModuleType("viser")
    fake.ViserServer = _Server
    sys.modules["viser"] = fake
    sys.modules.pop("da3slam_tpu.viz.viewer", None)
    try:
        from da3slam_tpu.viz.viewer import SLAMViewer

        yield SLAMViewer
    finally:
        sys.modules.pop("viser", None)
        sys.modules.pop("da3slam_tpu.viz.viewer", None)


def visible_points(v):
    """Total points across the latest handle of each per-frame cloud."""
    latest = {}
    for c in v.server.scene.clouds:
        latest[c.name] = c
    return sum(c.points.shape[0] for c in latest.values())


def frame_inputs(seed=0, H=24, W=32):
    rng = np.random.default_rng(seed)
    image = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    depth = rng.uniform(0.5, 3.0, (H, W)).astype(np.float32)
    conf = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    E = np.eye(4, dtype=np.float32)[:3]
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    return image, depth, conf, E, K


class TestSLAMViewer:
    def test_add_frame_builds_cloud_and_frustum(self, viewer_cls):
        v = viewer_cls(port=9999, point_stride=2)
        img, depth, conf, E, K = frame_inputs()
        v.add_frame(img, depth, conf, E, K)
        assert len(v.server.scene.frusta) == 1
        assert len(v.server.scene.clouds) == 1
        cloud = v.server.scene.clouds[-1]
        assert cloud.points.shape[1] == 3
        assert cloud.points.shape[0] > 0
        # identity pose → frustum at origin
        np.testing.assert_allclose(v.server.scene.frusta[0].position, 0, atol=1e-6)

    def test_depth_validity_filter(self, viewer_cls):
        v = viewer_cls(port=9999, point_stride=1, min_depth=0.1, max_depth=50)
        img, depth, conf, E, K = frame_inputs()
        depth[:12] = 0.0  # invalid half
        v.add_frame(img, depth, conf, E, K)
        assert v.server.scene.clouds[-1].points.shape[0] == 12 * 32

    def test_conf_percentile_slider(self, viewer_cls):
        v = viewer_cls(port=9999, point_stride=1)
        img, depth, conf, E, K = frame_inputs()
        v.add_frame(img, depth, conf, E, K)
        full = visible_points(v)
        v.gui_conf_percentile.value = 50
        v.gui_conf_percentile.trigger()
        half = visible_points(v)
        assert half == pytest.approx(full / 2, rel=0.1)

    def test_frame_filter(self, viewer_cls):
        v = viewer_cls(port=9999, point_stride=2)
        for i in range(3):
            img, depth, conf, E, K = frame_inputs(seed=i)
            v.add_frame(img, depth, conf, E, K)
        all_pts = visible_points(v)
        v.gui_frame_filter.value = "1"
        v.gui_frame_filter.trigger()
        one = visible_points(v)
        assert one < all_pts
        assert one == v.all_points[1].shape[0]
        assert v.gui_frame_filter.options == ["all", "0", "1", "2"]

    def test_incremental_sends(self, viewer_cls):
        """Steady-state ingest sends only the new frame's points — one new
        cloud handle per frame, no re-send of earlier frames (the reference
        re-sent the whole accumulated map per frame, viewer.py:317-356)."""
        v = viewer_cls(port=9999, point_stride=2)
        sends = []
        for i in range(4):
            img, depth, conf, E, K = frame_inputs(seed=i)
            before = len(v.server.scene.clouds)
            v.add_frame(img, depth, conf, E, K)
            sends.append(len(v.server.scene.clouds) - before)
        assert sends == [1, 1, 1, 1]

    def test_point_budget_display_stride(self, viewer_cls):
        img, depth, conf, E, K = frame_inputs()
        n_per_frame = img.shape[0] * img.shape[1]  # stride 1, all valid
        v = viewer_cls(port=9999, point_stride=1, max_points=int(n_per_frame * 1.5))
        v.add_frame(img, depth, conf, E, K)
        assert v._display_stride == 1
        assert visible_points(v) == n_per_frame
        v.add_frame(img, depth, conf, E, K)  # 2 frames > budget → stride 2
        assert v._display_stride == 2
        assert visible_points(v) <= int(n_per_frame * 1.5)

    def test_flythrough_interpolates_poses(self, viewer_cls):
        from da3slam_tpu.viz.viewer import _slerp

        v = viewer_cls(port=9999, point_stride=4)
        for i in range(2):
            img, depth, conf, E, K = frame_inputs(seed=i)
            E = E.copy()
            E[0, 3] = float(i)  # translate along x
            v.add_frame(img, depth, conf, E, K)
        assert len(v.cam_poses) == 2
        # runs without clients connected
        v.run_demo_flythrough(interval_s=0.0, steps_per_edge=2)
        # slerp endpoints + unit norm
        q0 = np.array([1.0, 0, 0, 0])
        q1 = np.array([np.cos(0.5), np.sin(0.5), 0, 0])
        np.testing.assert_allclose(_slerp(q0, q1, 0.0), q0, atol=1e-6)
        np.testing.assert_allclose(_slerp(q0, q1, 1.0), q1, atol=1e-6)
        mid = _slerp(q0, q1, 0.5)
        assert np.linalg.norm(mid) == pytest.approx(1.0, abs=1e-6)

    def test_chw_float_image_accepted(self, viewer_cls):
        v = viewer_cls(port=9999)
        img, depth, conf, E, K = frame_inputs()
        chw = img.transpose(2, 0, 1) / 255.0
        v.add_frame(chw, depth, conf, E, K)
        assert len(v.server.scene.clouds) == 1


class TestMeshOverlay:
    def test_set_mesh_replaces_handle(self, viewer_cls):
        v = viewer_cls(port=0)
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int64)
        cols = np.stack([[200, 0, 0], [0, 200, 0], [0, 0, 200]]).astype(np.uint8)
        v.set_mesh(verts, faces, colors=cols)
        first = v.server.scene.meshes[-1]
        # per-vertex colors survive when the server exposes add_mesh
        assert first.vertices.shape == (3, 3)
        np.testing.assert_array_equal(first.colors, cols)
        v.set_mesh(verts * 2, faces)
        assert first.removed
        assert v.server.scene.meshes[-1].vertices[1, 0] == 2.0
        # a colorless mesh takes the simple-mesh path (single color)
        assert v.server.scene.meshes[-1].color == (160, 160, 170)

    def test_set_mesh_falls_back_without_vertex_color_api(self, viewer_cls):
        v = viewer_cls(port=0)
        scene_cls = type(v.server.scene)
        saved = scene_cls.add_mesh
        del scene_cls.add_mesh  # older viser: simple mesh only
        try:
            verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
            faces = np.array([[0, 1, 2]], np.int64)
            v.set_mesh(verts, faces, colors=np.full((3, 3), 200, np.uint8))
            assert v.server.scene.meshes[-1].color == (200, 200, 200)
        finally:
            scene_cls.add_mesh = saved
