import numpy as np
import pytest

from da3slam_tpu import native
from da3slam_tpu.inout.ply import read_ply, write_ply


class TestNativeBuild:
    def test_builds_and_loads(self):
        assert native.is_available(), "g++ toolchain present; native lib must build"


class TestVoxelDownsample:
    def test_matches_numpy_fallback(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (5000, 3), dtype=np.uint8)

        n_pts, n_cols = native.voxel_downsample(pts, cols, voxel=0.2)
        # force the numpy fallback for comparison
        import da3slam_tpu.native as mod

        lib, mod._lib, mod._load_failed = mod._lib, None, True
        try:
            f_pts, f_cols = native.voxel_downsample(pts, cols, voxel=0.2)
        finally:
            mod._lib, mod._load_failed = lib, False

        assert n_pts.shape == f_pts.shape
        # same voxel set (order-independent): sort both by coordinates
        def canon(a):
            return a[np.lexsort(a.T)]

        np.testing.assert_allclose(canon(n_pts), canon(f_pts), atol=1e-4)

    def test_reduces_count_and_averages(self):
        # two clusters far apart -> exactly 2 voxels at their centroids
        a = np.full((100, 3), 0.05, np.float32) + np.random.default_rng(1).normal(
            size=(100, 3)
        ).astype(np.float32) * 0.001
        b = a + 5.0
        pts, _ = native.voxel_downsample(np.concatenate([a, b]), voxel=1.0)
        assert pts.shape[0] == 2
        centers = pts[np.argsort(pts[:, 0])]
        np.testing.assert_allclose(centers[0], a.mean(0), atol=1e-3)
        np.testing.assert_allclose(centers[1], b.mean(0), atol=1e-3)

    def test_nan_points_dropped(self):
        pts = np.zeros((10, 3), np.float32)
        pts[::2] = np.nan
        out, _ = native.voxel_downsample(pts, voxel=0.5)
        assert out.shape[0] == 1 and np.isfinite(out).all()


class TestNativePly:
    def test_roundtrip_through_inout(self, tmp_path):
        """write_ply/read_ply now route through the C++ fast path; the
        result must be identical to before."""
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(10000, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (10000, 3), dtype=np.uint8)
        write_ply(tmp_path / "n.ply", pts, cols)
        p2, c2 = read_ply(tmp_path / "n.ply")
        np.testing.assert_array_equal(p2, pts)
        np.testing.assert_array_equal(c2, cols)

    def test_no_color_roundtrip(self, tmp_path):
        pts = np.arange(30, dtype=np.float32).reshape(10, 3)
        write_ply(tmp_path / "m.ply", pts)
        p2, c2 = read_ply(tmp_path / "m.ply")
        np.testing.assert_array_equal(p2, pts)
        assert c2 is None

    def test_3dgs_splat_writer_matches_numpy_path(self, tmp_path):
        """The fused C++ splat exporter (write_3dgs_splats) must reproduce
        the NumPy pipeline (_splat_frames + quats + filter + export) to
        float32 round-off, record for record."""
        from da3slam_tpu.inout import export3d as e3

        class P:
            pass

        rng = np.random.default_rng(7)
        N, H, W = 3, 40, 36
        p = P()
        p.depth = rng.uniform(0.5, 3.0, (N, H, W)).astype(np.float32)
        p.depth[0, 5, 5] = 0.0  # filtered: non-positive depth
        p.conf = rng.uniform(0.5, 2.0, (N, H, W)).astype(np.float32)
        K = np.zeros((N, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = 30.0
        K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1.0
        p.intrinsics = K
        E = np.tile(np.eye(4, dtype=np.float32)[:3], (N, 1, 1))
        E[1, :3, 3] = [0.3, -0.1, 0.2]
        p.extrinsics = E
        p.processed_images = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)

        n_native = e3.prediction_to_3dgs(p, tmp_path / "n.ply", conf_threshold=1.0)

        import da3slam_tpu.native as mod

        lib, mod._lib, mod._load_failed = mod._lib, None, True
        try:
            n_py = e3.prediction_to_3dgs(p, tmp_path / "p.ply", conf_threshold=1.0)
        finally:
            mod._lib, mod._load_failed = lib, False

        assert n_native == n_py > 0
        a = e3.read_3dgs_ply(tmp_path / "n.ply")
        b = e3.read_3dgs_ply(tmp_path / "p.ply")
        for key in a:
            np.testing.assert_allclose(a[key], b[key], atol=5e-6, err_msg=key)

    def test_3dgs_float_images_match_numpy_path(self, tmp_path):
        """Float images in [0,1] (e.g. straight from preprocess) must come
        out with the same colors on both paths — a raw uint8 cast would
        truncate them all to black (round-4 review finding)."""
        from da3slam_tpu.inout import export3d as e3

        class P:
            pass

        rng = np.random.default_rng(11)
        N, H, W = 2, 24, 20
        p = P()
        p.depth = rng.uniform(0.5, 3.0, (N, H, W)).astype(np.float32)
        p.conf = rng.uniform(1.2, 2.0, (N, H, W)).astype(np.float32)
        K = np.zeros((N, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = 18.0
        K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1.0
        p.intrinsics = K
        p.extrinsics = np.tile(np.eye(4, dtype=np.float32)[:3], (N, 1, 1))
        p.processed_images = rng.uniform(0.0, 1.0, (N, H, W, 3)).astype(np.float32)

        n_native = e3.prediction_to_3dgs(p, tmp_path / "n.ply", conf_threshold=1.0)

        import da3slam_tpu.native as mod

        lib, mod._lib, mod._load_failed = mod._lib, None, True
        try:
            n_py = e3.prediction_to_3dgs(p, tmp_path / "p.ply", conf_threshold=1.0)
        finally:
            mod._lib, mod._load_failed = lib, False

        assert n_native == n_py > 0
        a = e3.read_3dgs_ply(tmp_path / "n.ply")
        b = e3.read_3dgs_ply(tmp_path / "p.ply")
        # colors survive (not truncated to black) and match to the u8
        # quantization step (0.5/255)
        assert a["colors"].max() > 0.5
        np.testing.assert_allclose(a["colors"], b["colors"], atol=0.5 / 255 + 1e-6)
        for key in ("points", "scales", "opacity", "rotations"):
            np.testing.assert_allclose(a[key], b[key], atol=5e-6, err_msg=key)

    def test_no_native_fallback_backprojects_once(self, monkeypatch, tmp_path):
        """Without the native library the NumPy fallback must not pay the
        full-grid backprojection twice (round-4 review finding)."""
        from da3slam_tpu.inout import export3d as e3

        class P:
            pass

        rng = np.random.default_rng(5)
        N, H, W = 1, 16, 16
        p = P()
        p.depth = rng.uniform(0.5, 2.0, (N, H, W)).astype(np.float32)
        p.conf = np.full((N, H, W), 1.5, np.float32)
        K = np.zeros((N, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = 12.0
        K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1.0
        p.intrinsics = K
        p.extrinsics = np.tile(np.eye(4, dtype=np.float32)[:3], (N, 1, 1))
        p.processed_images = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)

        calls = []
        orig = e3._backproject_np
        monkeypatch.setattr(e3, "_backproject_np",
                            lambda *a, **k: calls.append(1) or orig(*a, **k))
        import da3slam_tpu.native as mod

        lib, mod._lib, mod._load_failed = mod._lib, None, True
        try:
            n = e3.prediction_to_3dgs(p, tmp_path / "f.ply", conf_threshold=1.0)
        finally:
            mod._lib, mod._load_failed = lib, False
        assert n > 0
        assert len(calls) == 1

    def test_python_reader_still_reads_native_file(self, tmp_path):
        """Format compatibility: C++-written file must parse with the pure
        Python reader (and vice versa)."""
        import da3slam_tpu.native as mod

        rng = np.random.default_rng(3)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (100, 3), dtype=np.uint8)
        assert native.write_ply_native(tmp_path / "x.ply", pts, cols)

        lib, mod._lib, mod._load_failed = mod._lib, None, True
        try:
            p2, c2 = read_ply(tmp_path / "x.ply")
        finally:
            mod._lib, mod._load_failed = lib, False
        np.testing.assert_array_equal(p2, pts)
        np.testing.assert_array_equal(c2, cols)
