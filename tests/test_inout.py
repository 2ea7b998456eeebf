import numpy as np
import pytest

from da3slam_tpu.inout import (
    load_config,
    load_image_paths,
    extract_keyframes,
    write_ply,
    read_ply,
    merge_ply_files,
    save_camera_poses,
    load_camera_poses,
)


class TestConfig:
    def test_load_simple(self, tmp_path):
        (tmp_path / "a.yaml").write_text("Model:\n  chunk_size: 15\n  overlap_size: 1\n")
        cfg = load_config(tmp_path / "a.yaml")
        assert cfg["Model"]["chunk_size"] == 15

    def test_inherit_deep_merge(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "Model:\n  chunk_size: 15\n  port: 8080\nWeights:\n  DA3: small\n"
        )
        (tmp_path / "child.yaml").write_text(
            f"inherit_from: base.yaml\nModel:\n  chunk_size: 8\n"
        )
        cfg = load_config(tmp_path / "child.yaml")
        assert cfg["Model"]["chunk_size"] == 8  # overridden
        assert cfg["Model"]["port"] == 8080  # inherited
        assert cfg["Weights"]["DA3"] == "small"  # inherited


class TestImages:
    def test_numeric_sort(self, tmp_path):
        for name in ["frame10.jpg", "frame2.jpg", "frame1.png"]:
            (tmp_path / name).touch()
        paths = load_image_paths(tmp_path)
        names = [p.split("/")[-1] for p in paths]
        assert names == ["frame1.png", "frame2.jpg", "frame10.jpg"]

    def test_keyframes(self):
        paths = [f"{i}.jpg" for i in range(10)]
        assert extract_keyframes(paths, 3) == ["0.jpg", "3.jpg", "6.jpg", "9.jpg"]
        assert extract_keyframes(paths, 1) == paths


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (100, 3), dtype=np.uint8)
        write_ply(tmp_path / "x.ply", pts, cols)
        p2, c2 = read_ply(tmp_path / "x.ply")
        np.testing.assert_allclose(p2, pts, atol=1e-6)
        np.testing.assert_array_equal(c2, cols)

    def test_roundtrip_ascii_no_color(self, tmp_path):
        pts = np.arange(12, dtype=np.float32).reshape(4, 3)
        write_ply(tmp_path / "y.ply", pts, binary=False)
        p2, c2 = read_ply(tmp_path / "y.ply")
        np.testing.assert_allclose(p2, pts, atol=1e-5)
        assert c2 is None

    def test_merge(self, tmp_path):
        d = tmp_path / "parts"
        for i in range(3):
            write_ply(d / f"{i}.ply", np.full((10, 3), float(i), np.float32))
        n = merge_ply_files(d, tmp_path / "merged.ply")
        assert n == 30
        pts, cols = read_ply(tmp_path / "merged.ply")
        assert pts.shape == (30, 3)


class TestTrajectory:
    def test_formats(self, tmp_path):
        rng = np.random.default_rng(1)
        poses = np.tile(np.eye(4), (5, 1, 1))
        poses[:, :3, 3] = rng.normal(size=(5, 3))
        K = np.tile(np.array([[60.0, 0, 32], [0, 61.0, 24], [0, 0, 1]]), (5, 1, 1))
        save_camera_poses(tmp_path, poses, K)

        # camera_poses.txt: 16 floats per row (reference format)
        lines = (tmp_path / "camera_poses.txt").read_text().strip().split("\n")
        assert len(lines) == 5 and len(lines[0].split()) == 16
        back = load_camera_poses(tmp_path / "camera_poses.txt")
        np.testing.assert_allclose(back, poses, atol=1e-12)

        # intrinsic.txt: fx fy cx cy
        kline = (tmp_path / "intrinsic.txt").read_text().strip().split("\n")[0].split()
        assert [float(x) for x in kline] == [60.0, 61.0, 32.0, 24.0]

        pts, cols = read_ply(tmp_path / "camera_poses.ply")
        np.testing.assert_allclose(pts, poses[:, :3, 3], atol=1e-5)
