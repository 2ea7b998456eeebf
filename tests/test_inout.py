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


class TestAnisotropic3DGS:
    def _read_3dgs(self, path):
        blob = path.read_bytes()
        header_end = blob.index(b"end_header\n") + len(b"end_header\n")
        header = blob[:header_end].decode("ascii")
        n = int([l for l in header.split("\n") if l.startswith("element vertex")][0].split()[-1])
        n_props = sum(1 for l in header.split("\n") if l.startswith("property"))
        return header, np.frombuffer(blob[header_end:], "<f4").reshape(n, n_props)

    def test_surface_aligned_splats_on_slanted_plane(self, tmp_path):
        """A 45°-slanted plane: every splat's thin axis (3rd column of the
        stored rotation) must match the plane normal, and the tangent radii
        must exceed the pancake thickness."""
        from da3slam_tpu.inout.export3d import _splat_frames

        H = W = 24
        fx = fy = 30.0
        cx = cy = 12.0
        u = np.arange(W)[None, :].repeat(H, 0)
        v = np.arange(H)[:, None].repeat(W, 1)
        # plane z = 2 + x in camera coords → n ∝ (1, 0, -1)/√2
        z = (2.0 * fx) / (fx - (u - cx))
        x = (u - cx) / fx * z
        y = (v - cy) / fy * z
        pts = np.stack([x, y, z], -1)

        scales, quats = _splat_frames(pts)
        w_, qx, qy, qz = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
        # third rotation column = splat normal axis
        n3 = np.stack([2 * (qx * qz + w_ * qy),
                       2 * (qy * qz - w_ * qx),
                       1 - 2 * (qx * qx + qy * qy)], -1)
        expect = np.array([1.0, 0.0, -1.0]) / np.sqrt(2)
        inner = np.abs(n3 @ expect)  # sign-insensitive
        assert inner[2:-2, 2:-2].min() > 0.999
        # pancake: normal-axis scale well under tangent scales
        assert (scales[..., 2] < 0.2 * scales[..., :2].min(-1)).all()

    def test_ply_carries_rotations_and_3_scales(self, tmp_path):
        from da3slam_tpu.inout.export3d import export_3dgs_ply

        rng = np.random.default_rng(0)
        n = 50
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (n, 3), dtype=np.uint8)
        scales = np.abs(rng.normal(size=(n, 3))).astype(np.float32) + 0.1
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        op = rng.uniform(0.1, 0.9, n).astype(np.float32)
        export_3dgs_ply(tmp_path / "a.ply", pts, cols, scales, op, rotations=quats)
        header, data = self._read_3dgs(tmp_path / "a.ply")
        assert "property float rot_3" in header
        np.testing.assert_allclose(data[:, 10:13], np.log(scales), atol=1e-5)
        # stored quats equal input up to normalisation (they were unit already)
        dots = np.abs(np.sum(data[:, 13:17] * quats, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    def test_rotmat_to_quat_all_branches(self):
        from da3slam_tpu.inout.export3d import _rotmat_to_quat_np

        def quat_to_R(q):
            w, x, y, z = q
            return np.array([
                [1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
                [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
                [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])

        rng = np.random.default_rng(3)
        qs = rng.normal(size=(64, 4))
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
        # include near-π rotations about each axis (each argmax branch)
        for ax in range(3):
            v = np.zeros(4); v[ax + 1] = 1.0; v[0] = 1e-4
            qs = np.vstack([qs, v / np.linalg.norm(v)])
        Rs = np.stack([quat_to_R(q) for q in qs])
        out = _rotmat_to_quat_np(Rs)
        dots = np.abs(np.sum(out * qs, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-6)


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


class TestHostBackprojection:
    def test_matches_device_backprojection(self):
        """export3d's host-numpy backprojection must match the canonical
        core.geometry.backproject_depth (world coords, w2c extrinsics)."""
        import jax.numpy as jnp

        from da3slam_tpu.core.geometry import backproject_depth
        from da3slam_tpu.core.transforms import so3_exp
        from da3slam_tpu.inout.export3d import _backproject_np

        rng = np.random.default_rng(0)
        N, H, W = 3, 17, 23
        depth = rng.uniform(0.3, 5.0, (N, H, W)).astype(np.float32)
        K = np.tile(np.array([[50.0, 0, 11], [0, 55.0, 8], [0, 0, 1]],
                             np.float32), (N, 1, 1))
        R = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(N, 3)) * 0.3)))
        t = rng.normal(size=(N, 3)).astype(np.float64)
        E = np.concatenate([R, t[..., None]], axis=-1).astype(np.float32)

        ours = _backproject_np(depth, K, E)
        ref = np.asarray(backproject_depth(
            jnp.asarray(depth), jnp.asarray(K), jnp.asarray(E)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)
