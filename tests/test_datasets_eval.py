"""Depth metrics, C3VD-layout loader, and the evaluation CLI."""

import json

import numpy as np
import pytest

from da3slam_tpu.slam.evaluate import evaluate_depth


class TestDepthMetrics:
    def test_perfect_prediction(self):
        rng = np.random.default_rng(0)
        gt = rng.uniform(0.5, 3.0, size=(2, 16, 16))
        res = evaluate_depth(gt.copy(), gt)
        assert res.abs_rel == 0.0 and res.rmse == 0.0
        assert res.delta1 == 1.0
        assert res.n_valid == gt.size

    def test_median_scaling_undoes_global_scale(self):
        """Scale-ambiguous prediction (x2.7) scores perfectly under the
        median protocol, terribly without it."""
        rng = np.random.default_rng(1)
        gt = rng.uniform(0.5, 3.0, size=(3, 8, 8))
        pred = gt * 2.7
        res = evaluate_depth(pred, gt, align="median")
        assert res.abs_rel < 1e-12
        np.testing.assert_allclose(res.scale, 1 / 2.7, rtol=1e-6)
        res_none = evaluate_depth(pred, gt, align="none")
        assert res_none.abs_rel > 1.0

    def test_known_abs_rel(self):
        gt = np.full((1, 4, 4), 2.0)
        pred = np.full((1, 4, 4), 2.2)
        res = evaluate_depth(pred, gt, align="none")
        np.testing.assert_allclose(res.abs_rel, 0.1, rtol=1e-12)
        assert res.delta1 == 1.0  # ratio 1.1 < 1.25

    def test_invalid_pixels_excluded(self):
        gt = np.full((1, 4, 4), 2.0)
        gt[0, 0, :] = 0.0  # invalid rows
        pred = np.full((1, 4, 4), 2.0)
        pred[0, 1, 0] = np.nan  # invalid prediction pixel
        res = evaluate_depth(pred, gt)
        assert res.n_valid == 16 - 4 - 1

    def test_max_depth_cap(self):
        gt = np.stack([np.full((4, 4), 1.0)])
        gt[0, 0, 0] = 50.0
        res = evaluate_depth(gt.copy(), gt, max_depth=10.0)
        assert res.n_valid == 15

    def test_all_invalid_raises(self):
        with pytest.raises(ValueError, match="no valid"):
            evaluate_depth(np.ones((1, 2, 2)), np.zeros((1, 2, 2)))


def make_c3vd_dir(tmp_path, n=4, hw=(12, 16), with_depth=True, with_pose=True):
    from PIL import Image

    rng = np.random.default_rng(0)
    seq = tmp_path / "seq"
    seq.mkdir()
    # smooth ramps (resolution-resampling in the CLI test must be able to
    # reconstruct them; noise would not survive down/up-sampling)
    yy, xx = np.meshgrid(np.linspace(0, 1, hw[0]), np.linspace(0, 1, hw[1]),
                         indexing="ij")
    depth_m = np.stack(
        [(0.01 + 0.04 * xx + 0.02 * yy + 0.005 * i).astype(np.float32)
         for i in range(n)]  # stays within C3VD's 0..100 mm range
    )
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        ).save(seq / f"{i:04d}_color.png")
        if with_depth:
            raw = np.clip(np.round(depth_m[i] / 0.100 * 65535), 0, 65535).astype(np.uint16)
            Image.fromarray(raw).save(seq / f"{i:04d}_depth.tiff")
    if with_pose:
        lines = []
        for i in range(n):
            T = np.eye(4)
            T[:3, 3] = [10.0 * i, 0.0, 5.0]  # millimetres
            lines.append(",".join(str(v) for v in T.reshape(-1)))
        (seq / "pose.txt").write_text("\n".join(lines) + "\n")
    return seq, depth_m


class TestC3VDLoader:
    def test_full_sequence(self, tmp_path):
        from da3slam_tpu.inout.datasets import load_c3vd_sequence, load_depth_stack

        seq_dir, depth_m = make_c3vd_dir(tmp_path)
        seq = load_c3vd_sequence(seq_dir)
        assert len(seq) == 4
        assert seq.poses_c2w.shape == (4, 4, 4)
        # millimetre translations converted to metres
        np.testing.assert_allclose(seq.poses_c2w[2, :3, 3], [0.02, 0.0, 0.005])
        stack = load_depth_stack(seq)
        # 16-bit quantisation of the 0..100mm range
        np.testing.assert_allclose(stack, depth_m, atol=0.100 / 65535)

    def test_no_depth_no_pose(self, tmp_path):
        from da3slam_tpu.inout.datasets import load_c3vd_sequence

        seq_dir, _ = make_c3vd_dir(tmp_path, with_depth=False, with_pose=False)
        seq = load_c3vd_sequence(seq_dir)
        assert seq.depth_paths is None and seq.poses_c2w is None

    def test_count_mismatch_raises(self, tmp_path):
        from da3slam_tpu.inout.datasets import load_c3vd_sequence

        seq_dir, _ = make_c3vd_dir(tmp_path)
        (seq_dir / "0003_depth.tiff").unlink()
        with pytest.raises(ValueError, match="depth maps"):
            load_c3vd_sequence(seq_dir)


def _random_c2w(rng, n):
    """Random c2w poses with proper rotations (Rodrigues from axis-angle)."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        # rotation from a random axis-angle via Rodrigues
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        th = rng.uniform(0, 1.0)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
        poses[i, :3, :3] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        poses[i, :3, 3] = rng.normal(size=3)
    return poses


class TestTrajectoryFormats:
    def test_kitti_roundtrip(self, tmp_path):
        from da3slam_tpu.inout.trajectory import (
            load_trajectory, load_trajectory_kitti, save_trajectory_kitti,
        )

        poses = _random_c2w(np.random.default_rng(0), 5)
        save_trajectory_kitti(tmp_path / "poses.txt", poses)
        back = load_trajectory_kitti(tmp_path / "poses.txt")
        np.testing.assert_allclose(back, poses, atol=1e-7)
        # 12 columns → auto-detected as KITTI
        np.testing.assert_allclose(
            load_trajectory(tmp_path / "poses.txt"), poses, atol=1e-7
        )

    def test_tum_roundtrip(self, tmp_path):
        from da3slam_tpu.inout.trajectory import (
            load_trajectory, load_trajectory_tum, save_trajectory_tum,
        )

        poses = _random_c2w(np.random.default_rng(1), 6)
        ts = np.arange(6) * 0.1 + 100.0
        save_trajectory_tum(tmp_path / "tum.txt", poses, timestamps=ts)
        ts_back, back = load_trajectory_tum(tmp_path / "tum.txt")
        np.testing.assert_allclose(ts_back, ts, atol=1e-6)
        # quaternion round-trip: rotations to ~1e-6, translations exact-ish
        np.testing.assert_allclose(back, poses, atol=1e-5)
        np.testing.assert_allclose(
            load_trajectory(tmp_path / "tum.txt"), poses, atol=1e-5
        )

    def test_reference_auto_detect(self, tmp_path):
        from da3slam_tpu.inout.trajectory import load_trajectory, save_camera_poses

        poses = _random_c2w(np.random.default_rng(2), 3)
        K = np.stack([np.eye(3)] * 3)
        save_camera_poses(tmp_path, poses, K)
        np.testing.assert_allclose(
            load_trajectory(tmp_path / "camera_poses.txt"), poses, atol=1e-7
        )

    def test_extra_formats_export(self, tmp_path):
        from da3slam_tpu.inout.trajectory import load_trajectory, save_camera_poses

        poses = _random_c2w(np.random.default_rng(3), 4)
        K = np.stack([np.eye(3)] * 4)
        save_camera_poses(tmp_path, poses, K, extra_formats=("tum", "kitti"))
        np.testing.assert_allclose(
            load_trajectory(tmp_path / "camera_poses_kitti.txt"), poses, atol=1e-7
        )
        np.testing.assert_allclose(
            load_trajectory(tmp_path / "camera_poses_tum.txt"), poses, atol=1e-5
        )

    def test_unknown_format_raises(self, tmp_path):
        from da3slam_tpu.inout.trajectory import load_trajectory

        (tmp_path / "bad.txt").write_text("1 2 3\n")
        with pytest.raises(ValueError, match="unrecognized"):
            load_trajectory(tmp_path / "bad.txt")


class TestKITTILoader:
    def _make_kitti_dir(self, tmp_path, n=3):
        from PIL import Image

        seq = tmp_path / "05"
        (seq / "image_2").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (8, 12, 3), dtype=np.uint8)
            ).save(seq / "image_2" / f"{i:06d}.png")
        poses = _random_c2w(rng, n)
        from da3slam_tpu.inout.trajectory import save_trajectory_kitti

        save_trajectory_kitti(seq / "poses.txt", poses)
        (seq / "calib.txt").write_text(
            "P0: 700 0 600 0 0 700 180 0 0 0 1 0\n"
            "P2: 718.856 0 607.1928 45.38225 0 718.856 185.2157 -0.1130887 0 0 1 0.003779761\n"
        )
        return seq, poses

    def test_load(self, tmp_path):
        from da3slam_tpu.inout.datasets import load_kitti_sequence

        seq_dir, poses = self._make_kitti_dir(tmp_path)
        seq = load_kitti_sequence(seq_dir)
        assert len(seq) == 3
        np.testing.assert_allclose(seq.poses_c2w, poses, atol=1e-7)
        assert seq.intrinsics is not None
        np.testing.assert_allclose(seq.intrinsics[0, 0], 718.856)
        np.testing.assert_allclose(seq.intrinsics[0, 2], 607.1928)

    def test_count_mismatch_raises(self, tmp_path):
        from da3slam_tpu.inout.datasets import load_kitti_sequence

        seq_dir, _ = self._make_kitti_dir(tmp_path)
        (seq_dir / "image_2" / "000002.png").unlink()
        with pytest.raises(ValueError, match="poses"):
            load_kitti_sequence(seq_dir)

    def test_evaluate_cli_kitti_gt_seq(self, tmp_path, capsys):
        from da3slam_tpu.cli.evaluate import main
        from da3slam_tpu.inout.trajectory import save_trajectory_tum

        seq_dir, poses = self._make_kitti_dir(tmp_path)
        # estimate = gt exported as TUM; ATE must be ~0 through both codecs
        save_trajectory_tum(tmp_path / "est_tum.txt", poses)
        main([
            "--est", str(tmp_path / "est_tum.txt"),
            "--gt_seq", str(seq_dir),
        ])
        report = json.loads(capsys.readouterr().out)
        assert report["trajectory"]["ate_rmse"] < 1e-5


class TestEvaluateCLI:
    def test_depth_and_trajectory_vs_c3vd_seq(self, tmp_path, capsys):
        from da3slam_tpu.cli.evaluate import main
        from da3slam_tpu.inout.trajectory import save_camera_poses

        seq_dir, depth_m = make_c3vd_dir(tmp_path)
        # predicted depth: gt at half resolution, global 2x scale
        pred = depth_m[:, ::2, ::2] * 2.0
        np.save(tmp_path / "pred.npy", pred.astype(np.float32))
        # estimated trajectory = gt (in metres)
        gt_poses = np.stack([np.eye(4)] * 4)
        for i in range(4):
            gt_poses[i, :3, 3] = [0.01 * i, 0.0, 0.005]
        K = np.stack([np.eye(3)] * 4)
        save_camera_poses(tmp_path / "est", gt_poses, K)

        main([
            "--est", str(tmp_path / "est" / "camera_poses.txt"),
            "--gt_seq", str(seq_dir),
            "--depth_est", str(tmp_path / "pred.npy"),
        ])
        report = json.loads(capsys.readouterr().out)
        assert report["trajectory"]["ate_rmse"] < 1e-6
        # bilinear-resized half-res prediction: small but nonzero error
        assert report["depth"]["abs_rel"] < 0.1
        assert report["depth"]["delta1"] > 0.9
        np.testing.assert_allclose(report["depth"]["scale"], 0.5, rtol=0.1)


class TestReviewRegressions:
    """Round-3 review findings (robustness of the interop formats)."""

    def test_bad_traj_format_fails_at_construction(self, tmp_path):
        from da3slam_tpu.slam.streaming import DA3Streaming

        with pytest.raises(ValueError, match="kitty"):
            DA3Streaming(str(tmp_path), str(tmp_path / "o"), {
                "Weights": {"DA3": "tiny"},
                "Model": {"traj_formats": ["kitty"]},
            })

    def test_reference_exports_written_before_extras(self, tmp_path, monkeypatch):
        """Even if an extras writer dies, camera_poses.txt must exist."""
        import da3slam_tpu.inout.trajectory as T

        poses = np.tile(np.eye(4), (3, 1, 1))
        K = np.tile(np.eye(3), (3, 1, 1))
        monkeypatch.setattr(
            T, "save_trajectory_tum",
            lambda *a, **k: (_ for _ in ()).throw(OSError("disk full")),
        )
        with pytest.raises(OSError):
            T.save_camera_poses(tmp_path, poses, K, extra_formats=("tum",))
        assert (tmp_path / "camera_poses.txt").exists()
        assert (tmp_path / "camera_poses.ply").exists()

    def test_comma_delimited_kitti_loads(self, tmp_path):
        from da3slam_tpu.inout.trajectory import load_trajectory

        poses = _random_c2w(np.random.default_rng(5), 2)
        rows = poses[:, :3, :].reshape(2, 12)
        (tmp_path / "p.txt").write_text(
            "\n".join(",".join(f"{v:.9g}" for v in r) for r in rows) + "\n"
        )
        np.testing.assert_allclose(
            load_trajectory(tmp_path / "p.txt"), poses, atol=1e-6
        )

    def test_missing_explicit_poses_file_raises(self, tmp_path):
        from PIL import Image

        from da3slam_tpu.inout.datasets import load_kitti_sequence

        seq = tmp_path / "00"
        (seq / "image_2").mkdir(parents=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            seq / "image_2" / "000000.png"
        )
        with pytest.raises(FileNotFoundError, match="poses"):
            load_kitti_sequence(seq, poses_file=tmp_path / "nope.txt")

    def test_tum_roundtrip_is_float64(self, tmp_path):
        """The numpy quat path must not downcast the f64 poses (the old
        jax path silently went through f32)."""
        from da3slam_tpu.inout.trajectory import (
            load_trajectory_tum, save_trajectory_tum,
        )

        poses = _random_c2w(np.random.default_rng(6), 4)
        save_trajectory_tum(tmp_path / "t.txt", poses)
        _, back = load_trajectory_tum(tmp_path / "t.txt")
        # 9 significant digits in the file; f32 would cap at ~1e-7 rotation
        np.testing.assert_allclose(back[:, :3, :3], poses[:, :3, :3], atol=5e-8)
