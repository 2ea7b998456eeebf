import numpy as np
import jax.numpy as jnp

from da3slam_tpu.core.transforms import quat_to_rotmat
from da3slam_tpu.slam.evaluate import evaluate_trajectory

from fake_model import make_trajectory
from test_slam import gt_c2w


def noisy_scaled_copy(c2w, scale, rng, noise=0.0):
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)), np.float64)
    t = rng.normal(size=3)
    out = c2w.copy()
    for i in range(len(out)):
        out[i, :3, 3] = scale * (R @ c2w[i, :3, 3]) + t + rng.normal(size=3) * noise
        out[i, :3, :3] = R @ c2w[i, :3, :3]
    return out


class TestEvaluate:
    def test_identical_trajectories_zero_error(self):
        gt = gt_c2w(make_trajectory(10))
        res = evaluate_trajectory(gt, gt)
        assert res.ate_rmse < 1e-6
        assert res.rpe_trans_rmse < 1e-6
        assert res.rpe_rot_deg_rmse < 1e-3

    def test_sim3_alignment_removes_gauge(self):
        """A Sim(3)-transformed copy of the trajectory is the same
        trajectory up to gauge — ATE must be ~0 after sim3 alignment."""
        rng = np.random.default_rng(0)
        gt = gt_c2w(make_trajectory(12))
        est = noisy_scaled_copy(gt, 2.5, rng)
        res = evaluate_trajectory(est, gt, align="sim3")
        assert res.ate_rmse < 1e-4
        np.testing.assert_allclose(res.scale, 1 / 2.5, rtol=1e-3)
        # without alignment the error is large
        res_none = evaluate_trajectory(est, gt, align="none")
        assert res_none.ate_rmse > 0.1

    def test_noise_is_measured(self):
        rng = np.random.default_rng(1)
        gt = gt_c2w(make_trajectory(20))
        est = noisy_scaled_copy(gt, 1.0, rng, noise=0.01)
        res = evaluate_trajectory(est, gt, align="se3")
        assert 0.003 < res.ate_rmse < 0.05

    def test_cli(self, tmp_path, capsys):
        from da3slam_tpu.cli.evaluate import main
        from da3slam_tpu.inout.trajectory import save_camera_poses

        gt = gt_c2w(make_trajectory(8))
        K = np.tile(np.eye(3), (8, 1, 1))
        save_camera_poses(tmp_path / "a", gt, K)
        save_camera_poses(tmp_path / "b", gt, K)
        main(["--est", str(tmp_path / "a/camera_poses.txt"),
              "--gt", str(tmp_path / "b/camera_poses.txt")])
        out = capsys.readouterr().out
        assert '"ate_rmse"' in out

    def test_shape_mismatch_raises(self):
        import pytest

        gt = gt_c2w(make_trajectory(5))
        with pytest.raises(ValueError, match="shapes differ"):
            evaluate_trajectory(gt[:4], gt)
