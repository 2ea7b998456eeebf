import pytest
import numpy as np
import jax.numpy as jnp

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.models.camera import pose_from_rays, rays_from_pose

from fake_model import make_trajectory


class TestPoseFromRays:
    def test_exact_recovery(self):
        """Perfect ray maps from known poses → exact pose recovery
        (the depth-ray representation's closed-form inverse)."""
        poses = jnp.asarray(make_trajectory(4), jnp.float32)
        H, W = 32, 40
        K = jnp.tile(
            jnp.asarray([[50.0, 0, W / 2], [0, 52.0, H / 2], [0, 0, 1]], jnp.float32),
            (4, 1, 1),
        )
        rays = rays_from_pose(poses, K, (H, W))
        rec = pose_from_rays(rays, K, stride=2)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(poses), atol=5e-4)

    def test_noisy_rays_still_close(self):
        rng = np.random.default_rng(0)
        poses = jnp.asarray(make_trajectory(3), jnp.float32)
        H, W = 32, 40
        K = jnp.tile(
            jnp.asarray([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], jnp.float32),
            (3, 1, 1),
        )
        rays = np.asarray(rays_from_pose(poses, K, (H, W))).copy()
        rays += rng.normal(size=rays.shape).astype(np.float32) * 0.005
        rec = pose_from_rays(jnp.asarray(rays), K, stride=2)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(poses), atol=0.02)

    def test_identity_pose(self):
        H, W = 28, 28
        E = jnp.asarray(np.eye(4, dtype=np.float32)[:3])[None]
        K = jnp.asarray([[40.0, 0, 14], [0, 40.0, 14], [0, 0, 1]], jnp.float32)[None]
        rays = rays_from_pose(E, K, (H, W))
        # identity camera: moments are all zero (rays through the origin)
        np.testing.assert_allclose(np.asarray(rays[..., 3:6]), 0.0, atol=1e-6)
        rec = pose_from_rays(rays, K, stride=2)
        np.testing.assert_allclose(np.asarray(rec[0]), np.eye(4)[:3], atol=1e-5)


class TestUseRayPoseEndToEnd:
    def test_structurally_valid(self):
        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (3, 56, 70, 3), dtype=np.uint8)
        pred = model.inference(image=imgs, process_res=70, use_ray_pose=True)
        np.testing.assert_allclose(pred.extrinsics[0], np.eye(4)[:3], atol=1e-4)
        for E in pred.extrinsics:
            np.testing.assert_allclose(E[:3, :3] @ E[:3, :3].T, np.eye(3), atol=1e-4)

    @pytest.mark.slow
    def test_differs_from_camera_head(self):
        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 255, (3, 56, 70, 3), dtype=np.uint8)
        p_head = model.inference(image=imgs, process_res=70, use_ray_pose=False)
        p_rays = model.inference(image=imgs, process_res=70, use_ray_pose=True)
        # two independent heads at random init: same contract, different values
        assert np.abs(p_head.extrinsics[1:] - p_rays.extrinsics[1:]).max() > 1e-6
        np.testing.assert_array_equal(p_head.depth, p_rays.depth)
