import jax.numpy as jnp
import numpy as np

from da3slam_tpu.core import (
    backproject_depth,
    project_points,
    depth_scale_ratio,
    pixel_grid,
    quat_to_rotmat,
)


def make_camera(H=24, W=32, fx=40.0, fy=42.0):
    K = jnp.asarray([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    return K


def make_extrinsic(rng):
    q = rng.normal(size=4)
    q[0] = abs(q[0]) + 2.0  # small rotation
    R = np.asarray(quat_to_rotmat(jnp.asarray(q / np.linalg.norm(q), jnp.float32)))
    t = rng.normal(size=3).astype(np.float32) * 0.1
    return jnp.asarray(np.concatenate([R, t[:, None]], axis=1), jnp.float32)


class TestBackprojection:
    def test_project_unproject_identity_camera(self):
        rng = np.random.default_rng(0)
        H, W = 24, 32
        K = make_camera(H, W)
        depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(H, W)), jnp.float32)
        pts = backproject_depth(depth, K)  # camera coords
        uv, z = project_points(pts.reshape(-1, 3), K)
        grid = np.asarray(pixel_grid(H, W))[..., :2].reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(uv), grid, atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), np.asarray(depth).reshape(-1), atol=1e-4)

    def test_project_unproject_identity_world(self):
        rng = np.random.default_rng(1)
        H, W = 16, 20
        K = make_camera(H, W)
        E = make_extrinsic(rng)
        depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(H, W)), jnp.float32)
        pts_world = backproject_depth(depth, K, E)
        uv, z = project_points(pts_world.reshape(-1, 3), K, E)
        grid = np.asarray(pixel_grid(H, W))[..., :2].reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(uv), grid, atol=1e-2)
        np.testing.assert_allclose(np.asarray(z), np.asarray(depth).reshape(-1), atol=1e-3)

    def test_batched_matches_loop(self):
        rng = np.random.default_rng(2)
        H, W, N = 8, 10, 3
        K = jnp.stack([make_camera(H, W, fx=30 + i) for i in range(N)])
        E = jnp.stack([make_extrinsic(rng) for _ in range(N)])
        depth = jnp.asarray(rng.uniform(0.5, 2.0, size=(N, H, W)), jnp.float32)
        batched = backproject_depth(depth, K, E)
        for i in range(N):
            single = backproject_depth(depth[i], K[i], E[i])
            np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), atol=1e-5)

    def test_identity_pose_world_equals_camera(self):
        rng = np.random.default_rng(3)
        H, W = 8, 8
        K = make_camera(H, W)
        E = jnp.asarray(np.eye(4)[:3], jnp.float32)
        depth = jnp.asarray(rng.uniform(0.5, 2.0, size=(H, W)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(backproject_depth(depth, K, E)),
            np.asarray(backproject_depth(depth, K)),
            atol=1e-5,
        )


class TestDepthScale:
    def test_recovers_known_scale(self):
        rng = np.random.default_rng(4)
        d_cur = jnp.asarray(rng.uniform(0.5, 3.0, size=(32, 32)), jnp.float32)
        d_prev = 1.7 * d_cur
        s = depth_scale_ratio(d_prev, d_cur)
        np.testing.assert_allclose(float(s), 1.7, rtol=1e-3)

    def test_confidence_gating(self):
        rng = np.random.default_rng(5)
        d_cur = jnp.asarray(rng.uniform(0.5, 3.0, size=(32, 32)), jnp.float32)
        d_prev = 2.0 * d_cur
        # corrupt half the pixels but mark them low-confidence
        corrupt = np.asarray(d_prev).copy()
        corrupt[:16] *= 13.0
        conf = np.ones((32, 32), np.float32)
        conf[:16] = 0.0
        s = depth_scale_ratio(
            jnp.asarray(corrupt), d_cur, jnp.asarray(conf), jnp.asarray(conf), conf_th=0.2
        )
        np.testing.assert_allclose(float(s), 2.0, rtol=1e-3)

    def test_too_few_points_falls_back_to_one(self):
        d = jnp.ones((4, 4), jnp.float32)  # 16 < min_points=50
        s = depth_scale_ratio(d * 3.0, d)
        assert float(s) == 1.0

    def test_nonfinite_falls_back_to_one(self):
        d = jnp.full((32, 32), jnp.nan, jnp.float32)
        s = depth_scale_ratio(d, d)
        assert float(s) == 1.0

    def test_zero_depth_excluded(self):
        rng = np.random.default_rng(6)
        d_cur = np.asarray(rng.uniform(0.5, 3.0, size=(32, 32)), np.float32)
        d_prev = 1.5 * d_cur
        d_cur[:8] = 0.0  # invalid rows must not poison the median
        s = depth_scale_ratio(jnp.asarray(d_prev), jnp.asarray(d_cur))
        np.testing.assert_allclose(float(s), 1.5, rtol=1e-3)
