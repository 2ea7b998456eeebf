import numpy as np
import jax.numpy as jnp
import pytest

from da3slam_tpu.ops.distortion import apply_distortion, undistort_points, distort_pixels


class TestDistortion:
    @pytest.mark.parametrize(
        "params",
        [
            [0.1],  # 1-param radial
            [0.08, -0.03],  # 2-param radial
            [0.1, -0.05, 0.01, -0.008],  # OpenCV radial+tangential
        ],
    )
    def test_undistort_inverts_distort(self, params):
        rng = np.random.default_rng(0)
        uv = jnp.asarray(rng.uniform(-0.6, 0.6, size=(500, 2)), jnp.float32)
        p = jnp.asarray(params, jnp.float32)
        distorted = apply_distortion(uv, p)
        recovered = undistort_points(distorted, p, max_iterations=10)
        np.testing.assert_allclose(np.asarray(recovered), np.asarray(uv), atol=1e-5)

    def test_zero_params_is_identity(self):
        rng = np.random.default_rng(1)
        uv = jnp.asarray(rng.uniform(-1, 1, size=(100, 2)), jnp.float32)
        p = jnp.zeros(4, jnp.float32)
        np.testing.assert_allclose(np.asarray(apply_distortion(uv, p)), np.asarray(uv), atol=1e-7)

    def test_radial_is_radially_symmetric(self):
        p = jnp.asarray([0.1, -0.02], jnp.float32)
        uv = jnp.asarray([[0.3, 0.0], [0.0, 0.3], [-0.3, 0.0]], jnp.float32)
        out = np.asarray(apply_distortion(uv, p))
        r = np.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(r, r[0], atol=1e-6)

    def test_pixel_roundtrip_with_intrinsics(self):
        rng = np.random.default_rng(2)
        K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32)
        p = jnp.asarray([0.05, -0.01], jnp.float32)
        pix = jnp.asarray(rng.uniform(10, 110, size=(50, 2)), jnp.float32)
        d = distort_pixels(pix, K, p)
        assert np.abs(np.asarray(d) - np.asarray(pix)).max() > 0.01  # actually distorts
        # invert through normalised coords
        fx, cx, cy = 100.0, 64.0, 48.0
        norm = (np.asarray(d) - [cx, cy]) / fx
        und = undistort_points(jnp.asarray(norm, jnp.float32), p)
        rec = np.asarray(und) * fx + [cx, cy]
        np.testing.assert_allclose(rec, np.asarray(pix), atol=1e-3)

    def test_batched_shapes(self):
        uv = jnp.zeros((4, 8, 8, 2))
        p = jnp.asarray([0.1])
        assert apply_distortion(uv, p).shape == (4, 8, 8, 2)
        assert undistort_points(uv, p).shape == (4, 8, 8, 2)
