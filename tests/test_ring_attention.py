import numpy as np
import jax
import jax.numpy as jnp
import pytest

from da3slam_tpu.parallel import make_mesh
from da3slam_tpu.parallel.ring_attention import make_ring_cross_view_attention


def dense(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


class TestRingAttention:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_dense(self, n_dev):
        mesh = make_mesh(n_dev, tp=1)
        rng = np.random.default_rng(0)
        B, S, H, D = 2, 8 * n_dev, 3, 16
        q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        ring = make_ring_cross_view_attention(mesh, "dp")
        out = jax.jit(ring)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(dense(q, k, v)), atol=2e-5
        )

    def test_extreme_logits(self):
        mesh = make_mesh(4, tp=1)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)) * 20, jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 16, 2, 8)) * 20, jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 16, 2, 8)), jnp.float32)
        ring = make_ring_cross_view_attention(mesh, "dp")
        out = jax.jit(ring)(q, k, v)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense(q, k, v)), atol=1e-4)

    def test_grad_flows(self):
        """Ring attention must be differentiable (scan of collectives)."""
        mesh = make_mesh(2, tp=1)
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 8, 2, 8)), jnp.float32)
        ring = make_ring_cross_view_attention(mesh, "dp")

        def loss(x):
            return jnp.sum(ring(x, x, x) ** 2)

        g = jax.jit(jax.grad(loss))(q)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
        # oracle: gradient of the dense implementation
        g_dense = jax.grad(lambda x: jnp.sum(jax.nn.dot_product_attention(x, x, x) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense), atol=1e-4)
