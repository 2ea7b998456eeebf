import numpy as np
import jax
import jax.numpy as jnp
import pytest

from da3slam_tpu.models import get_preset
from da3slam_tpu.models.da3 import forward_fn, init_params
from da3slam_tpu.parallel import make_mesh
from da3slam_tpu.parallel.sp_forward import make_sharded_forward


CFG = get_preset("tiny")


class TestShardedForward:
    @pytest.mark.parametrize("n_dev", [2, 4])
    @pytest.mark.slow
    def test_matches_single_device(self, n_dev):
        """View-sharded forward (ring cross-view attention) must equal the
        unsharded forward — sharding is an execution layout, not math."""
        mesh = make_mesh(n_dev, tp=1)
        params = init_params(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(0)
        n_views = 2 * n_dev
        imgs = jnp.asarray(rng.normal(size=(n_views, 28, 42, 3)).astype(np.float32))

        ref = forward_fn(params, imgs, CFG, attn_impl="xla")
        sharded = make_sharded_forward(CFG, mesh)
        out = sharded(params, imgs)

        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["conf"]), np.asarray(ref["conf"]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["extrinsics"]), np.asarray(ref["extrinsics"]), atol=2e-4
        )

    def test_output_sharding_layout(self):
        mesh = make_mesh(4, tp=1)
        params = init_params(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.normal(size=(8, 28, 28, 3)).astype(np.float32))
        out = make_sharded_forward(CFG, mesh)(params, imgs)
        # depth stays sharded over views (no gather until the host asks)
        spec = out["depth"].sharding.spec
        assert spec[0] == "dp"
