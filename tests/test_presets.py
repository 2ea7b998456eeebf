"""Preset sanity: every tier must initialise and trace (no giant-scale
compute in tests — abstract evaluation only)."""

import jax
import jax.numpy as jnp
import pytest

from da3slam_tpu.models import get_preset
from da3slam_tpu.models.da3 import forward_fn, init_params


@pytest.mark.parametrize("tier", ["tiny", "small", "base", "large"])
def test_tier_traces(tier):
    cfg = get_preset(tier)
    assert cfg.embed_dim % cfg.num_heads == 0
    assert len(cfg.dpt_layers) == 4
    assert max(cfg.dpt_layers) < cfg.depth

    # shape-level check via abstract eval: no weights materialised
    shapes = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.PRNGKey(0))
    imgs = jax.ShapeDtypeStruct((2, 56, 70, 3), jnp.float32)
    out = jax.eval_shape(
        lambda p, x: forward_fn(p, x, cfg), shapes, imgs
    )
    assert out["depth"].shape == (2, 56, 70)
    assert out["extrinsics"].shape == (2, 3, 4)
    assert out["rays"].shape == (2, 56, 70, 6)


def test_giant_config_consistent():
    cfg = get_preset("giant")
    assert cfg.embed_dim == 1536 and cfg.depth == 40
    assert max(cfg.dpt_layers) < cfg.depth
