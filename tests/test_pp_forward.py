"""Pipeline-parallel encoder: pp must be a pure execution-strategy change —
taps and final activations identical to the sequential vit.encode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from da3slam_tpu.models import vit
from da3slam_tpu.models.config import get_preset
from da3slam_tpu.parallel.pp_forward import make_pp_encode, split_encoder_params


def pp_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.asarray(devs[:n]), axis_names=("pp",))


class TestPPForward:
    def _run(self, n_stages, M=3, N=2, hw=(28, 28)):
        cfg = get_preset("tiny")  # depth=4, taps (0,1,2,3), interval 2
        mesh = pp_mesh(n_stages)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.normal(size=(M, N, *hw, 3)).astype(np.float32)
        )

        # sequential reference, per microbatch
        ref_taps, ref_final = [], []
        for m in range(M):
            taps, final, _grid = vit.encode(params, images[m], cfg, attn_impl="xla")
            ref_taps.append(jnp.stack(taps))
            ref_final.append(final)
        ref_taps = jnp.stack(ref_taps)  # [M, n_taps, N, S, D]
        ref_final = jnp.stack(ref_final)

        stage_params, rest = split_encoder_params(params, n_stages, mesh)
        encode_pp = make_pp_encode(cfg, mesh, n_stages)
        taps, final = encode_pp(stage_params, rest, images)
        return np.asarray(taps), np.asarray(final), np.asarray(ref_taps), np.asarray(ref_final)

    def test_two_stages_match_sequential(self):
        taps, final, ref_taps, ref_final = self._run(2)
        np.testing.assert_allclose(final, ref_final, atol=2e-5)
        np.testing.assert_allclose(taps, ref_taps, atol=2e-5)

    def test_four_stages_match_sequential(self):
        """One block per stage — every tap crosses a stage boundary."""
        taps, final, ref_taps, ref_final = self._run(4)
        np.testing.assert_allclose(final, ref_final, atol=2e-5)
        np.testing.assert_allclose(taps, ref_taps, atol=2e-5)

    def test_single_microbatch(self):
        taps, final, ref_taps, ref_final = self._run(2, M=1)
        np.testing.assert_allclose(final, ref_final, atol=2e-5)

    def test_stage_count_must_divide_depth(self):
        cfg = get_preset("tiny")
        mesh = pp_mesh(3)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="must divide"):
            split_encoder_params(params, 3, mesh)
        with pytest.raises(ValueError, match="must divide"):
            make_pp_encode(cfg, mesh, 3)

    def test_weights_are_stage_sharded(self):
        """Each stage's block weights live only on its pipeline rank."""
        cfg = get_preset("tiny")
        mesh = pp_mesh(4)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        stage_params, _ = split_encoder_params(params, 4, mesh)
        leaf = stage_params["attn"]["qkv_w"]  # [4, 1, D, 3D]
        assert leaf.sharding.spec[0] == "pp"
        # per-device shard is a quarter of the stacked weights
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[0] == 1
