import pytest
import numpy as np
import jax
import jax.numpy as jnp

from da3slam_tpu.models import DepthAnything3, get_preset
from da3slam_tpu.models.da3 import forward_fn, init_params
from da3slam_tpu.models.torch_import import (
    export_torch_style,
    import_torch_encoder,
    load_torch_checkpoint_file,
)


CFG = get_preset("tiny")


class TestTorchImport:
    @pytest.mark.slow
    def test_roundtrip_preserves_forward(self):
        """export → import on fresh params must reproduce the original
        model's outputs exactly (validates every name + transposition)."""
        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        p2 = init_params(jax.random.PRNGKey(99), CFG)  # different init
        p2, report = import_torch_encoder(sd, p2, CFG)
        assert not report.missing, report.missing
        assert not report.unused, report.unused

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
        o1 = forward_fn(p1, x, CFG)
        # heads aren't covered by the encoder import → splice original heads
        p2_full = dict(p2)
        p2_full["dpt"], p2_full["camera"] = p1["dpt"], p1["camera"]
        o2 = forward_fn(p2_full, x, CFG)
        np.testing.assert_allclose(np.asarray(o1["depth"]), np.asarray(o2["depth"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(o1["extrinsics"]), np.asarray(o2["extrinsics"]), atol=1e-6
        )

    def test_prefixed_names_and_partial(self):
        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = {f"backbone.{k}": v for k, v in export_torch_style(p1).items()}
        extra = dict(sd)
        extra["head.some_unknown.weight"] = np.zeros((3, 3), np.float32)
        del extra["backbone.blocks.0.mlp.fc1.weight"]
        p2, report = import_torch_encoder(extra, init_params(jax.random.PRNGKey(1), CFG), CFG)
        assert any("fc1" in m for m in report.missing)
        assert "head.some_unknown.weight" in report.unused
        assert len(report.matched) > 20

    def test_pos_embed_resolution_adaptation(self):
        """A checkpoint stored at a different pos-embed grid must import via
        bilinear resampling."""
        p1 = init_params(jax.random.PRNGKey(0), CFG)  # grid 37
        sd = export_torch_style(p1)
        D = CFG.embed_dim
        sd["pos_embed"] = np.random.default_rng(0).normal(
            size=(1, 1 + 24 * 24, D)
        ).astype(np.float32)  # grid 24 + cls
        p2, report = import_torch_encoder(sd, init_params(jax.random.PRNGKey(1), CFG), CFG)
        assert "pos_embed" in report.matched
        assert p2["encoder"]["pos_embed"].shape == p1["encoder"]["pos_embed"].shape

    def test_torch_bin_file_loading(self, tmp_path):
        import torch

        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   tmp_path / "model.bin")
        loaded = load_torch_checkpoint_file(tmp_path / "model.bin")
        assert set(loaded) == set(sd)
        np.testing.assert_array_equal(loaded["cls_token"], sd["cls_token"])
