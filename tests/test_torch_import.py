import pytest
import numpy as np
import jax
import jax.numpy as jnp

from da3slam_tpu.models import DepthAnything3, get_preset
from da3slam_tpu.models.da3 import forward_fn, init_params
from da3slam_tpu.models.torch_import import (
    export_torch_style,
    import_torch_checkpoint,
    import_torch_encoder,
    import_torch_heads,
    load_torch_checkpoint_file,
)


CFG = get_preset("tiny")


def assert_pytree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(la, lb):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=str(pa)
        )


class TestTorchImport:
    def test_full_checkpoint_roundtrip_bitwise(self):
        """export → full import on different-init params must reproduce the
        ENTIRE pytree bitwise — encoder, DPT head, and camera head — with
        zero unmatched tensors in either direction (the 'zero-unmatched
        synthetic full checkpoint' bar; real DA3 checkpoints load through
        the same name map, reference solver.py:58-61)."""
        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        p2 = init_params(jax.random.PRNGKey(99), CFG)  # different init
        p2, report = import_torch_checkpoint(sd, p2, CFG)
        assert not report.missing, report.missing
        assert not report.unused, report.unused
        assert_pytree_equal(p1, p2)

    def test_head_import_alternate_prefixes(self):
        """Released checkpoints differ in head prefixes; 'head.' / 'cam_head.'
        aliases must map onto the same tensors."""
        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        renamed = {}
        for k, v in sd.items():
            k = k.replace("depth_head.", "head.").replace("camera_head.", "cam_head.")
            renamed[k] = v
        p2, report = import_torch_heads(renamed, init_params(jax.random.PRNGKey(1), CFG))
        assert not report.missing, report.missing
        assert_pytree_equal(p1["dpt"], p2["dpt"])
        assert_pytree_equal(p1["camera"], p2["camera"])

    def test_export_uses_torch_layouts(self):
        """The exported dict must be in torch conventions: convs OIHW,
        linears [out, in] — so real torch tooling can consume it."""
        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        # head_out: ours HWIO [1,1,32,8] → torch OIHW [8,32,1,1]
        assert sd["depth_head.scratch.output_conv2.2.weight"].shape == (8, 32, 1, 1)
        cam_w1 = sd["camera_head.mlp.fc1.weight"]
        assert cam_w1.shape == (CFG.camera_dim, CFG.embed_dim)

    @pytest.mark.slow
    def test_roundtrip_preserves_forward(self):
        """export → full import on fresh params must reproduce the original
        model's outputs exactly (validates every name + transposition on the
        real forward path, heads included)."""
        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        p2, report = import_torch_checkpoint(
            sd, init_params(jax.random.PRNGKey(99), CFG), CFG
        )
        assert not report.missing, report.missing

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
        o1 = forward_fn(p1, x, CFG)
        o2 = forward_fn(p2, x, CFG)
        np.testing.assert_allclose(np.asarray(o1["depth"]), np.asarray(o2["depth"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(o1["extrinsics"]), np.asarray(o2["extrinsics"]), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(o1["conf"]), np.asarray(o2["conf"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(o1["intrinsics"]), np.asarray(o2["intrinsics"]), atol=1e-6
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

    @pytest.mark.slow  # heavy: see --durations trim, round 3
    def test_torch_bin_file_loading(self, tmp_path):
        import torch

        p1 = init_params(jax.random.PRNGKey(0), CFG)
        sd = export_torch_style(p1)
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   tmp_path / "model.bin")
        loaded = load_torch_checkpoint_file(tmp_path / "model.bin")
        assert set(loaded) == set(sd)
        np.testing.assert_array_equal(loaded["cls_token"], sd["cls_token"])


class TestPublishedSchemaFixture:
    """Non-circular name-map validation: the manifests under tests/fixtures
    are written down from the PUBLISHED DINOv2 + DPT state-dict conventions
    (see tests/fixtures/gen_torch_schema.py) without importing this repo's
    mapping code — so any drift in torch_import's name map fails here even
    though the roundtrip tests (which share the map) would still pass."""

    @pytest.fixture(scope="class")
    def schema(self):
        import json
        from pathlib import Path

        p = Path(__file__).parent / "fixtures" / "torch_schema_small.json"
        return json.loads(p.read_text())

    @pytest.fixture(scope="class")
    def manifest_sd(self, schema):
        rng = np.random.default_rng(0)
        return {
            k: rng.normal(size=shape).astype(np.float32)
            for k, shape in schema["keys"].items()
        }

    @pytest.fixture(scope="class")
    def init_small(self):
        # SMALL-tier init is the expensive part (~20 s on CPU); share it
        return init_params(jax.random.PRNGKey(0), get_preset("small"))

    @pytest.fixture(scope="class")
    def imported(self, manifest_sd, init_small):
        cfg = get_preset("small")
        return import_torch_checkpoint(manifest_sd, init_small, cfg)

    def test_zero_unmatched_keys(self, schema, imported):
        """Every tensor of a published-schema checkpoint must be consumed,
        and the only params left at init must be the documented ones
        (bias-free published scratch convs)."""
        _, report = imported
        assert report.unused == [], f"checkpoint tensors not consumed: {report.unused}"
        assert sorted(report.missing) == sorted(schema["expected_missing"]), (
            f"unexpected unmatched params: {report.missing}"
        )

    def test_tensors_actually_land(self, schema, manifest_sd, imported):
        """Spot-check that manifest tensors end up in the pytree with the
        right transposition (torch [out,in] -> ours [in,out]; OIHW -> HWIO;
        ConvTranspose [in,out,kh,kw] -> HWIO)."""
        p, _ = imported
        np.testing.assert_array_equal(
            np.asarray(p["encoder"]["blocks"][3]["attn"]["qkv_w"]),
            manifest_sd["blocks.3.attn.qkv.weight"].T,
        )
        np.testing.assert_array_equal(
            np.asarray(p["dpt"]["project"][2]["kernel"]),
            np.transpose(manifest_sd["depth_head.projects.2.weight"], (2, 3, 1, 0)),
        )
        np.testing.assert_array_equal(
            np.asarray(p["dpt"]["resize"]["r0"]["kernel"]),
            np.transpose(manifest_sd["depth_head.resize_layers.0.weight"], (2, 3, 0, 1)),
        )
        np.testing.assert_array_equal(
            np.asarray(p["camera"]["w_out"]),
            manifest_sd["camera_head.out.weight"].T,
        )

    def test_pretraining_pos_embed_grid_adapts(self, schema, init_small, imported):
        """Released pos_embed is the 37x37 (518/14) cls-first grid; it must
        strip cls and resize onto our grid."""
        cfg = get_preset("small")
        G = init_small["encoder"]["pos_embed"].shape[0]
        p, report = imported
        assert "pos_embed" in report.matched
        assert p["encoder"]["pos_embed"].shape == (G, G, cfg.embed_dim)

    def test_backbone_prefixed_variant(self, schema, manifest_sd, init_small, imported):
        """Checkpoints that nest the DINOv2 under a 'backbone.' prefix
        (common in multi-head releases, incl. the NESTED-GIANT-LARGE
        naming of configs/config1.yaml:2-5) must import identically."""
        cfg = get_preset("small")
        head_prefixes = ("depth_head.", "camera_head.")
        sd = {
            (k if k.startswith(head_prefixes) else f"backbone.{k}"): v
            for k, v in manifest_sd.items()
        }
        p_plain, _ = imported
        p_pref, report = import_torch_checkpoint(sd, init_small, cfg)
        assert report.unused == [], report.unused
        assert_pytree_equal(p_plain, p_pref)

    def test_manifest_is_in_sync_with_generator(self, schema):
        """The checked-in JSON must match its generator (guards hand-edits)."""
        import importlib.util
        from pathlib import Path

        gen_path = Path(__file__).parent / "fixtures" / "gen_torch_schema.py"
        spec = importlib.util.spec_from_file_location("gen_torch_schema", gen_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.manifest("small") == schema


class TestSwiGLUImport:
    """The giant tier's DINOv2-giant backbone uses SwiGLUFFN (``mlp.w12``
    fused gate|value + ``mlp.w3``).  The name map is validated at tiny
    dims (a full giant init is ~1B params); the checked-in giant manifest
    pins the real shapes and is checked against the preset via eval_shape."""

    SWIGLU_CFG = get_preset("tiny").with_overrides(mlp_type="swiglu")

    def _manifest_sd(self, cfg):
        import importlib.util
        from pathlib import Path

        gen_path = Path(__file__).parent / "fixtures" / "gen_torch_schema.py"
        spec = importlib.util.spec_from_file_location("gen_torch_schema", gen_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        keys = mod.backbone_keys(
            cfg.embed_dim, cfg.depth, cfg.mlp_hidden,
            cfg.num_register_tokens, "swiglu",
        )
        rng = np.random.default_rng(3)
        return {k: rng.normal(size=s).astype(np.float32) for k, s in keys.items()}

    def test_mlp_hidden_convention(self):
        # 2/3 * 4 * 1536 = 4096 exactly (DINOv2-giant)
        assert get_preset("giant").mlp_hidden == 4096
        assert get_preset("giant").mlp_type == "swiglu"
        assert get_preset("da3nested-giant-large-1.1").mlp_type == "swiglu"

    def test_encoder_import_zero_unused_and_split(self):
        cfg = self.SWIGLU_CFG
        params = init_params(jax.random.PRNGKey(0), cfg)
        sd = self._manifest_sd(cfg)
        p, report = import_torch_encoder(sd, params, cfg)
        assert report.unused == [], report.unused
        assert report.missing == [], report.missing
        h = cfg.mlp_hidden
        blk = p["encoder"]["blocks"][1]
        # the fused w12 splits with the GATE in the first h rows
        np.testing.assert_array_equal(
            np.asarray(blk["mlp"]["wg"]), sd["blocks.1.mlp.w12.weight"][:h].T
        )
        np.testing.assert_array_equal(
            np.asarray(blk["mlp"]["wv"]), sd["blocks.1.mlp.w12.weight"][h:].T
        )
        np.testing.assert_array_equal(
            np.asarray(blk["mlp"]["bg"]), sd["blocks.1.mlp.w12.bias"][:h]
        )
        np.testing.assert_array_equal(
            np.asarray(blk["mlp"]["w3"]), sd["blocks.1.mlp.w3.weight"].T
        )

    def test_export_roundtrip_bitwise(self):
        cfg = self.SWIGLU_CFG
        p1 = init_params(jax.random.PRNGKey(1), cfg)
        sd = export_torch_style(p1)
        assert "blocks.0.mlp.w12.weight" in sd and "blocks.0.mlp.w3.weight" in sd
        p2, report = import_torch_checkpoint(sd, init_params(jax.random.PRNGKey(5), cfg), cfg)
        assert report.unused == [], report.unused
        assert_pytree_equal(p1, p2)

    def test_swiglu_forward_differs_from_mlp(self):
        """Same seed, same shapes where shared: the FFN flavour must change
        the computation (guards a silent fall-through to the gelu path)."""
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
        cfg_g = self.SWIGLU_CFG
        cfg_m = get_preset("tiny")
        out_g = forward_fn(init_params(jax.random.PRNGKey(0), cfg_g), imgs, cfg_g)
        out_m = forward_fn(init_params(jax.random.PRNGKey(0), cfg_m), imgs, cfg_m)
        assert np.abs(np.asarray(out_g["depth"]) - np.asarray(out_m["depth"])).max() > 1e-6
        assert np.isfinite(np.asarray(out_g["depth"])).all()

    def test_giant_manifest_matches_preset_shapes(self):
        """The checked-in giant manifest's backbone shapes must agree with
        what init_params would build for the preset (via eval_shape — a
        real giant init is too large for a unit test)."""
        import json
        from pathlib import Path

        cfg = get_preset("giant")
        shapes = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.PRNGKey(0))
        manifest = json.loads(
            (Path(__file__).parent / "fixtures" / "torch_schema_giant.json").read_text()
        )["keys"]
        blk = shapes["encoder"]["blocks"][0]["mlp"]
        h = cfg.mlp_hidden
        assert manifest["blocks.0.mlp.w12.weight"] == [2 * h, cfg.embed_dim]
        assert blk["wg"].shape == (cfg.embed_dim, h)
        assert blk["w3"].shape == (h, cfg.embed_dim)
        assert manifest["blocks.0.mlp.w3.weight"] == [cfg.embed_dim, h]
        assert manifest["blocks.39.ls2.gamma"] == [cfg.embed_dim]
        assert len(shapes["encoder"]["blocks"]) == 40


class TestManifestTierCoverage:
    @pytest.mark.parametrize("tier", ["small", "base", "large", "giant"])
    def test_manifest_shapes_match_preset(self, tier):
        """Every released tier (configs/config1.yaml:2-5) has a checked-in
        published-schema manifest whose backbone/head shapes agree with the
        preset's pytree (checked via eval_shape — no giant-sized init)."""
        import json
        from pathlib import Path

        cfg = get_preset(tier)
        manifest = json.loads(
            (Path(__file__).parent / "fixtures" / f"torch_schema_{tier}.json").read_text()
        )["keys"]
        shapes = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.PRNGKey(0))
        # backbone dims
        assert manifest["patch_embed.proj.weight"] == [cfg.embed_dim, 3, 14, 14]
        assert manifest[f"blocks.{cfg.depth - 1}.ls2.gamma"] == [cfg.embed_dim]
        assert len(shapes["encoder"]["blocks"]) == cfg.depth
        if cfg.mlp_type == "swiglu":
            assert manifest["blocks.0.mlp.w12.weight"] == [2 * cfg.mlp_hidden, cfg.embed_dim]
        else:
            assert manifest["blocks.0.mlp.fc1.weight"] == [cfg.mlp_hidden, cfg.embed_dim]
        # head dims
        for k, f in enumerate(cfg.dpt_features):
            assert manifest[f"depth_head.projects.{k}.weight"] == [f, cfg.embed_dim, 1, 1]
            assert manifest[f"depth_head.scratch.layer{k + 1}_rn.weight"] == [
                cfg.dpt_dim, f, 3, 3
            ]
        assert shapes["dpt"]["project"][0]["kernel"].shape == (
            1, 1, cfg.embed_dim, cfg.dpt_features[0]
        )


class TestSwiGLUImportErrors:
    def test_flavour_mismatch_raises(self):
        """A SwiGLU checkpoint against an mlp-config import must fail loudly
        (silently leaving every FFN at init produces garbage depth)."""
        cfg_s = get_preset("tiny").with_overrides(mlp_type="swiglu")
        sd = export_torch_style(init_params(jax.random.PRNGKey(0), cfg_s))
        cfg_m = get_preset("tiny")
        with pytest.raises(ValueError, match="flavour mismatch"):
            import_torch_encoder(sd, init_params(jax.random.PRNGKey(1), cfg_m), cfg_m)

    def test_wrong_fused_width_raises(self):
        """A w12 whose fused width disagrees with the config's hidden must
        refuse — slicing [:h] of a larger tensor would silently import the
        wrong rows as the gate."""
        cfg = get_preset("tiny").with_overrides(mlp_type="swiglu")
        sd = export_torch_style(init_params(jax.random.PRNGKey(0), cfg))
        h = cfg.mlp_hidden
        D = cfg.embed_dim
        rng = np.random.default_rng(0)
        for k in list(sd):
            if k.endswith("mlp.w12.weight"):
                sd[k] = rng.normal(size=(2 * (h + 8), D)).astype(np.float32)
            if k.endswith("mlp.w12.bias"):
                sd[k] = rng.normal(size=(2 * (h + 8),)).astype(np.float32)
        with pytest.raises(ValueError, match="fused width"):
            import_torch_encoder(sd, init_params(jax.random.PRNGKey(1), cfg), cfg)

    def test_checkpoint_dir_infers_swiglu_from_tensors(self, tmp_path):
        """A checkpoint dir whose config.json omits mlp_type but whose
        tensors are SwiGLU must import as SwiGLU (da3.py trusts the
        tensors over the config)."""
        import json

        import torch

        cfg = get_preset("tiny").with_overrides(mlp_type="swiglu")
        p1 = init_params(jax.random.PRNGKey(3), cfg)
        sd = export_torch_style(p1)
        torch.save(
            {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
            tmp_path / "pytorch_model.bin",
        )
        # config.json with the dims but WITHOUT mlp_type
        (tmp_path / "config.json").write_text(json.dumps({
            "embed_dim": cfg.embed_dim, "depth": cfg.depth,
            "num_heads": cfg.num_heads,
            "num_register_tokens": cfg.num_register_tokens,
            "dpt_layers": list(cfg.dpt_layers), "dpt_dim": cfg.dpt_dim,
            "dpt_features": list(cfg.dpt_features),
            "camera_dim": cfg.camera_dim,
        }))
        model = DepthAnything3.from_pretrained(str(tmp_path))
        assert model.cfg.mlp_type == "swiglu"
        assert_pytree_equal(model.params["encoder"], p1["encoder"])
