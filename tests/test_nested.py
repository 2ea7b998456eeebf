"""NESTED tier (models/nested.py): the reference's first-listed production
checkpoint DA3NESTED-GIANT-LARGE-1.1 (/root/reference/configs/config1.yaml:2)
— one state dict packaging the any-view geometry model and the monocular
metric-scale model.  Covers: split detection/ranking, the non-circular
schema fixture, torch-layout roundtrip through the checkpoint-directory
path, metric-scale inference semantics, and the parity CLI's acceptance of
nested checkpoints.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

import jax

from da3slam_tpu.models import (
    DepthAnything3,
    DepthAnything3Nested,
    get_preset,
    resolve_nested_preset,
)
from da3slam_tpu.models.da3 import init_params
from da3slam_tpu.models.nested import (
    _config_from_state_dict,
    export_torch_style_nested,
    metric_scale_from_mono,
)
from da3slam_tpu.models.torch_import import split_nested_state_dict

FIXTURES = Path(__file__).parent / "fixtures"


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "gen_torch_schema", FIXTURES / "gen_torch_schema.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _shape_only_sd(keys: dict[str, list[int]]) -> dict[str, np.ndarray]:
    """Zero-allocation state dict with correct .shape per tensor (the
    real nested manifest is ~6 GB materialised; split/config inference
    read shapes only)."""
    return {k: np.broadcast_to(np.float32(0), tuple(s)) for k, s in keys.items()}


class TestSplit:
    def test_not_nested_returns_none(self):
        sd = {"patch_embed.proj.weight": np.zeros((8, 3, 14, 14), np.float32)}
        assert split_nested_state_dict(sd) is None

    def test_named_prefixes_split(self):
        gen = _load_generator()
        any_keys = gen.backbone_keys(32, 2, 128, 1)
        met_keys = gen.backbone_keys(16, 2, 64, 1)
        sd = {
            **{f"model.{k}": np.zeros(s, np.float32) for k, s in any_keys.items()},
            **{f"metric_model.{k}": np.zeros(s, np.float32)
               for k, s in met_keys.items()},
        }
        split = split_nested_state_dict(sd)
        assert split is not None
        sd_any, sd_met, (p_any, p_met) = split
        assert (p_any, p_met) == ("model.", "metric_model.")
        assert set(sd_any) == set(any_keys)
        assert set(sd_met) == set(met_keys)

    def test_metric_name_wins_over_dim(self):
        """A metric submodel LARGER than the any-view one must still land in
        the metric slot — naming decides before dims."""
        gen = _load_generator()
        small = gen.backbone_keys(16, 1, 64, 1)
        big = gen.backbone_keys(32, 1, 128, 1)
        sd = {
            **{f"model.{k}": np.zeros(s, np.float32) for k, s in small.items()},
            **{f"metric_model.{k}": np.zeros(s, np.float32) for k, s in big.items()},
        }
        _, sd_met, (p_any, p_met) = split_nested_state_dict(sd)
        assert p_met == "metric_model."
        assert sd_met["patch_embed.proj.weight"].shape[0] == 32

    def test_unnamed_prefixes_rank_by_dim(self):
        """Without 'metric' in any prefix, the any-view model is the larger
        backbone (giant 1536 > large 1024 in the real checkpoint)."""
        gen = _load_generator()
        big = gen.backbone_keys(32, 1, 128, 1)
        small = gen.backbone_keys(16, 1, 64, 1)
        sd = {
            **{f"a.{k}": np.zeros(s, np.float32) for k, s in small.items()},
            **{f"b.{k}": np.zeros(s, np.float32) for k, s in big.items()},
        }
        _, _, (p_any, p_met) = split_nested_state_dict(sd)
        assert p_any == "b."
        assert p_met == "a."

    def test_unprefixed_anyview_plus_metric_submodel(self):
        """An unprefixed any-view backbone + a metric_model. submodel must
        bind every key to the LONGEST matching prefix."""
        gen = _load_generator()
        any_keys = gen.backbone_keys(32, 1, 128, 1)
        met_keys = gen.backbone_keys(16, 1, 64, 1)
        sd = {
            **{k: np.zeros(s, np.float32) for k, s in any_keys.items()},
            **{f"metric_model.{k}": np.zeros(s, np.float32)
               for k, s in met_keys.items()},
        }
        sd_any, sd_met, (p_any, p_met) = split_nested_state_dict(sd)
        assert p_any == ""
        assert set(sd_any) == set(any_keys)
        assert set(sd_met) == set(met_keys)


class TestSchemaFixture:
    @pytest.fixture(scope="class")
    def schema(self):
        return json.loads((FIXTURES / "torch_schema_nested_giant.json").read_text())

    def test_manifest_in_sync_with_generator(self, schema):
        assert _load_generator().nested_manifest() == schema

    def test_split_and_tier_inference_on_manifest(self, schema):
        """The checked-in REAL-shape manifest must split under the pinned
        prefixes and identify the released tiers from tensors alone
        (shape-only arrays: the materialised manifest is ~6 GB)."""
        sd = _shape_only_sd(schema["keys"])
        split = split_nested_state_dict(sd)
        assert split is not None
        sd_any, sd_met, (p_any, p_met) = split
        assert p_any == schema["prefixes"]["anyview"]
        assert p_met == schema["prefixes"]["metric"]
        assert _config_from_state_dict(sd_any) == get_preset("giant")
        assert _config_from_state_dict(sd_met) == get_preset("large")

    def test_config_inference_rejects_unknown_tier(self):
        gen = _load_generator()
        sd = _shape_only_sd(gen.backbone_keys(48, 3, 128, 1))
        with pytest.raises(ValueError, match="no preset matches"):
            _config_from_state_dict(sd)


class TestNestedModel:
    @pytest.fixture(scope="class")
    def nested(self):
        return DepthAnything3Nested.from_pretrained("nested-tiny")

    def test_preset_resolution(self):
        assert resolve_nested_preset("DA3NESTED-GIANT-LARGE-1.1") == (
            "giant", "large",
        )
        assert resolve_nested_preset(
            "/ckpts/DA3NESTED-GIANT-LARGE-1.1"
        ) == ("giant", "large")
        assert resolve_nested_preset("small") is None

    def test_from_pretrained_returns_nested(self):
        m = DepthAnything3.from_pretrained("nested-tiny")
        assert isinstance(m, DepthAnything3Nested)
        assert m.cfg == get_preset("tiny")

    def test_inference_metric_scale_semantics(self, nested):
        """depth and extrinsic translations scale by metric_scale; rotations
        and intrinsics are untouched; the §2.5 contract shapes hold."""
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (3, 56, 56, 3)).astype(np.uint8)
        pred = nested.inference(image=list(imgs), process_res=56)
        base = nested.anyview.inference(image=list(imgs), process_res=56)
        s = pred.metric_scale
        assert s is not None and np.isfinite(s) and s > 0
        np.testing.assert_allclose(pred.depth, base.depth * s, rtol=1e-5)
        np.testing.assert_allclose(
            pred.extrinsics[:, :, 3], base.extrinsics[:, :, 3] * s, rtol=1e-5
        )
        np.testing.assert_array_equal(
            pred.extrinsics[:, :, :3], base.extrinsics[:, :, :3]
        )
        np.testing.assert_array_equal(pred.intrinsics, base.intrinsics)
        assert pred.depth.shape == base.depth.shape

    def test_extrinsics_conditioning_skips_metric_rescale(self, nested):
        """Input poses define the scale already (the extrinsics= probe,
        examples/extrinsics_conditioning.py): metric rescale must not fight
        them."""
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
        ext = np.repeat(np.eye(4, dtype=np.float32)[None, :3], 2, axis=0)
        ext[1, 0, 3] = 0.5
        pred = nested.inference(image=list(imgs), process_res=56, extrinsics=ext)
        assert pred.metric_scale is None
        np.testing.assert_allclose(pred.extrinsics, ext, rtol=1e-6)

    def test_metric_scale_estimator_recovers_known_scale(self):
        rng = np.random.default_rng(0)
        any_d = rng.uniform(0.5, 4.0, (32, 32)).astype(np.float32)
        conf = np.full((32, 32), 2.0, np.float32)
        s = metric_scale_from_mono(any_d, conf, 3.7 * any_d, conf)
        assert abs(float(s) - 3.7) < 1e-5

    def test_metric_scale_estimator_falls_back_to_one(self):
        zero = np.zeros((8, 8), np.float32)
        conf = np.ones((8, 8), np.float32)
        assert float(metric_scale_from_mono(zero, conf, zero, conf)) == 1.0


class TestNestedCheckpointRoundtrip:
    def _write_checkpoint(self, tmp_path, nested):
        from safetensors.numpy import save_file

        sd = export_torch_style_nested(nested)
        ckpt = tmp_path / "DA3NESTED-TINY"
        ckpt.mkdir()
        (ckpt / "config.json").write_text(json.dumps({
            "model": dataclasses.asdict(nested.anyview.cfg),
            "metric_model": dataclasses.asdict(nested.metric.cfg),
        }))
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  str(ckpt / "model.safetensors"))
        return ckpt

    def test_checkpoint_dir_roundtrip_forward_parity(self, tmp_path):
        """export → nested safetensors dir → DepthAnything3.from_pretrained
        auto-detects the nested layout → identical inference output."""
        src = DepthAnything3Nested.from_pretrained("nested-tiny", seed=11)
        ckpt = self._write_checkpoint(tmp_path, src)
        loaded = DepthAnything3.from_pretrained(str(ckpt))
        assert isinstance(loaded, DepthAnything3Nested)
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
        a = src.inference(image=list(imgs), process_res=56)
        b = loaded.inference(image=list(imgs), process_res=56)
        np.testing.assert_allclose(
            np.asarray(a.depth), np.asarray(b.depth), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a.extrinsics), np.asarray(b.extrinsics),
            rtol=1e-5, atol=1e-6,
        )
        assert abs(a.metric_scale - b.metric_scale) < 1e-6

    def test_parity_cli_accepts_nested_checkpoint(self, tmp_path):
        """Day-one flow for the nested tier: checkpoint dir + mini_npz
        golden → cli/parity exit 0 (VERDICT r4 next #3 'make cli/parity.py
        accept it')."""
        from da3slam_tpu.cli.parity import main as parity_main

        src = DepthAnything3Nested.from_pretrained("nested-tiny", seed=5)
        ckpt = self._write_checkpoint(tmp_path, src)
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
        pred = src.inference(image=list(imgs), process_res=56)
        golden = tmp_path / "golden_000.npz"
        np.savez(
            golden,
            processed_images=np.asarray(pred.processed_images),
            depth=np.asarray(pred.depth),
            conf=np.asarray(pred.conf),
            extrinsics=np.asarray(pred.extrinsics),
            intrinsics=np.asarray(pred.intrinsics),
        )
        rc = parity_main(["--checkpoint", str(ckpt), "--golden", str(golden)])
        assert rc == 0
