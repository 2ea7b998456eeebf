"""Parity harness tests.

Two layers:
- The harness machinery is validated here with our OWN model as both sides
  (export a golden via our forward, reload, compare) — this proves the
  comparison math end-to-end without reference weights.
- The real reference parity test runs automatically the moment a parity
  directory (checkpoint/ + golden/*.npz, see da3slam_tpu/utils/parity.py)
  is dropped in; it skips otherwise.  Reference golden source:
  model.inference(..., export_format="mini_npz")
  (/root/reference/utils/da3_camara.py:27-28).
"""

import numpy as np
import pytest

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.utils.parity import (
    check_thresholds,
    compare_prediction,
    depth_parity,
    find_parity_dir,
    load_mini_npz,
    pose_parity,
)


class TestParityMetrics:
    def test_depth_parity_scale_invariant(self):
        rng = np.random.default_rng(0)
        gt = (1.0 + rng.uniform(0, 3, (2, 16, 16))).astype(np.float32)
        m = depth_parity(gt * 7.3, gt)  # same map at a different scale
        assert m["depth_absrel"] < 1e-6
        np.testing.assert_allclose(m["depth_scale"], 1 / 7.3, rtol=1e-5)

    def test_depth_parity_catches_disagreement(self):
        rng = np.random.default_rng(0)
        gt = (1.0 + rng.uniform(0, 3, (2, 16, 16))).astype(np.float32)
        other = (1.0 + rng.uniform(0, 3, (2, 16, 16))).astype(np.float32)
        assert depth_parity(other, gt)["depth_absrel"] > 0.1

    def test_pose_parity_anchor_invariant(self):
        """Two chunks of the same relative motion expressed in different
        local frames must compare equal (both are anchored at frame 0)."""
        from da3slam_tpu.utils.synthetic import make_trajectory

        poses = make_trajectory(5)  # [5,3,4] w2c
        M = np.tile(np.eye(4), (5, 1, 1))
        M[:, :3] = poses
        # re-express in the frame of pose 2
        re = np.einsum("nij,jk->nik", M, np.linalg.inv(M[2]))[:, :3]
        m = pose_parity(re, poses)
        assert m["rot_deg"] < 1e-4
        assert m["trans_rel"] < 1e-6

    def test_pose_parity_catches_rotation_error(self):
        from da3slam_tpu.utils.synthetic import make_trajectory

        poses = make_trajectory(4)
        bad = poses.copy()
        ang = np.radians(5)
        Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        bad[3, :3, :3] = Rz @ bad[3, :3, :3]
        assert pose_parity(bad, poses)["rot_deg"] > 4.0

    def test_thresholds(self):
        good = {"depth_absrel": 0.001, "conf_corr": 0.999, "rot_deg": 0.01,
                "trans_rel": 0.001, "focal_rel": 0.001}
        assert check_thresholds(good) == []
        bad = dict(good, depth_absrel=0.5, conf_corr=0.2)
        fails = check_thresholds(bad)
        assert len(fails) == 2


class TestHarnessSelfParity:
    def test_our_model_matches_its_own_golden(self, tmp_path):
        """Round-trip through the golden format: run our model, save its
        outputs as a mini_npz, reload, re-run, compare — every metric must
        pass its threshold (the harness is ready for a real golden drop)."""
        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        # patch-aligned size with matching process_res: the golden's
        # processed_images then equal the raw input bit-exactly, like a real
        # mini_npz whose images are already at model resolution
        imgs = rng.integers(0, 255, (3, 56, 56, 3)).astype(np.uint8)
        pred = model.inference(image=list(imgs), process_res=56)

        golden_path = tmp_path / "golden_000.npz"
        np.savez(
            golden_path,
            processed_images=np.asarray(pred.processed_images),
            depth=np.asarray(pred.depth),
            conf=np.asarray(pred.conf),
            extrinsics=np.asarray(pred.extrinsics),
            intrinsics=np.asarray(pred.intrinsics),
        )

        golden = load_mini_npz(golden_path)
        # same resolution inference run_parity performs (identity resize)
        pred2 = model.inference(
            image=list(golden["processed_images"]),
            process_res=max(golden["processed_images"].shape[1:3]),
        )
        metrics = compare_prediction(pred2, golden)
        failures = check_thresholds(metrics)
        assert not failures, failures

    def test_mini_npz_alias_keys(self, tmp_path):
        p = tmp_path / "g.npz"
        np.savez(p, images=np.zeros((1, 8, 8, 3), np.uint8),
                 depths=np.ones((1, 8, 8, 1), np.float32))
        g = load_mini_npz(p)
        assert g["depth"].shape == (1, 8, 8)  # squeezed + aliased

    def test_missing_keys_raise(self, tmp_path):
        p = tmp_path / "g.npz"
        np.savez(p, images=np.zeros((1, 8, 8, 3), np.uint8))
        with pytest.raises(ValueError, match="missing required"):
            load_mini_npz(p)


class TestParityCLI:
    """End-to-end CLI rehearsal with synthetic TORCH-LAYOUT checkpoints: the
    exact flow of a day-one real-checkpoint drop (checkpoint dir → cli/parity
    → exit code), so refactors can't silently break the mounting path.

    The golden is computed INDEPENDENTLY of the checkpoint load: the forward
    runs on the original in-memory params, while the CLI must reconstruct the
    same params from the serialized torch-style state dict (name map, layout
    transposes, config.json round-trip) to pass."""

    def _make_case(self, tmp_path, variant):
        import dataclasses
        import json

        from safetensors.numpy import save_file

        import jax

        from da3slam_tpu.models import get_preset
        from da3slam_tpu.models.da3 import init_params
        from da3slam_tpu.models.torch_import import export_torch_style

        cfg = get_preset("tiny")
        if variant == "swiglu":  # the giant tier's FFN flavour
            cfg = cfg.with_overrides(mlp_type="swiglu")
        params = init_params(jax.random.PRNGKey(3), cfg)
        sd = export_torch_style(params)
        if variant == "prefixed":  # DINOv2 nested under 'backbone.', alt head names
            head_prefixes = ("depth_head.", "camera_head.")
            sd = {
                (k if k.startswith(head_prefixes) else f"backbone.{k}"): v
                for k, v in sd.items()
            }
            sd = {
                k.replace("depth_head.", "head.").replace("camera_head.", "cam_head."): v
                for k, v in sd.items()
            }

        ckpt = tmp_path / "checkpoint"
        ckpt.mkdir()
        (ckpt / "config.json").write_text(json.dumps(dataclasses.asdict(cfg)))
        if variant == "torch_bin":
            import torch

            torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
                       ckpt / "pytorch_model.bin")
        else:
            save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                      str(ckpt / "model.safetensors"))

        # independent golden: forward on the ORIGINAL params (no checkpoint IO)
        model = DepthAnything3(cfg, params)
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
        pred = model.inference(image=list(imgs), process_res=56)
        golden = tmp_path / "golden_000.npz"
        np.savez(
            golden,
            processed_images=np.asarray(pred.processed_images),
            depth=np.asarray(pred.depth),
            conf=np.asarray(pred.conf),
            extrinsics=np.asarray(pred.extrinsics),
            intrinsics=np.asarray(pred.intrinsics),
        )
        return ckpt, golden

    @pytest.mark.parametrize("variant", ["plain", "swiglu", "prefixed", "torch_bin"])
    def test_cli_passes_on_faithful_checkpoint(self, tmp_path, variant):
        from da3slam_tpu.cli.parity import main as parity_main

        ckpt, golden = self._make_case(tmp_path, variant)
        rc = parity_main(["--checkpoint", str(ckpt), "--golden", str(golden)])
        assert rc == 0

    def test_cli_fails_on_corrupted_weights(self, tmp_path):
        """A perturbed tensor must flip the exit code — proof the comparison
        has teeth at CLI level (not just that loading didn't crash)."""
        from safetensors.numpy import load_file, save_file

        from da3slam_tpu.cli.parity import main as parity_main

        ckpt, golden = self._make_case(tmp_path, "plain")
        f = str(ckpt / "model.safetensors")
        sd = dict(load_file(f))
        key = "patch_embed.proj.weight"
        sd[key] = sd[key] + np.float32(1.0)
        save_file(sd, f)
        rc = parity_main(["--checkpoint", str(ckpt), "--golden", str(golden)])
        assert rc == 1

    def test_cli_reports_missing_data(self, tmp_path, monkeypatch):
        from da3slam_tpu.cli.parity import main as parity_main

        monkeypatch.setenv("DA3_PARITY_DIR", str(tmp_path / "nope"))
        assert parity_main([]) == 2


@pytest.mark.skipif(
    find_parity_dir() is None,
    reason="no reference parity data (drop checkpoint/ + golden/*.npz under "
    "$DA3_PARITY_DIR or /root/repo/parity_data to enable)",
)
class TestReferenceParity:
    def test_reference_goldens(self):
        """Real-weight parity vs. the PyTorch reference (BASELINE headline
        fidelity metric).  Runs the full one-command check."""
        from da3slam_tpu.cli.parity import main

        assert main([]) == 0
