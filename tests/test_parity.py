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
