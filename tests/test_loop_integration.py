"""Full-system loop-closure integration: the one test that exercises
detection → gating → joint re-inference → pose-graph optimisation → export
as a single organism (the machinery the reference ships disabled,
utils/da3_streaming.py:589-624).

A textured synthetic sequence with a genuine revisit (make_loop_trajectory
returns to its start) runs through DA3Streaming twice — loop closure off
and on — and the exported camera_poses.txt is parsed back and scored
against ground truth: the loop run must accept at least one gated edge and
reduce ATE.
"""

from __future__ import annotations

import numpy as np
import pytest

from da3slam_tpu.inout.ply import read_ply
from da3slam_tpu.inout.trajectory import load_camera_poses
from da3slam_tpu.slam.evaluate import evaluate_trajectory
from da3slam_tpu.slam.streaming import DA3Streaming
from da3slam_tpu.utils.synthetic import (
    SyntheticDA3,
    make_loop_trajectory,
    make_synthetic_image_dir,
)

N_FRAMES = 48
HW = (48, 64)


def _make_model():
    # fresh instance per run: call_count drives per-chunk scale ambiguity,
    # so both runs must see identical scales
    rng = np.random.default_rng(3)
    poses = make_loop_trajectory(N_FRAMES)
    return poses, SyntheticDA3(
        poses,
        hw=HW,
        chunk_scales=rng.uniform(0.5, 2.0, size=24),
        depth_noise=6e-3,
        textured=True,
        seed=7,
    )


def _config(loop_enable: bool) -> dict:
    return {
        "Model": {
            "chunk_size": 6,
            "overlap": 2,
            "delete_temp_files": False,
        },
        "IRLS": {"delta": 0.1, "max_iters": 5},
        "Pointcloud_Save": {"conf_threshold_coef": 0.9, "sample_ratio": 1.0},
        "Loop": {
            "enable": loop_enable,
            "Retrieval": {"threshold": 0.9, "min_gap": 25, "max_loops": 5},
            "Gate": {"max_rmse": 0.08, "min_n_effective": 200,
                     "max_reciprocal_err": 0.15},
            "SIM3_Optimizer": {"max_iterations": 30, "lambda_init": 1e-6},
        },
    }


@pytest.mark.slow
def test_loop_closure_improves_ate_end_to_end(tmp_path):
    image_dir = make_synthetic_image_dir(tmp_path, N_FRAMES)
    poses_gt_w2c, _ = _make_model()
    gt_c2w = np.stack(
        [np.linalg.inv(np.vstack([E, [0, 0, 0, 1]])) for E in poses_gt_w2c]
    )

    results = {}
    for name, enable in (("off", False), ("on", True)):
        _, model = _make_model()
        out_dir = tmp_path / f"loop_{name}"
        s = DA3Streaming(str(image_dir), str(out_dir), _config(enable), model=model)
        s.run()
        est = load_camera_poses(out_dir / "camera_poses.txt")
        assert est.shape == (N_FRAMES, 4, 4)
        assert s.n_pose_filled == 0, "tail re-anchoring must cover every frame"
        res = evaluate_trajectory(est, gt_c2w, align="sim3")
        results[name] = (s, res)
        # exports parse back: merged cloud with real points + colors
        pts, cols = read_ply(out_dir / "combined_pcd.ply")
        assert len(pts) > 1000 and cols is not None
        assert np.isfinite(pts).all()

    s_on, res_on = results["on"]
    s_off, res_off = results["off"]
    assert not s_off.loop_edges
    assert len(s_on.loop_edges) >= 1, "gate accepted no loop edge"
    # the loop edge must tie a late chunk back to an early one
    a, b, _ = s_on.loop_edges[0]
    assert abs(b - a) >= 2
    # and optimisation must actually help (drift redistributed over the graph)
    assert res_on.ate_rmse < res_off.ate_rmse, (
        f"loop closure made ATE worse: {res_on.ate_rmse:.5f} vs "
        f"{res_off.ate_rmse:.5f}"
    )


@pytest.mark.slow
def test_loop_run_3dgs_export_roundtrip(tmp_path):
    """The aligned streaming output feeds the 3DGS exporter and the PLY
    parses back with the full gaussian attribute set (main_3dgs.py was a
    5-line stub in the reference; here it must work off the loop run)."""
    from pathlib import Path

    from da3slam_tpu.inout.export3d import prediction_to_3dgs

    image_dir = make_synthetic_image_dir(tmp_path, 12)
    rng = np.random.default_rng(1)
    poses = make_loop_trajectory(12)
    model = SyntheticDA3(poses, hw=HW, chunk_scales=rng.uniform(0.5, 2, 6),
                         textured=True)
    pred = model.inference(
        image=[str(p) for p in sorted(Path(image_dir).iterdir())]
    )
    out = tmp_path / "splats.ply"
    n = prediction_to_3dgs(pred, out, conf_threshold=1.2)
    assert n > 1000
    assert out.stat().st_size > 10_000
    with open(out, "rb") as f:
        header = f.read(2048).decode("latin1")
    for field in ("x", "opacity", "scale_0", "rot_0", "f_dc_0"):
        assert f"property float {field}" in header
