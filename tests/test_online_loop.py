"""Online loop closure in the LIVE solver (slam/online_loop.py).

The streaming (offline, two-pass) closure is covered by
test_loop_integration.py; here the same detect → gate → joint-re-inference →
pose-graph machinery must work *inside* SLAMSolver's chunk loop: the
trajectory re-anchors while the sequence is still streaming, and the carry
re-anchors with it so later chunks chain from the corrected poses.  This is
capability the reference never had — its loop machinery was offline-only and
shipped disabled (utils/da3_streaming.py:589-624).
"""

from __future__ import annotations

import numpy as np
import pytest

from da3slam_tpu.slam import SLAMSolver
from da3slam_tpu.slam.evaluate import evaluate_trajectory
from da3slam_tpu.slam.online_loop import OnlineLoopCloser
from da3slam_tpu.utils.synthetic import (
    SyntheticDA3,
    make_loop_trajectory,
    make_synthetic_image_dir,
)

N_FRAMES = 48
HW = (48, 64)


def _make_model():
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
            "overlap_size": 1,
            "keyframe_interval": 1,
            "sleep_between_chunk": 0,
        },
        "Loop": {
            "enable": loop_enable,
            "stride": 2,  # 48x64 frames: keep enough points for the gate
            "Retrieval": {"threshold": 0.9, "min_gap": 25, "max_loops": 5},
            "Gate": {"max_rmse": 0.08, "min_n_effective": 200,
                     "max_reciprocal_err": 0.15},
            "SIM3_Optimizer": {"max_iterations": 30, "lambda_init": 1e-6},
        },
    }


class TestSolverGating:
    def test_off_by_default(self, tmp_path):
        image_dir = make_synthetic_image_dir(tmp_path, 4)
        _, model = _make_model()
        s = SLAMSolver(image_dir, {"Model": {"chunk_size": 4}}, model=model,
                       viewer=None)
        assert s.loop_closer is None

    def test_enabled_by_config(self, tmp_path):
        image_dir = make_synthetic_image_dir(tmp_path, 4)
        _, model = _make_model()
        s = SLAMSolver(image_dir, _config(True), model=model, viewer=None)
        assert isinstance(s.loop_closer, OnlineLoopCloser)


class TestReanchorMath:
    def test_known_drift_corrected_exactly(self):
        """Deterministic check of the node/edge/update algebra: three chunks
        whose stored local poses are exact, the last chunk's GLOBAL poses
        corrupted by a known rigid drift; one exact loop edge must restore
        them (pose graph with a strong loop constraint on clean geometry)."""
        from da3slam_tpu.core.transforms import se3_compose, se3_inverse
        import jax.numpy as jnp

        rng = np.random.default_rng(0)

        def rand_se3(scale=0.3):
            w = rng.normal(size=3) * scale
            from da3slam_tpu.core.transforms import so3_exp

            R = np.asarray(so3_exp(jnp.asarray(w)))
            t = rng.normal(size=3) * scale
            return np.concatenate([R, t[:, None]], -1).astype(np.float32)

        # ground-truth global w2c poses of 3 chunks x 2 frames
        E_gt = np.stack([rand_se3() for _ in range(6)]).reshape(3, 2, 3, 4)
        # chunk-local poses: E_local = E_global ∘ N_k (pick arbitrary N_k)
        nodes_gt = [np.eye(4, dtype=np.float32)[:3]] + [rand_se3() for _ in range(2)]
        E_local = np.stack([
            np.asarray(se3_compose(jnp.asarray(E_gt[k]),
                                   jnp.asarray(nodes_gt[k])[None]))
            for k in range(3)
        ])

        closer = OnlineLoopCloser(model=None, config={
            "SIM3_Optimizer": {"max_iterations": 60, "lambda_init": 1e-8},
            "edge_weight": 4.0,  # trusted (exact) loop edge for this oracle
        })
        for k in range(3):
            closer.chunks.append({
                "image_paths": [f"{k}_0", f"{k}_1"],
                "depth": np.ones((2, 4, 4), np.float32),
                "conf": np.ones((2, 4, 4), np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
                "extrinsics": E_local[k],
            })

        # corrupt chunk 2's global poses with a rigid drift D (w2c ∘ D)
        drift = rand_se3(scale=0.2)
        E_cur = [E_gt[0].copy(), E_gt[1].copy(),
                 np.asarray(se3_compose(jnp.asarray(E_gt[2]),
                                        jnp.asarray(drift)[None]))]

        # exact loop edge chunk 2 → chunk 0: N_0^{-1} ∘ N_2 in ground truth
        from da3slam_tpu.core.transforms import Sim3

        m = np.asarray(se3_compose(se3_inverse(jnp.asarray(nodes_gt[0])),
                                   jnp.asarray(nodes_gt[2])))
        closer.loop_edges.append(
            (0, 2, Sim3(jnp.asarray(1.0), jnp.asarray(m[:, :3]),
                        jnp.asarray(m[:, 3])))
        )
        updated = closer._optimize([np.asarray(e) for e in E_cur])
        # chunks 0/1 were consistent and must stay put; chunk 2 must land
        # back on ground truth (drift absorbed by the loop edge)
        np.testing.assert_allclose(updated[0], E_gt[0], atol=1e-3)
        np.testing.assert_allclose(updated[2], E_gt[2], atol=0.05)
        err_before = np.abs(np.asarray(E_cur[2]) - E_gt[2]).max()
        err_after = np.abs(updated[2] - E_gt[2]).max()
        assert err_after < 0.25 * err_before


@pytest.mark.slow
def test_online_loop_closure_improves_ate(tmp_path):
    """The headline e2e: the LIVE solver runs a revisiting trajectory with
    per-chunk scale drift twice — closure off and on — and the on-run must
    accept a gated loop edge mid-stream and end with lower ATE."""
    image_dir = make_synthetic_image_dir(tmp_path, N_FRAMES)
    poses_gt_w2c, _ = _make_model()
    gt_c2w = np.stack(
        [np.linalg.inv(np.vstack([E, [0, 0, 0, 1]])) for E in poses_gt_w2c]
    )

    results = {}
    for name, enable in (("off", False), ("on", True)):
        _, model = _make_model()  # fresh: call_count drives chunk scales
        s = SLAMSolver(image_dir, _config(enable), model=model, viewer=None)
        s.run()
        c2w, _ = s.trajectory()
        assert c2w.shape == (N_FRAMES, 4, 4)
        results[name] = (s, evaluate_trajectory(c2w, gt_c2w, align="sim3"))

    s_on, res_on = results["on"]
    s_off, res_off = results["off"]
    assert s_off.loop_closer is None
    assert len(s_on.loop_closer.loop_edges) >= 1, "gate accepted no loop edge"
    a, b, _ = s_on.loop_closer.loop_edges[0]
    assert b - a >= 2  # a genuine loop, not an adjacent-chunk rediscovery
    assert res_on.ate_rmse < res_off.ate_rmse, (
        f"online closure made ATE worse: {res_on.ate_rmse:.5f} vs "
        f"{res_off.ate_rmse:.5f}"
    )


def test_retrieval_tolerates_gamma_drift():
    """brightness_drift (utils/synthetic.py) gamma-warps late frames, so a
    revisit's thumbnail is NOT bit-identical to the first visit — retrieval
    must still clear the threshold on the true pair (0, N-1) while ranking a
    mid-sequence different pose below it.  This is the appearance
    perturbation the loop_ate_improvement bench runs with."""
    from da3slam_tpu.slam.loop import frame_descriptor

    n = 64
    poses = make_loop_trajectory(n)
    base = SyntheticDA3(poses, hw=HW, textured=True)
    drift = SyntheticDA3(poses, hw=HW, textured=True, brightness_drift=0.35)
    names = [f"{i:06d}.jpg" for i in (0, n - 1, n // 2)]
    p = drift.inference(names)
    p0 = base.inference(names)
    # the drift really changed the revisit's pixels (gamma at i=N-1 is
    # 1.35) and left frame 0 untouched (gamma(0) = 1)
    assert np.array_equal(p.processed_images[0], p0.processed_images[0])
    assert not np.array_equal(p.processed_images[1], p0.processed_images[1])
    d0 = frame_descriptor(p.processed_images[0])
    d_rev = frame_descriptor(p.processed_images[1])
    d_mid = frame_descriptor(p.processed_images[2])
    assert float(d0 @ d_rev) > 0.9, "gamma drift broke revisit retrieval"
    assert float(d0 @ d_mid) < float(d0 @ d_rev)
