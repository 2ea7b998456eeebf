import numpy as np
import jax.numpy as jnp
import pytest

from da3slam_tpu.slam import (
    SLAMSolver,
    make_chunk_indices,
    make_image_chunks,
    chain_extrinsics,
    align_chunk_single_overlap,
    AlignmentConfig,
)
from da3slam_tpu.core.transforms import se3_to_4x4, se3_inverse

from fake_model import FakeDA3, make_trajectory, make_fake_image_dir, render_depth


class TestChunking:
    def test_basic(self):
        idx = make_chunk_indices(10, 4, 1)
        assert idx[0] == (0, 4)
        assert all(b - a == 4 for a, b in idx)
        # consecutive chunks overlap by >= 1
        for (a1, b1), (a2, b2) in zip(idx, idx[1:]):
            assert a2 < b1
        assert idx[-1][1] == 10

    def test_tail_reanchored_keeps_full_size(self):
        idx = make_chunk_indices(11, 4, 1)
        assert idx[-1] == (7, 11)

    def test_short_sequence_single_chunk(self):
        assert make_chunk_indices(3, 5, 1) == [(0, 3)]

    def test_image_chunks_match_indices(self):
        items = list(range(12))
        chunks = make_image_chunks(items, 5, 2)
        assert chunks[0] == [0, 1, 2, 3, 4]
        assert chunks[1][0] == 3  # step = 5 - 2

    def test_invalid_overlap_raises(self):
        with pytest.raises(ValueError):
            make_chunk_indices(10, 3, 3)


class TestChainExtrinsics:
    def test_identity_anchor_reproduces_local(self):
        poses = make_trajectory(6)
        E_local = jnp.asarray(poses, jnp.float32)
        # anchor = local frame 0 → chain must reproduce the local chain
        out = chain_extrinsics(E_local, E_local[0])
        np.testing.assert_allclose(np.asarray(out), poses, atol=1e-5)

    def test_anchored_chain_preserves_relatives(self):
        rng = np.random.default_rng(0)
        poses = make_trajectory(5)
        E_local = jnp.asarray(poses, jnp.float32)
        anchor = jnp.asarray(make_trajectory(3, seed=7)[2], jnp.float32)
        out = np.asarray(chain_extrinsics(E_local, anchor))
        np.testing.assert_allclose(out[0], np.asarray(anchor), atol=1e-6)
        # relative transforms preserved: E_i ∘ E_{i-1}^-1 equal in both chains
        for i in range(1, 5):
            rel_local = np.asarray(se3_to_4x4(jnp.asarray(poses[i], jnp.float32)))[:3] @ np.linalg.inv(
                np.asarray(se3_to_4x4(jnp.asarray(poses[i - 1], jnp.float32)))
            )
            rel_global = np.asarray(se3_to_4x4(jnp.asarray(out[i])))[:3] @ np.linalg.inv(
                np.asarray(se3_to_4x4(jnp.asarray(out[i - 1])))
            )
            np.testing.assert_allclose(rel_global, rel_local, atol=1e-4)


def ate_rmse(c2w_est: np.ndarray, c2w_gt: np.ndarray) -> float:
    """Absolute trajectory error on camera centers (no alignment — the
    global frames coincide by construction)."""
    return float(np.sqrt(np.mean(np.sum((c2w_est[:, :3, 3] - c2w_gt[:, :3, 3]) ** 2, -1))))


def gt_c2w(poses_w2c: np.ndarray) -> np.ndarray:
    out = []
    for E in poses_w2c:
        M = np.eye(4)
        M[:3] = E
        out.append(np.linalg.inv(M))
    return np.stack(out)


class TestSLAMEndToEnd:
    CONFIG = {
        "Model": {"chunk_size": 5, "overlap_size": 1, "keyframe_interval": 1,
                  "sleep_between_chunk": 0, "port": 8080},
        "Align": {"icp_max_iterations": 25},
    }

    def run_solver(self, tmp_path, n_frames=13, chunk_scales=None, depth_noise=0.0):
        poses = make_trajectory(n_frames)
        model = FakeDA3(poses, chunk_scales=chunk_scales, depth_noise=depth_noise)
        image_dir = make_fake_image_dir(tmp_path, n_frames)
        solver = SLAMSolver(image_dir, self.CONFIG, model=model, viewer=None)
        solver.run()
        return solver, poses

    def test_trajectory_recovered_exact_scales(self, tmp_path):
        solver, poses = self.run_solver(tmp_path)
        c2w_est, intrs = solver.trajectory()
        gt = gt_c2w(poses)
        assert len(c2w_est) == len(gt)
        assert ate_rmse(c2w_est, gt) < 5e-3

    def test_trajectory_recovered_device_resident(self, tmp_path):
        """device_resident=True keeps dense maps on device and returns the
        per-chunk stats in one batched fetch — the trajectory must be
        identical to the host-fetch path."""
        poses = make_trajectory(13)
        model = FakeDA3(poses, chunk_scales=[1.0, 1.4, 0.7, 1.2, 0.9])
        image_dir = make_fake_image_dir(tmp_path, 13)
        cfg = {k: dict(v) for k, v in self.CONFIG.items()}
        cfg["Model"]["device_resident"] = True
        solver = SLAMSolver(image_dir, cfg, model=model, viewer=None)
        solver.run()
        c2w_dr, _ = solver.trajectory()
        model2 = FakeDA3(poses, chunk_scales=[1.0, 1.4, 0.7, 1.2, 0.9])
        solver2 = SLAMSolver(image_dir, self.CONFIG, model=model2, viewer=None)
        solver2.run()
        c2w_host, _ = solver2.trajectory()
        np.testing.assert_allclose(c2w_dr, c2w_host, atol=1e-6)
        assert ate_rmse(c2w_dr, gt_c2w(poses)) < 1e-2

    def test_trajectory_recovered_with_chunk_scale_ambiguity(self, tmp_path):
        """Per-chunk random metric scale must be absorbed by the stitcher
        (depth prescale, solver.py:125-126)."""
        solver, poses = self.run_solver(
            tmp_path, chunk_scales=[1.0, 1.4, 0.7, 1.2, 0.9]
        )
        c2w_est, _ = solver.trajectory()
        gt = gt_c2w(poses)
        assert ate_rmse(c2w_est, gt) < 1e-2

    def test_multi_frame_overlap(self, tmp_path):
        """overlap_size > 1: the shared frame is cur[overlap-1], not cur[0]
        — the aligner must anchor on the physically matching frame."""
        cfg = {
            "Model": {"chunk_size": 5, "overlap_size": 2, "keyframe_interval": 1,
                      "sleep_between_chunk": 0},
            "Align": {"icp_max_iterations": 25},
        }
        poses = make_trajectory(11)  # chunks [0-5),[3-8),[6-11): exact tiling
        model = FakeDA3(poses, chunk_scales=[1.0, 1.25, 0.85])
        image_dir = make_fake_image_dir(tmp_path, 11)
        solver = SLAMSolver(image_dir, cfg, model=model, viewer=None)
        solver.run()
        c2w_est, _ = solver.trajectory()
        gt = gt_c2w(poses)
        assert len(c2w_est) == len(gt)
        assert ate_rmse(c2w_est, gt) < 1e-2

    def test_robust_to_depth_noise(self, tmp_path):
        solver, poses = self.run_solver(
            tmp_path, chunk_scales=[1.0, 1.3, 0.8], depth_noise=0.01
        )
        c2w_est, _ = solver.trajectory()
        gt = gt_c2w(poses)
        assert ate_rmse(c2w_est, gt) < 0.05

    def test_tail_frames_flushed(self, tmp_path):
        """n_frames not divisible by the step: the trailing frames that never
        fill a chunk must still be processed (re-anchored tail window; the
        reference drops them, solver.py:186-190)."""
        # chunk 5, overlap 1 → step 4: chunks end at 5, 9, 13; 2 tail frames
        solver, poses = self.run_solver(tmp_path, n_frames=15)
        c2w_est, intrs = solver.trajectory()
        gt = gt_c2w(poses)
        assert len(c2w_est) == 15
        assert len(intrs) == 15
        assert ate_rmse(c2w_est, gt) < 5e-3

    def test_tail_flush_with_chunk_scale(self, tmp_path):
        """Tail window must absorb a fresh per-chunk scale like any chunk."""
        solver, poses = self.run_solver(
            tmp_path, n_frames=15, chunk_scales=[1.0, 1.4, 0.7, 1.2]
        )
        c2w_est, _ = solver.trajectory()
        assert len(c2w_est) == 15
        assert ate_rmse(c2w_est, gt_c2w(poses)) < 1e-2

    def test_short_sequence_below_chunk_size(self, tmp_path):
        """Fewer frames than one chunk: everything runs as a single chunk."""
        solver, poses = self.run_solver(tmp_path, n_frames=3)
        c2w_est, _ = solver.trajectory()
        assert len(c2w_est) == 3
        assert ate_rmse(c2w_est, gt_c2w(poses)) < 5e-3

    def test_empty_dir_is_noop(self, tmp_path):
        d = tmp_path / "empty"
        d.mkdir()
        model = FakeDA3(make_trajectory(3))
        solver = SLAMSolver(str(d), self.CONFIG, model=model, viewer=None)
        solver.run()
        assert solver.results == []

    def test_keyframe_interval(self, tmp_path):
        poses = make_trajectory(20)
        model = FakeDA3(poses)
        image_dir = make_fake_image_dir(tmp_path, 20)
        cfg = {"Model": dict(self.CONFIG["Model"], keyframe_interval=2)}
        solver = SLAMSolver(image_dir, cfg, model=model, viewer=None)
        solver.run()
        # 10 keyframes → chunks of 5 with overlap 1
        used = [p for res in solver.results for p in res["image_paths"]]
        assert all(int(p.split("/")[-1].split(".")[0]) % 2 == 0 for p in used)


class TestAlignmentMethods:
    @pytest.mark.parametrize("method", ["icp", "irls", "umeyama"])
    def test_methods_run_and_anchor(self, method):
        """All dispatch methods produce a valid anchored chain on an exact
        overlap (same frame seen twice)."""
        poses = make_trajectory(6)
        model = FakeDA3(poses)
        pred_a = model.inference([f"{i:06d}.jpg" for i in range(0, 3)])
        pred_b = model.inference([f"{i:06d}.jpg" for i in range(2, 5)])
        out = align_chunk_single_overlap(
            prev_depth=jnp.asarray(pred_a.depth[-1]),
            prev_conf=jnp.asarray(pred_a.conf[-1]),
            prev_K=jnp.asarray(pred_a.intrinsics[-1]),
            cur_depth=jnp.asarray(pred_b.depth),
            cur_conf=jnp.asarray(pred_b.conf),
            cur_K=jnp.asarray(pred_b.intrinsics),
            cur_extrinsics=jnp.asarray(pred_b.extrinsics),
            prev_overlap_global=jnp.asarray(pred_a.extrinsics[-1]),
            config=AlignmentConfig(method=method),
        )
        # chunk A's frame is the global anchor; frame 2 appears in both chunks,
        # so cur frame 0's global pose must equal prev frame 2's pose
        np.testing.assert_allclose(
            np.asarray(out.extrinsics_global[0]), pred_a.extrinsics[-1], atol=2e-3
        )


class TestSim3Mode:
    def test_full_sim3_alignment_recovers_trajectory(self, tmp_path):
        """Align.with_scale=true: registration solves the full Sim(3) (the
        unification of the reference's two scale mechanisms, SURVEY §7.3.4);
        must coexist with the depth prescale and still recover the GT."""
        cfg = {
            "Model": {"chunk_size": 5, "overlap_size": 1, "keyframe_interval": 1,
                      "sleep_between_chunk": 0},
            "Align": {"with_scale": True, "icp_max_iterations": 20},
        }
        poses = make_trajectory(13)
        model = FakeDA3(poses, chunk_scales=[1.0, 1.35, 0.75])
        solver = SLAMSolver(make_fake_image_dir(tmp_path, 13), cfg,
                            model=model, viewer=None)
        solver.run()
        c2w_est, _ = solver.trajectory()
        assert ate_rmse(c2w_est, gt_c2w(poses)[: len(c2w_est)]) < 1e-2


class TestChunkedAlignmentHelper:
    def test_tail_anchor_pairing(self, tmp_path):
        """run_chunked_alignment (the shared loop of main_align/main_3dgs/
        main_mesh) must anchor the re-anchored tail chunk on the frame that
        IS the previous chunk's last frame — anchor 0 registers depth maps
        of different physical frames and mis-places the whole tail."""
        from da3slam_tpu.slam.chunks import run_chunked_alignment

        n = 9  # chunk 4, overlap 1 → ranges (0,4),(3,7),(5,9): tail anchor 1
        poses = make_trajectory(n)
        # chunk-0 scale 1.0: the global frame inherits it, and ate_rmse
        # compares unscaled (the later chunks' ambiguity still exercises
        # the scale estimation through the anchor pairing)
        model = FakeDA3(poses, chunk_scales=[1.0, 0.8, 1.1])
        image_dir = make_fake_image_dir(tmp_path, n)
        from da3slam_tpu.inout import load_image_paths

        paths = load_image_paths(image_dir)
        out = run_chunked_alignment(model, paths, chunk_size=4, overlap=1,
                                    process_res=64, verbose=False)
        assert out["ranges"][-1] == (5, 9)
        # reconstruct the per-frame trajectory from the concatenated chunks
        # (later chunks overwrite overlaps) and compare against ground truth
        E = out["extrinsics_global"]
        c2w_full = np.zeros((n, 4, 4))
        pos = 0
        for (a, b) in out["ranges"]:
            for j, idx in enumerate(range(a, b)):
                M = np.eye(4)
                M[:3] = E[pos + j]
                c2w_full[idx] = np.linalg.inv(M)
            pos += b - a
        assert ate_rmse(c2w_full, gt_c2w(poses)) < 0.05

    def test_dedup_overlap_yields_each_frame_once(self, tmp_path):
        """dedup_overlap=True drops each non-initial chunk's leading overlap
        frames (incl. the widened tail overlap), so the concatenated stack
        has exactly one entry per physical frame, in order — what TSDF
        fusion wants (duplicates double-weight chunk seams)."""
        from da3slam_tpu.slam.chunks import run_chunked_alignment

        n = 9  # ranges (0,4),(3,7),(5,9): dups at frames 3 and 5,6
        poses = make_trajectory(n)
        model = FakeDA3(poses, chunk_scales=[1.0, 0.8, 1.1])
        image_dir = make_fake_image_dir(tmp_path, n)
        from da3slam_tpu.inout import load_image_paths

        paths = load_image_paths(image_dir)
        full = run_chunked_alignment(model, paths, chunk_size=4, overlap=1,
                                     process_res=64, verbose=False)
        # fresh model: FakeDA3 consumes chunk_scales per inference call
        model2 = FakeDA3(poses, chunk_scales=[1.0, 0.8, 1.1])
        dedup = run_chunked_alignment(model2, paths, chunk_size=4, overlap=1,
                                      process_res=64, verbose=False,
                                      dedup_overlap=True)
        assert dedup["depth"].shape[0] == n
        assert full["depth"].shape[0] == 4 + 4 + 4  # overlaps duplicated
        # the kept frames are the FIRST occurrence of each physical frame
        first_idx = []
        seen = set()
        pos = 0
        for (a, b) in full["ranges"]:
            for idx in range(a, b):
                if idx not in seen:
                    seen.add(idx)
                    first_idx.append(pos)
                pos += 1
        np.testing.assert_allclose(
            dedup["extrinsics_global"], full["extrinsics_global"][first_idx]
        )
        np.testing.assert_allclose(dedup["depth"], full["depth"][first_idx])
