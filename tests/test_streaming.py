import numpy as np
import jax.numpy as jnp
import pytest

from da3slam_tpu.core.transforms import Sim3, sim3_apply, sim3_compose, sim3_inverse, so3_exp, so3_log
from da3slam_tpu.ops.posegraph import (
    PoseGraphEdges,
    add_loop_edges,
    optimize_sim3_pose_graph,
    sequential_edges,
)
from da3slam_tpu.slam.loop import LoopDetector, frame_descriptor
from da3slam_tpu.slam.streaming import DA3Streaming

from fake_model import FakeDA3, make_trajectory, make_fake_image_dir
from test_slam import ate_rmse, gt_c2w


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for scale in [1e-8, 1e-4, 0.1, 1.0]:  # |w| < pi: log is the inverse
            w = jnp.asarray(rng.normal(size=3) * scale, jnp.float32)
            w2 = so3_log(so3_exp(w))
            np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)

    def test_log_returns_principal_rotation_beyond_pi(self):
        w = jnp.asarray([-6.975, -0.656, -3.738], jnp.float32)  # |w| > pi
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(
            np.asarray(so3_exp(w2)), np.asarray(so3_exp(w)), atol=1e-5
        )
        assert float(jnp.linalg.norm(w2)) <= np.pi + 1e-5

    def test_exp_is_rotation(self):
        R = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def random_sim3(rng, s_spread=0.2, t_spread=0.5):
    w = rng.normal(size=3) * 0.3
    return Sim3(
        jnp.asarray(np.exp(rng.normal() * s_spread), jnp.float32),
        so3_exp(jnp.asarray(w, jnp.float32)),
        jnp.asarray(rng.normal(size=3) * t_spread, jnp.float32),
    )


def stack_sim3(Ts):
    return Sim3(
        jnp.stack([T.s for T in Ts]),
        jnp.stack([T.R for T in Ts]),
        jnp.stack([T.t for T in Ts]),
    )


def perturb(T, rng, eps):
    dw = jnp.asarray(rng.normal(size=3) * eps, jnp.float32)
    return Sim3(
        T.s * np.exp(rng.normal() * eps),
        so3_exp(dw) @ T.R,
        T.t + jnp.asarray(rng.normal(size=3) * eps, jnp.float32),
    )


class TestPoseGraph:
    def make_chain(self, K, rng):
        """GT absolute node transforms S_k (chunk k → world) and exact
        sequential measurements M_k = S_k^{-1} ∘ S_{k+1} (chunk k+1 → chunk k)."""
        nodes = [Sim3(jnp.asarray(1.0, jnp.float32), jnp.eye(3), jnp.zeros(3))]
        for _ in range(K - 1):
            nodes.append(sim3_compose(nodes[-1], random_sim3(rng)))
        meas = [
            sim3_compose(sim3_inverse(nodes[k]), nodes[k + 1]) for k in range(K - 1)
        ]
        return nodes, meas

    def test_exact_edges_zero_residual_preserved(self):
        rng = np.random.default_rng(1)
        nodes, meas = self.make_chain(5, rng)
        edges = sequential_edges(meas)
        out = optimize_sim3_pose_graph(stack_sim3(nodes), edges, max_iterations=5)
        for k in range(5):
            np.testing.assert_allclose(float(out.s[k]), float(nodes[k].s), rtol=1e-4)
            np.testing.assert_allclose(np.asarray(out.t[k]), np.asarray(nodes[k].t), atol=1e-3)

    def test_loop_edge_corrects_drift(self):
        """Noisy odometry + one exact loop edge: optimisation must pull the
        last node back toward ground truth."""
        rng = np.random.default_rng(2)
        K = 6
        nodes, meas = self.make_chain(K, rng)
        noisy_meas = [perturb(M, rng, 0.03) for M in meas]
        # drifted initialisation = integrate noisy odometry
        init = [nodes[0]]
        for M in noisy_meas:
            init.append(sim3_compose(init[-1], M))
        drift_before = float(jnp.linalg.norm(init[-1].t - nodes[-1].t))

        loop_meas = sim3_compose(sim3_inverse(nodes[0]), nodes[K - 1])  # exact
        edges = add_loop_edges(
            sequential_edges(noisy_meas), [(0, K - 1, loop_meas)], weight=3.0
        )
        out = optimize_sim3_pose_graph(stack_sim3(init), edges, max_iterations=30)
        drift_after = float(jnp.linalg.norm(out.t[-1] - nodes[-1].t))
        assert drift_after < drift_before * 0.3
        # anchor stays fixed
        np.testing.assert_allclose(float(out.s[0]), 1.0, atol=1e-6)

    def test_cg_solver_matches_dense(self):
        """The matrix-free LM-CG path must land on the same optimum as the
        dense normal equations (same scenario as the drift test)."""
        rng = np.random.default_rng(2)
        K = 6
        nodes, meas = self.make_chain(K, rng)
        noisy_meas = [perturb(M, rng, 0.03) for M in meas]
        init = [nodes[0]]
        for M in noisy_meas:
            init.append(sim3_compose(init[-1], M))
        loop_meas = sim3_compose(sim3_inverse(nodes[0]), nodes[K - 1])
        edges = add_loop_edges(
            sequential_edges(noisy_meas), [(0, K - 1, loop_meas)], weight=3.0
        )
        dense = optimize_sim3_pose_graph(
            stack_sim3(init), edges, max_iterations=30, solver="dense")
        cg = optimize_sim3_pose_graph(
            stack_sim3(init), edges, max_iterations=30, solver="cg")
        np.testing.assert_allclose(np.asarray(cg.t), np.asarray(dense.t), atol=2e-3)
        np.testing.assert_allclose(np.asarray(cg.s), np.asarray(dense.s), rtol=2e-3)

    @pytest.mark.slow  # heavy: see --durations trim, round 3
    def test_cg_scales_to_long_sequences(self):
        """A 150-node graph (auto → CG: >700 free params, where the dense
        [7K,7K] solve would be the bottleneck) converges: noisy odometry +
        three exact long-range loops, final drift well under initial."""
        rng = np.random.default_rng(5)
        K = 150
        nodes, meas = self.make_chain(K, rng)
        noisy_meas = [perturb(M, rng, 0.02) for M in meas]
        init = [nodes[0]]
        for M in noisy_meas:
            init.append(sim3_compose(init[-1], M))
        loops = []
        for a, b in [(0, K - 1), (10, K // 2), (K // 3, 2 * K // 3)]:
            loops.append((a, b, sim3_compose(sim3_inverse(nodes[a]), nodes[b])))
        edges = add_loop_edges(sequential_edges(noisy_meas), loops, weight=3.0)
        drift_before = float(jnp.linalg.norm(init[-1].t - nodes[-1].t))
        out = optimize_sim3_pose_graph(stack_sim3(init), edges, max_iterations=15)
        drift_after = float(jnp.linalg.norm(out.t[-1] - nodes[-1].t))
        assert drift_after < drift_before * 0.5, (drift_before, drift_after)


class TestAdversarialLoop:
    @pytest.mark.slow  # heavy: see --durations trim, round 3
    def test_false_loop_edge_bounded_by_huber(self):
        """One grossly wrong loop edge (visual alias: the measurement says
        'same place' when the chunks are far apart) must NOT corrupt the
        trajectory: with the robust kernel + reduced loop weight the nodes
        stay near their odometry solution."""
        rng = np.random.default_rng(7)
        K = 8
        pg = TestPoseGraph()
        nodes, meas = pg.make_chain(K, rng)
        noisy_meas = [perturb(M, rng, 0.01) for M in meas]
        init = [nodes[0]]
        for M in noisy_meas:
            init.append(sim3_compose(init[-1], M))
        # adversarial edge: claims chunk K-1 sits exactly at chunk 0
        false_meas = Sim3(jnp.asarray(1.0, jnp.float32), jnp.eye(3), jnp.zeros(3))
        edges = add_loop_edges(
            sequential_edges(noisy_meas), [(0, K - 1, false_meas)], weight=0.5
        )
        for solver in ("dense", "cg"):
            out = optimize_sim3_pose_graph(
                stack_sim3(init), edges, max_iterations=30, huber_delta=0.1,
                solver=solver,
            )
            # trajectory stays within odometry-noise bounds of ground truth
            err = max(
                float(jnp.linalg.norm(out.t[k] - nodes[k].t)) for k in range(K)
            )
            gt_extent = max(float(jnp.linalg.norm(nodes[k].t)) for k in range(K))
            assert err < 0.15 * max(gt_extent, 1.0), (
                f"[{solver}] false loop corrupted trajectory: max node error "
                f"{err:.3f} (extent {gt_extent:.3f})"
            )

    def test_false_loop_catastrophic_without_huber(self):
        """Sanity check that the scenario above is actually adversarial:
        plain least squares (no kernel) lets the false edge drag the last
        node far from truth."""
        rng = np.random.default_rng(7)
        K = 8
        pg = TestPoseGraph()
        nodes, meas = pg.make_chain(K, rng)
        noisy_meas = [perturb(M, rng, 0.01) for M in meas]
        init = [nodes[0]]
        for M in noisy_meas:
            init.append(sim3_compose(init[-1], M))
        false_meas = Sim3(jnp.asarray(1.0, jnp.float32), jnp.eye(3), jnp.zeros(3))
        edges = add_loop_edges(
            sequential_edges(noisy_meas), [(0, K - 1, false_meas)], weight=1.0
        )
        out = optimize_sim3_pose_graph(
            stack_sim3(init), edges, max_iterations=30, huber_delta=None
        )
        err_last = float(jnp.linalg.norm(out.t[K - 1] - nodes[K - 1].t))
        dist_claimed = float(jnp.linalg.norm(nodes[K - 1].t - nodes[0].t))
        # the unprotected solve moves the last node a large fraction of the
        # way toward the falsely-claimed location
        assert err_last > 0.2 * dist_claimed

    def test_gate_rejects_geometric_mismatch(self):
        """A loop pair whose chunks are different geometry must fail the
        quality gate even though the 'detector' fired."""
        from da3slam_tpu.slam.loop import (
            gate_loop_constraint,
            loop_sim3_from_joint_prediction,
        )

        rng = np.random.default_rng(11)
        H = W = 32
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
        eye = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
        Ks = np.tile(K, (2, 1, 1))

        def chunk(depth):
            return {
                "depth": depth,
                "conf": np.ones((2, H, W), np.float32),
                "extrinsics": eye,
                "intrinsics": Ks,
            }

        # chunk_a: smooth plane; chunk_b: unrelated rough terrain
        plane = np.full((2, H, W), 2.0, np.float32)
        rough = (2.0 + rng.uniform(-0.9, 0.9, size=(2, H, W))).astype(np.float32)

        class Joint:
            # the joint prediction sees chunk_a's geometry twice (the model,
            # confused by the visual alias, hallucinates a consistent scene)
            depth = np.concatenate([plane, plane])
            conf = np.ones((4, H, W), np.float32)
            extrinsics = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
            intrinsics = np.tile(K, (4, 1, 1))

        lc = loop_sim3_from_joint_prediction(chunk(plane), chunk(rough), Joint())
        assert not gate_loop_constraint(lc), (
            f"geometric mismatch passed the gate: rmse={lc.rmse:.4f} "
            f"recip={lc.reciprocal_err:.4f}"
        )

    def test_gate_accepts_consistent_geometry(self):
        from da3slam_tpu.slam.loop import (
            gate_loop_constraint,
            loop_sim3_from_joint_prediction,
        )

        rng = np.random.default_rng(13)
        H = W = 32
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
        terrain = (2.0 + rng.uniform(-0.5, 0.5, size=(2, H, W))).astype(np.float32)

        def chunk(depth):
            return {
                "depth": depth,
                "conf": np.ones((2, H, W), np.float32),
                "extrinsics": np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1)),
                "intrinsics": np.tile(K, (2, 1, 1)),
            }

        class Joint:
            depth = np.concatenate([terrain, terrain])
            conf = np.ones((4, H, W), np.float32)
            extrinsics = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
            intrinsics = np.tile(K, (4, 1, 1))

        lc = loop_sim3_from_joint_prediction(chunk(terrain), chunk(terrain), Joint())
        assert gate_loop_constraint(lc), (
            f"good loop rejected: rmse={lc.rmse:.4f} n_eff={lc.n_effective} "
            f"recip={lc.reciprocal_err:.4f}"
        )


class TestLoopDetector:
    def make_image(self, rng, seed_pattern):
        r = np.random.default_rng(seed_pattern)
        return r.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)

    def test_detects_revisit(self):
        rng = np.random.default_rng(3)
        det = LoopDetector(threshold=0.9, min_gap=10)
        # frames 0..19 distinct; frames 40..44 revisit frames 0..4
        for i in range(40):
            det.add_frame(self.make_image(rng, i))
        for i in range(5):
            img = self.make_image(rng, i)
            noisy = np.clip(img.astype(int) + rng.integers(-5, 5, img.shape), 0, 255)
            det.add_frame(noisy.astype(np.uint8))
        pairs = det.detect()
        assert pairs, "revisit not detected"
        assert all(p.frame_b - p.frame_a >= 10 for p in pairs)
        assert any(p.frame_a < 5 and p.frame_b >= 40 for p in pairs)

    def test_no_false_loops_on_distinct_frames(self):
        det = LoopDetector(threshold=0.9, min_gap=5)
        for i in range(30):
            det.add_frame(self.make_image(None, 1000 + i))
        assert det.detect() == []

    def test_descriptor_normalised(self):
        d = frame_descriptor(np.random.default_rng(0).integers(0, 255, (48, 64, 3)))
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-6)

    def test_learned_descriptors(self):
        """Learned encoder descriptors (Prediction.frame_desc) drive
        retrieval when supplied: a revisit in descriptor space is found even
        though no images are given at all."""
        rng = np.random.default_rng(0)
        base = rng.normal(size=(40, 32)).astype(np.float32)
        det = LoopDetector(threshold=0.9, min_gap=10)
        for i in range(40):
            det.add_frame(None, desc=base[i])
        for i in range(3):  # frames 40..42 revisit 0..2 with small noise
            det.add_frame(None, desc=base[i] + 0.01 * rng.normal(size=32))
        pairs = det.detect()
        assert any(p.frame_a < 3 and p.frame_b >= 40 for p in pairs)

    def test_mixed_descriptor_kinds_rejected(self):
        det = LoopDetector()
        det.add_frame(None, desc=np.ones(8, np.float32))
        with pytest.raises(ValueError, match="mixed descriptor kinds"):
            det.add_frame(self.make_image(None, 0))

    def test_resume_over_old_spills_downconverts(self):
        """Resuming over spills written before frame_desc existed enrolls
        thumbnails; later freshly-inferred chunks carrying descriptors must
        down-convert instead of raising mid-run."""
        from da3slam_tpu.slam.streaming import DA3Streaming

        s = DA3Streaming.__new__(DA3Streaming)  # just the helper under test
        s.loop_detector = LoopDetector(min_gap=1)
        s.chunk_size, s.overlap = 3, 1
        imgs = np.random.default_rng(0).integers(0, 255, (3, 16, 16, 3),
                                                 dtype=np.uint8)
        s._feed_loop_detector({"images": imgs})  # old spill: no frame_desc
        assert s.loop_detector.kind == "thumbnail"
        s._feed_loop_detector(
            {"images": imgs, "frame_desc": np.ones((3, 8), np.float32)}
        )  # new chunk: must not raise
        assert s.loop_detector.kind == "thumbnail"
        assert len(s.loop_detector._descs) == 4

    def test_learned_spills_then_descriptorless_chunk(self):
        """Reverse resume direction: learned descriptors enrolled first,
        then a chunk without frame_desc — zero placeholders keep indices
        aligned, never match anything, and never alias to each other."""
        from da3slam_tpu.slam.streaming import DA3Streaming

        s = DA3Streaming.__new__(DA3Streaming)
        s.loop_detector = LoopDetector(threshold=0.5, min_gap=2)
        s.chunk_size, s.overlap = 3, 1
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (3, 16, 16, 3), dtype=np.uint8)
        s._feed_loop_detector(
            {"images": imgs, "frame_desc": rng.normal(size=(3, 8)).astype(np.float32)}
        )
        for _ in range(4):  # several descriptor-less chunks, min_gap apart
            s._feed_loop_detector({"images": imgs})
        assert s.loop_detector.kind == "learned"
        assert len(s.loop_detector._descs) == 10
        # placeholder frames (identical zero vectors) must not pair up
        for p in s.loop_detector.detect():
            assert p.frame_a < 3 and p.frame_b < 3

    def test_common_component_centered_out(self):
        """Pooled encoder tokens on self-similar footage share a large
        common component that pushes every pairwise cosine toward 1; the
        learned path must batch-center so only a true revisit crosses the
        threshold."""
        rng = np.random.default_rng(0)
        common = rng.normal(size=64).astype(np.float32) * 10.0
        distinct = rng.normal(size=(45, 64)).astype(np.float32)
        distinct[40:43] = distinct[0:3] + 0.01 * rng.normal(size=(3, 64))
        descs = common[None] + distinct  # raw cosines all ≈ 1
        raw_cos = (descs[0] / np.linalg.norm(descs[0])) @ (
            descs[20] / np.linalg.norm(descs[20]))
        assert raw_cos > 0.97  # scenario is actually adversarial

        det = LoopDetector(threshold=0.9, min_gap=10)
        for d in descs:
            det.add_frame(None, desc=d)
        pairs = det.detect()
        assert pairs, "true revisit missed"
        for p in pairs:  # only the planted revisits survive centering
            assert p.frame_a < 3 and p.frame_b >= 40, (p.frame_a, p.frame_b)

    def test_blocked_retrieval_matches_dense(self):
        """Row-blocked device retrieval must find the same pairs as a
        single-panel pass."""
        rng = np.random.default_rng(1)
        descs = rng.normal(size=(50, 16)).astype(np.float32)
        descs[45] = descs[2] + 0.001 * rng.normal(size=16)
        d1 = LoopDetector(threshold=0.9, min_gap=10, block_rows=7)
        d2 = LoopDetector(threshold=0.9, min_gap=10, block_rows=4096)
        for d in descs:
            d1.add_frame(None, desc=d)
            d2.add_frame(None, desc=d)
        assert d1.detect() == d2.detect()


class TestStreamingEndToEnd:
    CONFIG = {
        "Model": {"chunk_size": 5, "overlap": 2, "process_res": 64,
                  "delete_temp_files": True},
        "Pointcloud_Save": {"conf_threshold_coef": 0.5, "sample_ratio": 0.5},
    }

    @pytest.mark.slow
    def test_long_sequence(self, tmp_path):
        n = 14
        poses = make_trajectory(n)
        model = FakeDA3(poses, chunk_scales=[1.0, 1.3, 0.8, 1.1, 0.95])
        image_dir = make_fake_image_dir(tmp_path, n)
        out = tmp_path / "out"
        s = DA3Streaming(image_dir, str(out), self.CONFIG, model=model)
        s.run()

        # exports exist in the reference formats
        assert (out / "combined_pcd.ply").exists()
        rows = (out / "camera_poses.txt").read_text().strip().split("\n")
        assert len(rows) == n and len(rows[0].split()) == 16
        assert len((out / "intrinsic.txt").read_text().strip().split("\n")) == n

        # trajectory accuracy: c2w centers vs ground truth
        from da3slam_tpu.inout.trajectory import load_camera_poses

        c2w = load_camera_poses(out / "camera_poses.txt")
        gt = gt_c2w(poses)
        assert ate_rmse(c2w, gt) < 0.05

        s.close()
        assert not (out / "_tmp_results_unaligned").exists()

    def test_reanchored_tail_aligns_correct_frames(self, tmp_path):
        """13 frames / chunk 5 / overlap 2 → the tail chunk (8,13) shares 3
        frames with its predecessor (6,11); pairing must use the actual
        overlap or the Sim3 registers non-corresponding pixels."""
        n = 13
        poses = make_trajectory(n)
        model = FakeDA3(poses, chunk_scales=[1.0, 1.2, 0.9, 1.1])
        image_dir = make_fake_image_dir(tmp_path, n)
        out = tmp_path / "out13"
        s = DA3Streaming(image_dir, str(out), self.CONFIG, model=model)
        s.run()
        from da3slam_tpu.inout.trajectory import load_camera_poses

        c2w = load_camera_poses(out / "camera_poses.txt")
        assert ate_rmse(c2w, gt_c2w(poses)) < 0.05
        s.close()

    def test_empty_dir_raises(self, tmp_path):
        d = tmp_path / "none"
        d.mkdir()
        s = DA3Streaming(str(d), str(tmp_path / "o"), self.CONFIG,
                         model=FakeDA3(make_trajectory(3)))
        with pytest.raises(ValueError, match="DIR EMPTY"):
            s.run()

    def test_save_depth_conf_result(self, tmp_path):
        n = 8
        cfg = {"Model": dict(self.CONFIG["Model"], save_depth_conf_result=True,
                             chunk_size=4, overlap=1)}
        poses = make_trajectory(n)
        s = DA3Streaming(make_fake_image_dir(tmp_path, n), str(tmp_path / "o"),
                         cfg, model=FakeDA3(poses))
        s.run()
        frames = sorted((tmp_path / "o" / "frames").glob("frame_*.npz"))
        assert len(frames) == n  # every frame exported once
        z = np.load(frames[0])
        assert set(z.keys()) == {"image", "depth", "conf", "intrinsics"}

    def test_save_debug_info(self, tmp_path):
        n = 8
        cfg = {"Model": dict(self.CONFIG["Model"], save_debug_info=True,
                             chunk_size=4, overlap=1)}
        poses = make_trajectory(n)
        s = DA3Streaming(make_fake_image_dir(tmp_path, n), str(tmp_path / "dbg"),
                         cfg, model=FakeDA3(poses, chunk_scales=[1.0, 1.2]))
        s.run()
        z = np.load(tmp_path / "dbg" / "sim3_debug.npz")
        n_chunks = len(s.chunk_ranges)
        assert z["relative_s"].shape == (n_chunks - 1,)
        assert z["accumulated_R"].shape == (n_chunks, 3, 3)
        assert int(z["n_loop_edges"]) == 0


class TestStreamingMeshExport:
    @pytest.mark.parametrize("mesh_sparse", [True, False])
    def test_mesh_lands_on_room_planes(self, tmp_path, mesh_sparse):
        """export_mesh: true → scene_mesh.ply beside combined_pcd.ply, with
        the fused surface on the synthetic room planes (chunk-0 scale) —
        for both the default block-sparse fusion and the dense path."""
        from da3slam_tpu.inout.mesh import read_mesh_ply
        from da3slam_tpu.utils.synthetic import PLANES

        n = 9
        poses = make_trajectory(n)
        scales = [1.4, 0.8, 1.1]
        model = FakeDA3(poses, chunk_scales=scales)
        config = {
            "Model": {"chunk_size": 4, "overlap": 2, "process_res": 64,
                      "export_mesh": True, "mesh_resolution": 64,
                      "mesh_sparse": mesh_sparse},
        }
        out = tmp_path / "out"
        s = DA3Streaming(make_fake_image_dir(tmp_path, n), str(out), config,
                         model=model)
        s.run()
        verts, faces, cols = read_mesh_ply(out / "scene_mesh.ply",
                                           with_colors=True)
        assert len(verts) > 200 and len(faces) > 200 and cols is not None
        s0 = scales[0]  # global frame = chunk 0's scale
        dists = np.min(
            np.stack([np.abs(verts @ np.asarray(nrm) - c * s0)
                      for nrm, c in PLANES]),
            axis=0,
        )
        assert np.quantile(dists, 0.9) < 0.2 * s0
        s.close()

    def test_sparse_budget_reuse_and_overflow_refuse(self, tmp_path):
        """The per-chunk sparse fusion shares one block budget (set from the
        first chunk's true counts); an artificially tiny pre-set budget must
        be detected as over-budget and the chunk re-fused exactly — the mesh
        still lands on the room planes, and the budget is raised."""
        from da3slam_tpu.inout.mesh import read_mesh_ply
        from da3slam_tpu.utils.synthetic import PLANES

        n = 9
        poses = make_trajectory(n)
        scales = [1.4, 0.8, 1.1]
        config = {
            "Model": {"chunk_size": 4, "overlap": 2, "process_res": 64,
                      "export_mesh": True, "mesh_resolution": 64,
                      "mesh_sparse": True},
        }
        out = tmp_path / "out"
        s = DA3Streaming(make_fake_image_dir(tmp_path, n), str(out), config,
                         model=FakeDA3(poses, chunk_scales=scales))
        # force the overflow path: far fewer blocks than any real chunk needs
        s._mesh_block_budget = 128
        s.run()
        assert s._mesh_block_budget > 128  # raised from true counts
        verts, _faces, _cols = read_mesh_ply(out / "scene_mesh.ply",
                                             with_colors=True)
        s0 = scales[0]
        dists = np.min(
            np.stack([np.abs(verts @ np.asarray(nrm) - c * s0)
                      for nrm, c in PLANES]),
            axis=0,
        )
        assert np.quantile(dists, 0.9) < 0.2 * s0
        s.close()
