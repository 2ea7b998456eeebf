import pytest
import numpy as np
import jax
import jax.numpy as jnp

from da3slam_tpu.models import DepthAnything3
from da3slam_tpu.slam.pipeline import make_windows, run_streaming_slam
from da3slam_tpu.slam.solver import SLAMSolver


class TestWindows:
    def test_exact_tiling(self):
        idx, anchors = make_windows(10, 4, 1)
        assert idx.shape == (3, 4)
        np.testing.assert_array_equal(idx[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(idx[1], [3, 4, 5, 6])
        np.testing.assert_array_equal(idx[2], [6, 7, 8, 9])
        np.testing.assert_array_equal(anchors, [0, 0, 0])  # overlap 1 → idx 0

    def test_reanchored_tail_anchor(self):
        """The tail window overlaps its predecessor by more than `overlap`;
        the anchor must point at the previous window's last frame."""
        idx, anchors = make_windows(11, 4, 1)
        # ranges (0,4),(3,7),(6,10),(7,11): tail's predecessor ends at frame
        # 9, which sits at index 2 of the tail window [7,8,9,10]
        np.testing.assert_array_equal(idx[-1], [7, 8, 9, 10])
        np.testing.assert_array_equal(anchors, [0, 0, 0, 2])
        idx2, anchors2 = make_windows(12, 5, 2)
        # ranges (0,5),(3,8),(6,11),(7,12): steady-state anchor = overlap-1
        # = 1; tail anchor = prev last (10) at index 3
        np.testing.assert_array_equal(anchors2, [0, 1, 1, 3])

    def test_wide_tail_overlap(self):
        idx, anchors = make_windows(13, 5, 2)
        # ranges (0,5),(3,8),(6,11),(8,13): tail shares frames 8..10 with
        # its predecessor; anchor = prev last (10) at tail index 2
        assert (idx[-1] == [8, 9, 10, 11, 12]).all()
        assert anchors[-1] == 2


class TestScanPipeline:
    def make_frames(self, n=10, h=56, w=70, seed=0):
        rng = np.random.default_rng(seed)
        base = rng.integers(40, 200, size=(h, w, 3))
        frames = []
        for i in range(n):
            f = np.roll(base, shift=i * 2, axis=1) + rng.integers(0, 20, size=(h, w, 3))
            frames.append(np.clip(f, 0, 255))
        return np.stack(frames).astype(np.uint8)

    def test_shapes_and_anchoring(self):
        model = DepthAnything3.from_pretrained("tiny")
        frames = self.make_frames()
        out = run_streaming_slam(
            model.params, frames, model.cfg, chunk_size=4, overlap=1,
            process_hw=(56, 70), dtype=jnp.float32,
        )
        C, N = 3, 4
        assert out.depth.shape == (C, N, 56, 70)
        assert out.extrinsics_global.shape == (C, N, 3, 4)
        assert np.isfinite(np.asarray(out.depth)).all()
        assert np.isfinite(np.asarray(out.extrinsics_global)).all()
        # first window anchors the global frame: frame 0 = identity
        np.testing.assert_allclose(
            np.asarray(out.extrinsics_global[0, 0]), np.eye(4)[:3], atol=1e-5
        )
        # first window needs no scale correction
        assert float(out.depth_scale[0]) == 1.0

    def test_pipeline_matches_host_solver(self, tmp_path):
        """The scan pipeline and the host-loop SLAMSolver must produce the
        same trajectory for the same model/frames/config (the pipeline is an
        execution-strategy change, not a math change)."""
        from PIL import Image

        model = DepthAnything3.from_pretrained("tiny")
        frames = self.make_frames(n=10, h=56, w=70)

        d = tmp_path / "frames"
        d.mkdir()
        for i, f in enumerate(frames):
            Image.fromarray(f).save(d / f"{i:06d}.png")  # lossless

        # closed-form alignment (umeyama) keeps the comparison
        # well-conditioned: iterative ICP on the random-init model's
        # unstructured depth is chaotic and amplifies f32 fusion-order
        # differences between the two execution strategies
        config = {
            "Model": {"chunk_size": 4, "overlap_size": 1, "keyframe_interval": 1,
                      "sleep_between_chunk": 0},
            "Align": {"method": "umeyama"},
        }
        # process_res=70 → upper_bound_shape(56,70) = (56,70): no resampling
        solver = SLAMSolver(str(d), config, model=model, viewer=None)
        orig_inference = model.inference
        model.inference = lambda **kw: orig_inference(**{**kw, "process_res": 70})
        solver.run()
        model.inference = orig_inference

        from da3slam_tpu.slam.alignment import AlignmentConfig

        out = run_streaming_slam(
            model.params, frames, model.cfg, chunk_size=4, overlap=1,
            process_hw=(56, 70), dtype=jnp.float32,
            align_config=AlignmentConfig(method="umeyama"),
        )

        for k, res in enumerate(solver.results):
            np.testing.assert_allclose(
                np.asarray(out.extrinsics_global[k]),
                res["extrinsics_global"],
                atol=1e-4,
            )

    def test_deterministic(self):
        model = DepthAnything3.from_pretrained("tiny")
        frames = self.make_frames()
        o1 = run_streaming_slam(model.params, frames, model.cfg, chunk_size=4,
                                overlap=1, process_hw=(56, 70), dtype=jnp.float32)
        o2 = run_streaming_slam(model.params, frames, model.cfg, chunk_size=4,
                                overlap=1, process_hw=(56, 70), dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(o1.depth), np.asarray(o2.depth))


class TestSegmentedPipeline:
    @pytest.mark.slow
    def test_segmented_matches_single_scan(self):
        """Segmenting the scan (bounded-HBM mode for unbounded sequences)
        must be a pure execution-strategy change: outputs identical."""
        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))
        frames = np.stack([
            np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
            for i in range(16)
        ]).astype(np.uint8)

        kw = dict(chunk_size=4, overlap=1, process_hw=(56, 70), dtype=jnp.float32)
        full = run_streaming_slam(model.params, frames, model.cfg, **kw)
        seg = run_streaming_slam(model.params, frames, model.cfg,
                                 segment_windows=2, **kw)
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(seg.depth),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(full.extrinsics_global), np.asarray(seg.extrinsics_global),
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(full.depth_scale),
                                   np.asarray(seg.depth_scale), rtol=1e-5)

        # device spill (outputs stay as jax arrays, frames sliced on-device)
        # is a pure transport change: bitwise-identical to host spill
        dev = run_streaming_slam(model.params, jnp.asarray(frames), model.cfg,
                                 segment_windows=2, segment_spill="device", **kw)
        assert isinstance(dev.depth, jax.Array)
        np.testing.assert_array_equal(np.asarray(seg.depth), np.asarray(dev.depth))
        np.testing.assert_array_equal(np.asarray(seg.extrinsics_global),
                                      np.asarray(dev.extrinsics_global))


class TestCompactSpill:
    def test_f16_spill_matches_f32(self):
        """spill_dtype=f16 halves the emitted depth/conf bytes; values must
        match the f32 path to f16 rounding and poses must be untouched
        (the alignment carry stays f32 regardless of the spill dtype)."""
        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))
        frames = np.stack([
            np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
            for i in range(10)
        ]).astype(np.uint8)
        kw = dict(chunk_size=4, overlap=1, process_hw=(56, 70), dtype=jnp.float32)

        full = run_streaming_slam(model.params, frames, model.cfg, **kw)
        f16 = run_streaming_slam(model.params, frames, model.cfg,
                                 spill_dtype=jnp.float16, **kw)
        assert np.asarray(f16.depth).dtype == np.float16
        assert np.asarray(f16.conf).dtype == np.float16
        # f16: 10-bit mantissa → rel error ≤ 2^-11
        d32 = np.asarray(full.depth)
        np.testing.assert_allclose(np.asarray(f16.depth).astype(np.float32),
                                   d32, rtol=1e-3, atol=1e-3 * np.abs(d32).max())
        # poses, intrinsics, scales: bit-identical (cast is emit-only)
        np.testing.assert_array_equal(np.asarray(full.extrinsics_global),
                                      np.asarray(f16.extrinsics_global))
        np.testing.assert_array_equal(np.asarray(full.depth_scale),
                                      np.asarray(f16.depth_scale))

        # segmented host-spill composes with the compact dtype
        seg = run_streaming_slam(model.params, frames, model.cfg,
                                 segment_windows=2, spill_dtype=jnp.float16, **kw)
        assert np.asarray(seg.depth).dtype == np.float16
        np.testing.assert_array_equal(np.asarray(seg.extrinsics_global),
                                      np.asarray(f16.extrinsics_global))

    @pytest.mark.slow
    def test_f16_spill_dp_path(self):
        """The dp-sharded pipeline honors spill_dtype too (cast happens
        after run_pipeline_dp, before the spill)."""
        from da3slam_tpu.parallel import make_mesh
        from da3slam_tpu.slam.alignment import AlignmentConfig

        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))
        frames = np.stack([
            np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
            for i in range(10)
        ]).astype(np.uint8)
        kw = dict(chunk_size=4, overlap=1, process_hw=(56, 70), dtype=jnp.float32,
                  align_config=AlignmentConfig(method="umeyama"))
        mesh = make_mesh(8, tp=1)
        full = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh, **kw)
        f16 = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh,
                                 spill_dtype=jnp.float16, **kw)
        assert np.asarray(f16.depth).dtype == np.float16
        d32 = np.asarray(full.depth)
        np.testing.assert_allclose(np.asarray(f16.depth).astype(np.float32),
                                   d32, rtol=1e-3, atol=1e-3 * np.abs(d32).max())
        np.testing.assert_array_equal(np.asarray(full.extrinsics_global),
                                      np.asarray(f16.extrinsics_global))


class TestDPPipeline:
    @pytest.mark.slow
    def test_dp_sharded_matches_fused_scan(self):
        """Multi-chip mode (window forwards sharded over dp, sequential
        alignment over the outputs) must reproduce the fused scan."""
        from da3slam_tpu.parallel import make_mesh

        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))
        frames = np.stack([
            np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
            for i in range(16)
        ]).astype(np.uint8)
        from da3slam_tpu.slam.alignment import AlignmentConfig

        # closed-form alignment keeps the comparison well-conditioned:
        # iterative ICP on the random-init model's unstructured depth is
        # chaotic and amplifies f32 partitioning-order differences
        kw = dict(chunk_size=4, overlap=1, process_hw=(56, 70), dtype=jnp.float32,
                  align_config=AlignmentConfig(method="umeyama"))

        full = run_streaming_slam(model.params, frames, model.cfg, **kw)
        mesh = make_mesh(8, tp=1)  # 5 windows over dp=8: GSPMD pads
        dp = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh, **kw)
        # partitioned execution reorders reductions: ~1e-5-level f32 drift
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(dp.depth),
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(full.extrinsics_global), np.asarray(dp.extrinsics_global),
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(full.depth_scale),
                                   np.asarray(dp.depth_scale), rtol=1e-5)

        # segmented + dp composes
        seg = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh,
                                 segment_windows=2, **kw)
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(seg.depth),
                                   atol=1e-4)


class TestPPPipeline:
    @pytest.mark.slow
    def test_pp_pipelined_matches_fused_scan(self):
        """Pipeline-parallel mode (encoder stages over pp, windows as GPipe
        microbatches, heads + alignment after the ring — the giant-tier
        realtime configuration) must reproduce the fused scan."""
        from jax.sharding import Mesh

        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))
        frames = np.stack([
            np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
            for i in range(16)
        ]).astype(np.uint8)
        from da3slam_tpu.slam.alignment import AlignmentConfig

        kw = dict(chunk_size=4, overlap=1, process_hw=(56, 70), dtype=jnp.float32,
                  attn_impl="xla",
                  align_config=AlignmentConfig(method="umeyama"))

        full = run_streaming_slam(model.params, frames, model.cfg, **kw)
        mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("pp",))
        pp = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh,
                                parallel="pp", **kw)
        # ppermute/ring execution reorders f32 reductions: drift is value-
        # proportional, so pair the atol with an rtol
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(pp.depth),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(full.extrinsics_global), np.asarray(pp.extrinsics_global),
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(full.depth_scale),
                                   np.asarray(pp.depth_scale), rtol=1e-5)

        # segmented + pp composes (the long-sequence giant configuration):
        # carry threads across segments, stage split happens once
        seg = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh,
                                 parallel="pp", segment_windows=2, **kw)
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(seg.depth),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(full.extrinsics_global),
            np.asarray(seg.extrinsics_global), atol=1e-4,
        )

    def test_parallel_kwarg_validated(self):
        model = DepthAnything3.from_pretrained("tiny")
        frames = np.zeros((8, 28, 28, 3), np.uint8)
        with pytest.raises(ValueError, match="parallel"):
            run_streaming_slam(model.params, frames, model.cfg, chunk_size=4,
                               overlap=1, parallel="tp")


class TestSPPipeline:
    @pytest.mark.slow
    def test_sp_sharded_matches_fused_scan(self):
        """Sequence-parallel mode (each window's view axis sharded, ring
        cross-view attention — the latency-optimal live-SLAM configuration)
        must reproduce the fused scan."""
        from jax.sharding import Mesh

        model = DepthAnything3.from_pretrained("tiny")
        rng = np.random.default_rng(0)
        base = rng.integers(40, 200, size=(56, 70, 3))
        frames = np.stack([
            np.clip(np.roll(base, i * 2, axis=1) + rng.integers(0, 20, (56, 70, 3)), 0, 255)
            for i in range(16)
        ]).astype(np.uint8)
        from da3slam_tpu.slam.alignment import AlignmentConfig

        kw = dict(chunk_size=4, overlap=1, process_hw=(56, 70), dtype=jnp.float32,
                  attn_impl="xla",
                  align_config=AlignmentConfig(method="umeyama"))

        full = run_streaming_slam(model.params, frames, model.cfg, **kw)
        mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("sp",))
        sp = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh,
                                parallel="sp", **kw)
        # ring attention reorders the softmax accumulation: f32 drift only
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(sp.depth),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(full.extrinsics_global), np.asarray(sp.extrinsics_global),
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(full.depth_scale),
                                   np.asarray(sp.depth_scale), rtol=1e-5)

        # segmented + sp composes
        seg = run_streaming_slam(model.params, frames, model.cfg, mesh=mesh,
                                 parallel="sp", segment_windows=2, **kw)
        np.testing.assert_allclose(np.asarray(full.depth), np.asarray(seg.depth),
                                   atol=1e-4, rtol=1e-4)
