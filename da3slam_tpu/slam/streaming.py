"""Long-sequence disk-spilling streaming SLAM (reference da3_streaming.py:132-859).

Two-pass design mirroring the reference:

PASS 1 — per chunk: model inference (conf shifted by −1.0 like the
reference, da3_streaming.py:276), spill the prediction to
``_tmp_results_unaligned/chunk_<i>.npz``, and estimate the chunk-to-previous
Sim(3) from the world-coordinate overlap point maps with confidence-weighted
IRLS (threshold = 0.1 · min of the two conf medians, da3_streaming.py:334-343).

(optionally) LOOP CLOSURE — appearance retrieval over keyframes → joint
re-inference of loop chunk pairs → Sim(3) constraints → pose-graph LM
(the machinery the reference ships disabled, da3_streaming.py:589-624).

PASS 2 — accumulate Sim(3)s to the chunk-0 frame, re-load each chunk, apply
its accumulated transform, write aligned npz + confident point-cloud PLY
(threshold = mean·coef, sampled — da3_streaming.py:664-695), then export
``camera_poses.txt`` / ``intrinsic.txt`` / ``camera_poses.ply`` and the
merged cloud.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from da3slam_tpu.core.geometry import backproject_depth
from da3slam_tpu.core.transforms import Sim3, sim3_accumulate, sim3_apply, sim3_to_matrix
from da3slam_tpu.inout.images import load_image_paths
from da3slam_tpu.inout.ply import merge_ply_files, write_ply
from da3slam_tpu.inout.trajectory import save_camera_poses
from da3slam_tpu.ops.registration import irls_sim3
from da3slam_tpu.slam.chunks import make_chunk_indices
from da3slam_tpu.slam.loop import (
    LoopDetector,
    gate_loop_constraint,
    loop_sim3_from_joint_prediction,
)


class DA3Streaming:
    def __init__(self, image_dir: str, save_dir: str, config: dict, model=None):
        self.image_dir = image_dir
        self.output_dir = Path(save_dir)
        mcfg = config.get("Model", {})
        self.chunk_size = mcfg.get("chunk_size", 16)
        self.overlap = mcfg.get("overlap", mcfg.get("overlap_size", 4))
        self.overlap_s = self.overlap // 2
        self.overlap_e = self.overlap - self.overlap_s
        self.loop_enable = config.get("Loop", {}).get("enable", mcfg.get("loop_enable", False))
        # joint loop re-inference may use fewer frames per chunk to bound the
        # 2-chunk attention cost (reference Model.loop_chunk_size)
        self.loop_chunk_size = mcfg.get("loop_chunk_size", self.chunk_size)
        self.delete_temp_files = mcfg.get("delete_temp_files", True)
        self.resume = mcfg.get("resume", False)
        # per-frame NPZ export of image/depth/conf/intrinsics (reference
        # Model.save_depth_conf_result, da3_streaming.py:207-251)
        self.save_depth_conf_result = mcfg.get("save_depth_conf_result", False)
        # export the raw + accumulated Sim(3) chains for offline debugging
        # (reference Model.save_debug_info)
        self.save_debug_info = mcfg.get("save_debug_info", False)
        # interop trajectory exports beside camera_poses.txt: any of
        # "tum" / "kitti" (inout/trajectory.py) — validated HERE so a typo
        # fails at construction, not after the multi-hour run
        from da3slam_tpu.inout.trajectory import validate_extra_formats

        self.traj_formats = validate_extra_formats(
            mcfg.get("traj_formats", ()) or ()
        )
        # optional TSDF mesh export beside combined_pcd.ply (ops/tsdf.py +
        # inout/mesh.py; the reference has no volumetric output at all)
        self.export_mesh = mcfg.get("export_mesh", False)
        self.mesh_resolution = mcfg.get("mesh_resolution", 192)
        # block-sparse band-only fusion (ops/tsdf.integrate_frames_sparse,
        # ~9x the dense path at production grids); False restores the dense
        # every-voxel update (adds free-space carving in front of surfaces)
        self.mesh_sparse = mcfg.get("mesh_sparse", True)
        # free-space carving for the sparse path (ops/tsdf.py carve=True):
        # occupied blocks in front of observed depth take the clipped +1
        # observations, so spurious early surfaces contradicted by later
        # chunks get erased (the dense path always carves)
        self.mesh_carve = mcfg.get("mesh_carve", False)
        self._mesh_bounds: list = []
        # shared sparse-fusion block budget (set from the first chunk's
        # true counts; one budget → one XLA compile across all chunks)
        self._mesh_block_budget: int | None = None
        pcfg = config.get("Pointcloud_Save", mcfg.get("Pointcloud_Save", {})) or {}
        self.conf_threshold_coef = pcfg.get("conf_threshold_coef", 1.0)
        self.sample_ratio = pcfg.get("sample_ratio", 0.3)
        icfg = config.get("IRLS", {}) or {}
        self.irls_delta = icfg.get("delta", 0.1)
        self.irls_iters = icfg.get("max_iters", 5)
        # convergence early-exit (reference configs/config1.yaml:18 `tol`;
        # None keeps the fixed-count loop)
        self.irls_tol = icfg.get("tol")
        loop_cfg = config.get("Loop", {}) or {}
        lcfg = loop_cfg.get("SIM3_Optimizer", {}) or {}
        self.loop_max_iterations = lcfg.get("max_iterations", 30)
        self.loop_lambda_init = lcfg.get("lambda_init", 1e-6)
        self.loop_huber_delta = lcfg.get("huber_delta", 0.1)
        # loop edges weigh less than odometry and must pass the quality gate
        # (rmse / effective points / reciprocal consistency) before entering
        # the graph — one unguarded false loop corrupts the whole trajectory
        self.loop_edge_weight = loop_cfg.get("edge_weight", 0.5)
        gcfg = loop_cfg.get("Gate", {}) or {}
        self.loop_max_rmse = gcfg.get("max_rmse", 0.05)
        self.loop_min_n_effective = gcfg.get("min_n_effective", 200)
        self.loop_max_reciprocal_err = gcfg.get("max_reciprocal_err", 0.1)

        self.result_unaligned_dir = self.output_dir / "_tmp_results_unaligned"
        self.result_aligned_dir = self.output_dir / "_tmp_results_aligned"
        self.result_loop_dir = self.output_dir / "_tmp_results_loop"
        self.pcd_dir = self.output_dir / "pcd"
        for d in (self.result_unaligned_dir, self.result_aligned_dir,
                  self.result_loop_dir, self.pcd_dir):
            d.mkdir(parents=True, exist_ok=True)

        if model is None:
            from da3slam_tpu.models import DepthAnything3

            model = DepthAnything3.from_pretrained(
                config.get("Weights", {}).get("DA3", "small")
            )
        self.model = model
        self.process_res = mcfg.get("process_res", 504)
        self.ref_view_strategy = mcfg.get("ref_view_strategy", "first")
        self.ref_view_strategy_loop = mcfg.get("ref_view_strategy_loop", "middle")

        self.img_list: list[str] = []
        self.chunk_ranges: list[tuple[int, int]] = []
        self.sim3_list: list[Sim3] = []  # entry k: chunk k+1 coords → chunk k
        self.all_camera_poses: list[tuple[tuple[int, int], np.ndarray]] = []
        self.all_camera_intrinsics: list[np.ndarray] = []
        rcfg = config.get("Loop", {}).get("Retrieval", {}) or {}
        # NOTE on threshold scale: learned descriptors are batch-centered at
        # detection (loop.py), so cosines measure the frame-DISTINCTIVE
        # part, same footing as the mean-subtracted thumbnails.  Genuine
        # revisits under strong appearance change may want this lowered —
        # the geometric gate (rmse / n_effective / reciprocal consistency)
        # rejects false positives downstream, so recall is the scarcer side.
        self.loop_detector = LoopDetector(
            threshold=rcfg.get("threshold", 0.92),
            min_gap=rcfg.get("min_gap", 30),
            max_loops=rcfg.get("max_loops", 10),
        ) if self.loop_enable else None
        self.loop_edges: list[tuple[int, int, Sim3]] = []
        self.n_pose_filled = 0

    # -- pass 1 ------------------------------------------------------------
    def process_single_chunk(self, chunk_range: tuple[int, int], chunk_idx: int) -> dict:
        # resume support: the npz spill doubles as a checkpoint — re-runs skip
        # chunks already inferred (the reference's spill had no resume path,
        # SURVEY.md §5.4)
        spill = self.result_unaligned_dir / f"chunk_{chunk_idx}.npz"
        if self.resume and spill.exists():
            chunk = dict(np.load(spill))
            self.all_camera_poses.append((chunk_range, chunk["extrinsics"]))
            self.all_camera_intrinsics.append(chunk["intrinsics"])
            self._feed_loop_detector(chunk)
            return chunk
        paths = self.img_list[chunk_range[0] : chunk_range[1]]
        pred = self.model.inference(
            image=paths,
            process_res=self.process_res,
            ref_view_strategy=self.ref_view_strategy,
        )
        chunk = {
            "depth": np.squeeze(np.asarray(pred.depth)),
            "conf": np.asarray(pred.conf) - 1.0,  # shifted like the reference
            "extrinsics": np.asarray(pred.extrinsics),
            "intrinsics": np.asarray(pred.intrinsics),
            "images": np.asarray(pred.processed_images),
        }
        if getattr(pred, "frame_desc", None) is not None:
            chunk["frame_desc"] = np.asarray(pred.frame_desc, np.float32)
        np.savez(
            self.result_unaligned_dir / f"chunk_{chunk_idx}.npz", **chunk
        )
        if self.save_depth_conf_result:
            frame_dir = self.output_dir / "frames"
            frame_dir.mkdir(exist_ok=True)
            for i, idx in enumerate(range(chunk_range[0], chunk_range[1])):
                np.savez(
                    frame_dir / f"frame_{idx:06d}.npz",
                    image=chunk["images"][i], depth=chunk["depth"][i],
                    conf=chunk["conf"][i], intrinsics=chunk["intrinsics"][i],
                )
        self.all_camera_poses.append((chunk_range, chunk["extrinsics"]))
        self.all_camera_intrinsics.append(chunk["intrinsics"])
        self._feed_loop_detector(chunk)
        return chunk

    def _feed_loop_detector(self, chunk: dict) -> None:
        if self.loop_detector is None:
            return
        # prefer the model's learned retrieval descriptors (loop.py); fall
        # back to appearance thumbnails for models that don't provide them.
        # A detector that already holds thumbnails stays on thumbnails: a
        # resumed run whose early spills predate descriptor saving must not
        # switch kinds mid-sequence (the detector rejects mixing).
        descs = chunk.get("frame_desc")
        if self.loop_detector.kind == "thumbnail":
            descs = None
        elif self.loop_detector.kind == "learned" and descs is None:
            # reverse direction (learned spills replayed, then a chunk
            # without descriptors): enroll zero vectors — they match
            # nothing but keep frame indices aligned with the sequence
            dim = self.loop_detector.dim
            n_frames = len(chunk["images"][: self.chunk_size - self.overlap])
            descs = np.zeros((n_frames, dim), np.float32)
        n = self.chunk_size - self.overlap
        for i, img in enumerate(chunk["images"][:n]):
            self.loop_detector.add_frame(
                img, desc=None if descs is None else descs[i]
            )

    def load_chunk(self, chunk_idx: int, aligned: bool = False) -> dict:
        d = self.result_aligned_dir if aligned else self.result_unaligned_dir
        return dict(np.load(d / f"chunk_{chunk_idx}.npz"))

    def align_2pcds(self, prev: dict, cur: dict, overlap: int | None = None) -> Sim3:
        """Confidence-weighted Sim(3) from the world-coord overlap point maps
        (da3_streaming.py:322-364 semantics).  Returns cur→prev.

        ``overlap`` is the ACTUAL number of shared frames — the re-anchored
        tail chunk shares more than ``self.overlap`` with its predecessor,
        and pairing must stay pixelwise on the same physical frames."""
        o = self.overlap if overlap is None else overlap
        pts_prev = backproject_depth(
            jnp.asarray(prev["depth"][-o:]),
            jnp.asarray(prev["intrinsics"][-o:]),
            jnp.asarray(prev["extrinsics"][-o:]),
        ).reshape(-1, 3)
        pts_cur = backproject_depth(
            jnp.asarray(cur["depth"][:o]),
            jnp.asarray(cur["intrinsics"][:o]),
            jnp.asarray(cur["extrinsics"][:o]),
        ).reshape(-1, 3)
        c_prev = jnp.asarray(prev["conf"][-o:]).reshape(-1)
        c_cur = jnp.asarray(cur["conf"][:o]).reshape(-1)
        conf = jnp.sqrt(jnp.maximum(c_prev, 0) * jnp.maximum(c_cur, 0))
        threshold = 0.1 * jnp.minimum(jnp.median(c_prev), jnp.median(c_cur))
        conf = jnp.where((c_prev > threshold) & (c_cur > threshold), conf, 0.0)
        res = irls_sim3(
            pts_cur, pts_prev, conf=conf,
            delta=self.irls_delta, max_iters=self.irls_iters,
            tol=self.irls_tol,
        )
        print(f"  sim3: s={float(res.transform.s):.4f} rmse={float(res.rmse):.5f} "
              f"n_eff={int(res.n_effective)}")
        return res.transform

    # -- loop closure ------------------------------------------------------
    def _chunk_of_frame(self, frame_idx: int) -> int:
        step = self.chunk_size - self.overlap
        return min(frame_idx // step, len(self.chunk_ranges) - 1)

    def detect_and_close_loops(self) -> None:
        pairs = self.loop_detector.detect()
        seen: set[tuple[int, int]] = set()
        for p in pairs:
            a, b = self._chunk_of_frame(p.frame_a), self._chunk_of_frame(p.frame_b)
            if a == b or (a, b) in seen or abs(a - b) < 2:
                continue
            seen.add((a, b))
            chunk_a, chunk_b = self.load_chunk(a), self.load_chunk(b)
            ra, rb = self.chunk_ranges[a], self.chunk_ranges[b]
            lcs = self.loop_chunk_size
            if lcs < self.chunk_size:
                # bound the joint 2-chunk attention: keep the first lcs frames
                # of each chunk (and slice the stored chunks to match)
                ra = (ra[0], ra[0] + lcs)
                rb = (rb[0], rb[0] + lcs)
                chunk_a = {k_: v_[:lcs] for k_, v_ in chunk_a.items()}
                chunk_b = {k_: v_[:lcs] for k_, v_ in chunk_b.items()}
            joint_paths = self.img_list[ra[0] : ra[1]] + self.img_list[rb[0] : rb[1]]
            # loop pairs use their own reference-view strategy (the reference's
            # loop-specific ref_view_strategy, da3_streaming.py:263-273)
            joint = self.model.inference(
                image=joint_paths,
                process_res=self.process_res,
                ref_view_strategy=self.ref_view_strategy_loop,
            )
            joint.conf = joint.conf - 1.0
            lc = loop_sim3_from_joint_prediction(
                chunk_a, chunk_b, joint,
                irls_delta=self.irls_delta, irls_iters=max(self.irls_iters, 10),
                irls_tol=self.irls_tol,
            )
            if not gate_loop_constraint(
                lc,
                max_rmse=self.loop_max_rmse,
                min_n_effective=self.loop_min_n_effective,
                max_reciprocal_err=self.loop_max_reciprocal_err,
            ):
                print(
                    f"  loop edge REJECTED: chunk {b} → chunk {a} "
                    f"(sim {p.similarity:.3f}, rmse {lc.rmse:.4f}, "
                    f"n_eff {lc.n_effective}, recip {lc.reciprocal_err:.4f})"
                )
                continue
            self.loop_edges.append((a, b, lc.transform))
            print(
                f"  loop edge: chunk {b} → chunk {a} (sim {p.similarity:.3f}, "
                f"rmse {lc.rmse:.4f}, n_eff {lc.n_effective}, "
                f"recip {lc.reciprocal_err:.4f})"
            )

    def _optimize_pose_graph(self, accumulated: Sim3) -> Sim3:
        from da3slam_tpu.ops.posegraph import (
            add_loop_edges,
            optimize_sim3_pose_graph,
            sequential_edges,
        )

        edges = sequential_edges(self.sim3_list)
        edges = add_loop_edges(edges, self.loop_edges, weight=self.loop_edge_weight)
        return optimize_sim3_pose_graph(
            accumulated, edges,
            max_iterations=self.loop_max_iterations,
            lambda_init=self.loop_lambda_init,
            huber_delta=self.loop_huber_delta,
        )

    # -- pass 2 ------------------------------------------------------------
    def process_long_sequence(self) -> None:
        self.chunk_ranges = make_chunk_indices(
            len(self.img_list), self.chunk_size, self.overlap
        )
        print(f"{len(self.img_list)} frames → {len(self.chunk_ranges)} chunks")

        prev = None
        for k, rng in enumerate(self.chunk_ranges):
            print(f"[pass1] chunk {k + 1}/{len(self.chunk_ranges)}")
            cur = self.process_single_chunk(rng, k)
            if prev is not None:
                actual_overlap = self.chunk_ranges[k - 1][1] - rng[0]
                self.sim3_list.append(self.align_2pcds(prev, cur, actual_overlap))
            prev = cur

        if self.loop_enable and self.loop_detector is not None:
            print("[loop] detecting loop closures")
            self.detect_and_close_loops()

        stacked = (
            Sim3(
                jnp.stack([T.s for T in self.sim3_list]),
                jnp.stack([T.R for T in self.sim3_list]),
                jnp.stack([T.t for T in self.sim3_list]),
            )
            if self.sim3_list
            else Sim3(jnp.zeros((0,)), jnp.zeros((0, 3, 3)), jnp.zeros((0, 3)))
        )
        accumulated = sim3_accumulate(stacked)  # [K] chunk k → chunk 0

        if self.loop_edges:
            print(f"[loop] optimising pose graph with {len(self.loop_edges)} loop edges")
            accumulated = self._optimize_pose_graph(accumulated)
        self.accumulated = accumulated

        for k in range(len(self.chunk_ranges)):
            print(f"[pass2] aligning chunk {k + 1}/{len(self.chunk_ranges)}")
            chunk = self.load_chunk(k)
            T = Sim3(accumulated.s[k], accumulated.R[k], accumulated.t[k])
            pts = backproject_depth(
                jnp.asarray(chunk["depth"]),
                jnp.asarray(chunk["intrinsics"]),
                jnp.asarray(chunk["extrinsics"]),
            )
            pts_aligned = np.asarray(sim3_apply(T, pts.reshape(-1, 3))).reshape(pts.shape)
            np.savez(
                self.result_aligned_dir / f"chunk_{k}.npz",
                points=pts_aligned, conf=chunk["conf"], images=chunk["images"],
            )
            self._save_confident_pointcloud(k, pts_aligned, chunk)
            if self.export_mesh:
                # scene bounds for the TSDF mesh (~10k-point strided sample),
                # gated by the same confidence threshold as the exported
                # cloud — unfiltered low-conf outliers inflate the quantile
                # box and coarsen the effective voxel size
                conf_flat = np.asarray(chunk["conf"]).reshape(-1)
                confident = conf_flat > conf_flat.mean() * self.conf_threshold_coef
                if not confident.any():
                    # uniform-confidence chunks empty the strict gate (mean
                    # == every value) — fall back to the ungated cloud
                    confident = np.ones_like(confident)
                flat = pts_aligned.reshape(-1, 3)[confident]
                samp = flat[:: max(flat.shape[0] // 10000, 1)]
                ok = np.isfinite(samp).all(axis=1)
                if ok.any():
                    self._mesh_bounds.append((
                        np.quantile(samp[ok], 0.01, axis=0),
                        np.quantile(samp[ok], 0.99, axis=0),
                    ))

        self.save_camera_poses()
        if self.export_mesh:
            self.save_mesh()
        if self.save_debug_info:
            np.savez(
                self.output_dir / "sim3_debug.npz",
                relative_s=np.asarray([float(T.s) for T in self.sim3_list]),
                relative_R=np.stack([np.asarray(T.R) for T in self.sim3_list])
                if self.sim3_list else np.zeros((0, 3, 3)),
                relative_t=np.stack([np.asarray(T.t) for T in self.sim3_list])
                if self.sim3_list else np.zeros((0, 3)),
                accumulated_s=np.asarray(accumulated.s),
                accumulated_R=np.asarray(accumulated.R),
                accumulated_t=np.asarray(accumulated.t),
                n_loop_edges=len(self.loop_edges),
            )
        n = merge_ply_files(self.pcd_dir, self.output_dir / "combined_pcd.ply")
        print(f"merged cloud: {n} points → {self.output_dir / 'combined_pcd.ply'}")

    def _save_confident_pointcloud(self, k: int, pts: np.ndarray, chunk: dict) -> None:
        conf = chunk["conf"]
        threshold = conf.mean() * self.conf_threshold_coef
        keep = (conf > threshold).reshape(-1)
        pts_flat = pts.reshape(-1, 3)[keep]
        cols_flat = chunk["images"].reshape(-1, 3)[keep]
        if self.sample_ratio < 1.0 and len(pts_flat) > 0:
            n_keep = max(int(len(pts_flat) * self.sample_ratio), 1)
            idx = np.random.default_rng(k).choice(len(pts_flat), n_keep, replace=False)
            pts_flat, cols_flat = pts_flat[idx], cols_flat[idx]
        write_ply(self.pcd_dir / f"chunk_{k}.ply", pts_flat, cols_flat)

    # -- exports -----------------------------------------------------------
    def save_camera_poses(self) -> None:
        """Compose each chunk's accumulated Sim(3) with its c2w poses,
        normalising rotation by the scale (da3_streaming.py:714-817)."""
        n_frames = len(self.img_list)
        all_poses = [None] * n_frames
        all_intr = [None] * n_frames
        chunk_of_frame = np.zeros(n_frames, np.int32)

        for k, (rng, ext) in enumerate(self.all_camera_poses):
            S = np.asarray(
                sim3_to_matrix(Sim3(self.accumulated.s[k], self.accumulated.R[k],
                                    self.accumulated.t[k]))
            )
            s = float(self.accumulated.s[k])
            start = rng[0] + (self.overlap_s if k > 0 else 0)
            end = rng[1] - (self.overlap_e if k < len(self.all_camera_poses) - 1 else 0)
            for i, idx in enumerate(range(start, end)):
                local_i = i + (self.overlap_s if k > 0 else 0)
                w2c = np.eye(4)
                w2c[:3] = ext[local_i]
                c2w = np.linalg.inv(w2c)
                c2w = S @ c2w
                c2w[:3, :3] /= s  # normalise rotation (da3_streaming.py:772)
                all_poses[idx] = c2w
                all_intr[idx] = self.all_camera_intrinsics[k][local_i]
                chunk_of_frame[idx] = k

        # frames not covered (possible with the re-anchored tail) fall back to
        # their nearest covered neighbor — a wrong-but-plausible pose, so the
        # fill is loud: warned per run and counted in the export record
        last = np.eye(4)
        last_K = np.eye(3)
        filled = []
        for idx in range(n_frames):
            if all_poses[idx] is None:
                all_poses[idx] = last
                all_intr[idx] = last_K
                filled.append(idx)
            else:
                last, last_K = all_poses[idx], all_intr[idx]
        self.n_pose_filled = len(filled)
        if filled:
            import warnings

            shown = ", ".join(map(str, filled[:10])) + ("…" if len(filled) > 10 else "")
            warnings.warn(
                f"{len(filled)} frame(s) not covered by any chunk; their poses "
                f"were filled with the previous frame's pose (frames: {shown}). "
                "Trajectory metrics over these frames are not meaningful.",
                stacklevel=2,
            )
            (self.output_dir / "pose_filled_frames.txt").write_text(
                "\n".join(map(str, filled)) + "\n"
            )

        save_camera_poses(self.output_dir, np.stack(all_poses),
                          np.stack(all_intr), chunk_indices=chunk_of_frame,
                          extra_formats=self.traj_formats)

    def save_mesh(self) -> None:
        """TSDF-fuse every chunk (scaled depth + global w2c poses) and write
        ``scene_mesh.ply`` with per-vertex colors — the volumetric
        counterpart of ``combined_pcd.ply``.  Chunks integrate one at a time
        (bounded memory, like the rest of the streaming path)."""
        import jax.numpy as jnp

        from da3slam_tpu.inout.mesh import (
            tsdf_to_mesh,
            tsdf_vertex_normals,
            write_mesh_ply,
        )
        from da3slam_tpu.ops.tsdf import (
            grid_from_bounds,
            integrate_frames,
            integrate_frames_sparse,
            vertex_colors,
        )

        if not self._mesh_bounds:
            print("[mesh] no aligned chunks — skipping mesh export")
            return
        lo = np.min([b[0] for b in self._mesh_bounds], axis=0)
        hi = np.max([b[1] for b in self._mesh_bounds], axis=0)
        # pad past the truncation band (wall-facing cameras put the surface
        # exactly on the quantile box edge — see ops/tsdf.fuse_frames)
        pad = max(0.05, 4.0 * float(np.max(hi - lo, initial=1e-6))
                  / self.mesh_resolution)
        grid = grid_from_bounds(lo - pad, hi + pad, self.mesh_resolution,
                                with_color=True)

        from da3slam_tpu.core.transforms import sim3_transform_w2c

        for k, (rng, ext) in enumerate(self.all_camera_poses):
            chunk = self.load_chunk(k)
            T = Sim3(self.accumulated.s[k], self.accumulated.R[k],
                     self.accumulated.t[k])
            s = float(self.accumulated.s[k])
            # global w2c per frame: the same Sim(3) change of world frame as
            # save_camera_poses, via the shared core helper.
            # sim3_transform_w2c preserves ORIGINAL camera coords; the fused
            # depth below is scaled by s, so the whole 3x4 scales by s too
            # (algebraically identical to inv(S @ c2w with R/s-normalised)).
            E_glob = np.asarray(
                s * sim3_transform_w2c(jnp.asarray(ext, jnp.float32), T),
                np.float32,
            )
            fuse_args = (
                grid,
                jnp.asarray(chunk["depth"] * np.float32(s)),
                # spilled conf is already floor-shifted (conf - 1 >= 0)
                jnp.asarray(np.maximum(chunk["conf"], 0.0)),
                jnp.asarray(chunk["intrinsics"]),
                jnp.asarray(E_glob),
            )
            images = jnp.asarray(chunk["images"].astype(np.float32))
            if self.mesh_sparse:
                # Reuse one block budget across chunks: each distinct
                # auto-sized budget is its own XLA compile (~20-40 s) and
                # pays a per-frame counting pass; the first chunk
                # auto-sizes (with headroom), later chunks skip the count.
                # The impl returns TRUE counts, so an over-budget chunk is
                # detected exactly and re-fused from the pre-update grid
                # (fuse_args[0]) — observations are never silently dropped.
                grid, counts = integrate_frames_sparse(
                    *fuse_args, images=images,
                    active_blocks=self._mesh_block_budget,
                    carve=self.mesh_carve,
                )
                peak = int(counts.max()) if counts.size else 0
                if (self._mesh_block_budget is not None
                        and peak > self._mesh_block_budget):
                    print(f"[mesh] chunk {k + 1}: {peak} active blocks "
                          f"exceed budget {self._mesh_block_budget}; "
                          "re-fusing with auto-sized budget")
                    grid, counts = integrate_frames_sparse(
                        *fuse_args, images=images, active_blocks=None,
                        carve=self.mesh_carve,
                    )
                    peak = int(counts.max()) if counts.size else 0
                if self._mesh_block_budget is None or (
                        peak > self._mesh_block_budget):
                    # 25% headroom, rounded to the 128-multiple compile key
                    self._mesh_block_budget = -(-(peak * 5 // 4 + 1)
                                                // 128) * 128
            else:
                grid = integrate_frames(*fuse_args, images=images)
            print(f"[mesh] fused chunk {k + 1}/{len(self.all_camera_poses)}")

        verts, faces = tsdf_to_mesh(grid)
        if len(verts) == 0:
            print("[mesh] TSDF produced an empty mesh — nothing written")
            return
        cols = vertex_colors(grid, verts)
        out = self.output_dir / "scene_mesh.ply"
        write_mesh_ply(out, verts, faces, colors=cols,
                       normals=tsdf_vertex_normals(grid, verts))
        print(f"[mesh] {len(verts)} vertices, {len(faces)} faces → {out}")

    # -- public API --------------------------------------------------------
    def run(self) -> None:
        self.img_list = load_image_paths(self.image_dir)
        if not self.img_list:
            raise ValueError(f"[DIR EMPTY] No images found in {self.image_dir}!")
        print(f"Found {len(self.img_list)} images")
        self.process_long_sequence()

    def close(self) -> None:
        """Delete temp spill files, reporting reclaimed space
        (da3_streaming.py:819-859)."""
        if not self.delete_temp_files:
            return
        total = 0
        for d in (self.result_unaligned_dir, self.result_aligned_dir, self.result_loop_dir):
            for f in Path(d).iterdir():
                if f.is_file():
                    total += f.stat().st_size
            shutil.rmtree(d, ignore_errors=True)
        print(f"Saved disk space: {total / 1024**3:.4f} GiB")
