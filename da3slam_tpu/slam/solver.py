"""SLAMSolver — the in-memory streaming SLAM orchestrator.

Mirrors the reference ``SLAMSolver`` (solver.py:21-247): a frame-path deque
feeds fixed-size chunks into the model; each chunk is aligned to the global
frame through the single-overlap path (scale + ICP + pose chaining); the
viewer receives every aligned frame.  Differences by design:

- per-chunk alignment math runs as one jitted device program
  (slam/alignment.py) instead of Open3D + NumPy loops
- predictions are kept only as long as needed (the reference accumulates
  every chunk in memory, solver.py:35,204 — unbounded)
- no ``sleep_between_chunk`` pause unless configured (the reference sleeps
  10 s per chunk for observation, solver.py:226)
"""

from __future__ import annotations

import functools
import time
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from da3slam_tpu.inout.images import extract_keyframes, load_image_paths
from da3slam_tpu.slam.alignment import AlignmentConfig, align_chunk_single_overlap


@functools.lru_cache(maxsize=None)
def _aligner_for(config: AlignmentConfig):
    """Process-wide jitted aligner keyed by the (frozen, hashable) config.

    Without this every SLAMSolver instance re-jits its own
    ``functools.partial`` wrapper — a fresh ~10 s trace+compile per solver
    even when an identically-configured one already ran in this process
    (bench reruns, multi-sequence batch jobs).
    """
    return jax.jit(functools.partial(align_chunk_single_overlap, config=config))


class SLAMSolver:
    def __init__(self, image_dir: str, config: dict, model: Any = None, viewer: Any = "auto"):
        self.config = config
        model_cfg = config.get("Model", {})
        self.chunk_size = model_cfg.get("chunk_size", 15)
        self.overlap_size = model_cfg.get("overlap_size", 1)
        self.keyframe_interval = model_cfg.get("keyframe_interval", 1)
        self.sleep_between_chunk = model_cfg.get("sleep_between_chunk", 0)
        self.prefetch = model_cfg.get("prefetch", None)
        # device-resident mode: dense prediction maps (depth/conf/images)
        # stay on the TPU; alignment consumes them there and the host only
        # fetches per-frame slices the viewer/export actually needs.  This
        # removes the ~44 MB/chunk device→host round-trip the reference's
        # loop pays by materialising every output on CPU (solver.py:163).
        self.device_resident = model_cfg.get("device_resident", False)
        self._prefetcher = None
        # (tag, depth_scale, fitness, rmse) device scalars awaiting the
        # single end-of-run fetch (device-resident mode, no loop closer)
        self._deferred_stats: List[tuple] = []
        self.image_dir = image_dir

        self.chunk_count = 0
        self.frame_buffer: deque = deque(maxlen=self.chunk_size * 2)
        self.results: List[Dict] = []  # per-chunk outputs incl. extrinsics_global
        self.prev_chunk_prediction: Optional[Dict] = None
        self.prev_overlap_aligned_3x4: Optional[np.ndarray] = None

        # config keys override the AlignmentConfig defaults; unknown keys are
        # rejected by the dataclass constructor
        align_cfg = dict(config.get("Align", {}) or {})
        self.align_config = AlignmentConfig(**align_cfg)
        # anchor_idx stays a traced argument so the re-anchored tail window
        # (whose anchor sits deeper into the chunk) reuses this compilation
        self._align_jit = _aligner_for(self.align_config)

        self.model = model if model is not None else self._load_model()
        if self.prefetch is None:
            # only the real model is known to accept pre-decoded arrays;
            # custom models (e.g. path-keyed test doubles) keep paths
            from da3slam_tpu.models import DepthAnything3, DepthAnything3Nested

            self.prefetch = isinstance(
                self.model, (DepthAnything3, DepthAnything3Nested)
            )
        self.viewer = self._init_viewer() if viewer == "auto" else viewer

        # optional ONLINE loop closure (off by default — the capability the
        # reference shipped disabled and offline-only,
        # utils/da3_streaming.py:589-624; see slam/online_loop.py)
        self.loop_closer = None
        loop_cfg = config.get("Loop", {}) or {}
        if loop_cfg.get("enable", False):
            from da3slam_tpu.slam.online_loop import OnlineLoopCloser

            self.loop_closer = OnlineLoopCloser(
                self.model, loop_cfg,
                inference_kwargs={"process_res_method": "upper_bound_resize"},
            )

        from da3slam_tpu.utils import StageTimer

        self.timer = StageTimer(sync=False)  # results are numpy already

    # -- setup -------------------------------------------------------------
    def _load_model(self):
        from da3slam_tpu.models import DepthAnything3

        model_path = self.config.get("Weights", {}).get("DA3", "small")
        print(f"Loading DA3 model from {model_path}...")
        return DepthAnything3.from_pretrained(model_path)

    def _init_viewer(self):
        port = self.config.get("Model", {}).get("port", 8080)
        try:
            from da3slam_tpu.viz.viewer import SLAMViewer

            viewer = SLAMViewer(port=port)
            print(f"Viewer initialized on port {port}")
            return viewer
        except ImportError as e:
            # headless degradation, same as reference solver.py:73-78
            print(f"Viewer unavailable ({e}); running headless")
            return None

    # -- chunk plumbing ----------------------------------------------------
    def should_run_chunk_prediction(self) -> bool:
        return len(self.frame_buffer) >= self.chunk_size

    def load_chunk_image_paths(self) -> List[str]:
        return list(self.frame_buffer)[: self.chunk_size]

    def update_buffer_after_chunk_processed(self) -> None:
        if len(self.frame_buffer) > self.overlap_size:
            for _ in range(self.chunk_size - self.overlap_size):
                if self.frame_buffer:
                    self.frame_buffer.popleft()

    def run_single_chunk_prediction(self, chunk_image_paths: List[str]) -> Dict:
        if self._prefetcher is not None:
            # decoded ahead by the background thread (host/device overlap)
            image = self._prefetcher.get_batch(chunk_image_paths)
        else:
            image = chunk_image_paths
        kwargs = {"keep_on_device": True} if self.device_resident else {}
        pred = self.model.inference(
            image=image,
            process_res_method="upper_bound_resize",
            **kwargs,
        )
        if self._prefetcher is not None:
            # this chunk's forward is now queued on the device — start the
            # NEXT chunk's image upload so the transfer rides under it
            self._prefetcher.stage_next()
        # in device-resident mode the dense maps stay as device arrays
        # (lazy host fetch via np.asarray only where pixels are consumed)
        dense = (lambda a: a) if self.device_resident else np.asarray
        out = {
            "chunk_idx": self.chunk_count,
            "image_paths": chunk_image_paths,
            "processed_images": dense(pred.processed_images),
            "depth": dense(pred.depth),
            "conf": dense(pred.conf),
            "extrinsics": dense(pred.extrinsics),
            "intrinsics": dense(pred.intrinsics),
        }
        fd = getattr(pred, "frame_desc", None)
        if fd is not None:
            out["frame_desc"] = dense(fd)
        return out

    # -- alignment ---------------------------------------------------------
    def process_chunk_alignment(self, prev: Dict, cur: Dict, anchor_idx: int | None = None):
        """Scale + register + chain: one jitted device call.

        ``anchor_idx`` is the index within ``cur`` of the frame shared with
        the previous chunk's last frame: ``overlap_size - 1`` in the steady
        state, ``chunk_size - 1 - n_new`` for the re-anchored tail window.
        """
        if anchor_idx is None:
            anchor_idx = self.overlap_size - 1
        out = self._align_jit(
            anchor_idx=np.int32(anchor_idx),
            prev_depth=prev["depth"][-1],
            prev_conf=prev["conf"][-1],
            prev_K=prev["intrinsics"][-1],
            cur_depth=cur["depth"],
            cur_conf=cur["conf"],
            cur_K=cur["intrinsics"],
            cur_extrinsics=cur["extrinsics"],
            prev_overlap_global=self.prev_overlap_aligned_3x4,
        )
        if self.device_resident:
            # the scaled depth and the carry (previous overlap frame's
            # global pose) never leave the device, and — when nothing on the
            # host needs them this chunk (no loop closer) — neither do the
            # stats or global poses: everything stays an asynchronously
            # dispatched device value, so the steady-state loop never blocks
            # on the device at all (each per-chunk sync is a ~100+ ms round
            # through the dev tunnel; 4-6 of them dominated the align stage).
            # Deferred values are fetched in ONE batch at the end of run().
            cur["depth"] = out.depth_scaled
            self.prev_overlap_aligned_3x4 = out.prev_overlap_for_next
            cur["extrinsics_global"] = out.extrinsics_global
            if self.loop_closer is None:
                return (out.depth_scale, out.transform.R, out.transform.t,
                        out.fitness, out.inlier_rmse)
            # loop closure consumes host poses/scales every chunk: one
            # batched fetch (still a single sync, not six)
            eg, s, R, t, fitness, rmse = jax.device_get(
                (out.extrinsics_global, out.depth_scale, out.transform.R,
                 out.transform.t, out.fitness, out.inlier_rmse)
            )
            cur["extrinsics_global"] = np.asarray(eg)
            return float(s), np.asarray(R), np.asarray(t), float(fitness), float(rmse)
        cur["depth"] = np.asarray(out.depth_scaled)
        cur["extrinsics_global"] = np.asarray(out.extrinsics_global)
        self.prev_overlap_aligned_3x4 = np.asarray(out.prev_overlap_for_next)
        return (
            float(out.depth_scale),
            np.asarray(out.transform.R),
            np.asarray(out.transform.t),
            float(out.fitness),
            float(out.inlier_rmse),
        )

    # -- online loop closure -------------------------------------------------
    def _loop_stage(self, cur: Dict, new_start: int, depth_scale: float) -> None:
        """Enroll the chunk, detect/gate loops, and on a new gated edge
        re-anchor the whole trajectory-so-far from the optimised pose graph
        (slam/online_loop.py).  The carry (previous overlap frame's global
        pose) is re-anchored too, so every FUTURE chunk chains from the
        corrected trajectory — already-sent viewer frames keep their
        pre-closure poses until the next refresh."""
        self.loop_closer.add_chunk(
            cur, new_start, frame_desc=cur.get("frame_desc"),
            depth_scale=depth_scale,
        )
        updated = self.loop_closer.maybe_close(
            [r["extrinsics_global"] for r in self.results]
        )
        if updated is None:
            return
        for r, E in zip(self.results, updated):
            r["extrinsics_global"] = E
        cur["extrinsics_global"] = updated[-1]
        self.prev_overlap_aligned_3x4 = np.asarray(updated[-1][-1], np.float32)
        print(f"  [loop] trajectory re-anchored over {len(updated)} chunks")

    # -- viewer ------------------------------------------------------------
    def update_viewer(self, chunk_prediction: Dict, start: int = 0) -> None:
        if self.viewer is None:
            return
        ext_global = chunk_prediction.get("extrinsics_global")
        if ext_global is None:
            print("warn: no extrinsics_global; falling back to local extrinsics")
            ext_global = chunk_prediction["extrinsics"]
        n = len(chunk_prediction["image_paths"])
        # one host fetch per chunk (device-resident arrays materialise here;
        # already-numpy inputs pass through at zero cost)
        imgs = np.asarray(chunk_prediction["processed_images"])
        depth = np.asarray(chunk_prediction["depth"])
        conf = np.asarray(chunk_prediction["conf"])
        intr = np.asarray(chunk_prediction["intrinsics"])
        for i in range(start, n):
            self.viewer.add_frame(
                image=imgs[i],
                depth=depth[i],
                conf=conf[i],
                extrinsic=ext_global[i],
                intrinsic=intr[i],
            )

    # -- main loop ---------------------------------------------------------
    def process_frame(self, image_path: str) -> None:
        self.frame_buffer.append(image_path)
        if not self.should_run_chunk_prediction():
            return

        chunk_paths = self.load_chunk_image_paths()
        with self.timer("inference"):
            cur = self.run_single_chunk_prediction(chunk_paths)

        depth_scale = 1.0
        if self.chunk_count == 0:
            # first chunk defines the global frame (solver.py:206-211)
            cur["extrinsics_global"] = np.asarray(cur["extrinsics"]).astype(np.float64)
            self.prev_overlap_aligned_3x4 = cur["extrinsics_global"][-1].astype(np.float32)
        else:
            with self.timer("align"):
                s, R, t, fitness, rmse = self.process_chunk_alignment(
                    self.prev_chunk_prediction, cur
                )
            if isinstance(s, float):
                depth_scale = s
                print(
                    f"  chunk {self.chunk_count}: depth_scale={s:.4f} "
                    f"fitness={fitness:.4f} inlier_rmse={rmse:.5f}"
                )
            else:
                # device scalars: formatting them would force a sync round;
                # report at end of run in one batched fetch.  depth_scale is
                # only consumed by the loop stage, which forces the float path.
                self._deferred_stats.append(
                    (f"chunk {self.chunk_count}", s, fitness, rmse)
                )

        self.results.append(
            {
                "chunk_idx": cur["chunk_idx"],
                "image_paths": cur["image_paths"],
                "extrinsics_global": cur["extrinsics_global"],
                "intrinsics": cur["intrinsics"],
                # leading frames duplicated from the previous chunk, for
                # trajectory()/viewer dedup
                "dedup_skip": 0 if self.chunk_count == 0 else self.overlap_size,
            }
        )
        if self.loop_closer is not None:
            with self.timer("loop"):
                self._loop_stage(cur, self.results[-1]["dedup_skip"], depth_scale)
        with self.timer("viewer"):
            self.update_viewer(cur, start=self.results[-1]["dedup_skip"])
        self.prev_chunk_prediction = cur
        self.update_buffer_after_chunk_processed()
        self.chunk_count += 1
        if self.sleep_between_chunk:
            time.sleep(self.sleep_between_chunk)

    def _flush_tail(self, image_paths: List[str]) -> None:
        """Process trailing keyframes that never filled a chunk.

        The reference silently drops up to ``chunk_size - 1`` tail frames
        (its loop only fires at ``chunk_size`` buffered paths,
        solver.py:186-190, and never flushes); here the tail is processed as
        a re-anchored full-size final window — the same semantics
        ``make_chunk_indices`` (slam/chunks.py) gives the scan pipeline —
        so every keyframe gets a global pose.
        """
        step = self.chunk_size - self.overlap_size
        processed = (
            0 if self.chunk_count == 0
            else self.chunk_size + (self.chunk_count - 1) * step
        )
        n_new = len(image_paths) - processed
        if n_new <= 0:
            return

        depth_scale = 1.0
        if self.chunk_count == 0:
            # fewer frames than one chunk: run them all as chunk 0
            chunk_paths = list(image_paths)
            with self.timer("inference"):
                cur = self.run_single_chunk_prediction(chunk_paths)
            cur["extrinsics_global"] = np.asarray(cur["extrinsics"]).astype(np.float64)
            self.prev_overlap_aligned_3x4 = cur["extrinsics_global"][-1].astype(
                np.float32
            )
            dedup_skip = 0
        else:
            # re-anchored window: the last chunk_size frames, so shapes match
            # the steady-state compilation; the previous chunk's last frame
            # sits at index chunk_size - 1 - n_new
            chunk_paths = list(image_paths[-self.chunk_size:])
            with self.timer("inference"):
                cur = self.run_single_chunk_prediction(chunk_paths)
            anchor_idx = self.chunk_size - 1 - n_new
            with self.timer("align"):
                s, _R, _t, fitness, rmse = self.process_chunk_alignment(
                    self.prev_chunk_prediction, cur, anchor_idx=anchor_idx
                )
            if isinstance(s, float):
                depth_scale = s
                print(
                    f"  tail chunk ({n_new} new frames): depth_scale={s:.4f} "
                    f"fitness={fitness:.4f} inlier_rmse={rmse:.5f}"
                )
            else:
                self._deferred_stats.append(
                    (f"tail chunk ({n_new} new frames)", s, fitness, rmse)
                )
            dedup_skip = self.chunk_size - n_new

        self.results.append(
            {
                "chunk_idx": self.chunk_count,
                "image_paths": chunk_paths,
                "extrinsics_global": cur["extrinsics_global"],
                "intrinsics": cur["intrinsics"],
                "dedup_skip": dedup_skip,
            }
        )
        if self.loop_closer is not None:
            with self.timer("loop"):
                self._loop_stage(cur, dedup_skip, depth_scale)
        with self.timer("viewer"):
            self.update_viewer(cur, start=dedup_skip)
        self.prev_chunk_prediction = cur
        self.frame_buffer.clear()
        self.chunk_count += 1

    def _materialize(self) -> None:
        """End-of-run host materialisation for device-resident mode.

        One batched ``device_get`` brings back every deferred per-chunk
        stat and every chunk's global poses + intrinsics — a single device
        sync for the whole sequence instead of 4-6 per chunk.
        """
        if self._deferred_stats:
            vals = jax.device_get([(s, f, r) for _, s, f, r in self._deferred_stats])
            for (tag, *_), (s, f, r) in zip(self._deferred_stats, vals):
                print(
                    f"  {tag}: depth_scale={float(s):.4f} "
                    f"fitness={float(f):.4f} inlier_rmse={float(r):.5f}"
                )
            self._deferred_stats.clear()
        if self.device_resident and self.results:
            fetched = jax.device_get(
                [(r["extrinsics_global"], r["intrinsics"]) for r in self.results]
            )
            for r, (eg, K) in zip(self.results, fetched):
                r["extrinsics_global"] = np.asarray(eg)
                r["intrinsics"] = np.asarray(K)

    def run(self) -> None:
        image_paths = load_image_paths(self.image_dir)
        if not image_paths:
            print(f"Warning: No images found in {self.image_dir}")
            return
        image_paths = extract_keyframes(image_paths, self.keyframe_interval)
        print(f"Running SLAM over {len(image_paths)} keyframes "
              f"(chunk_size={self.chunk_size}, overlap={self.overlap_size})")
        if self.prefetch:
            from da3slam_tpu.inout.prefetch import ImagePrefetcher
            from da3slam_tpu.slam.chunks import make_chunk_indices

            # the chunk partition is known upfront (it exactly matches the
            # buffer-driven loop below — steady windows of chunk_size
            # stepping by chunk_size - overlap, then a re-anchored tail of
            # the last chunk_size frames), so the prefetcher can stack each
            # chunk and START its host→device upload ahead of consumption
            stage = [
                image_paths[a:b]
                for a, b in make_chunk_indices(
                    len(image_paths), self.chunk_size, self.overlap_size
                )
            ]
            self._prefetcher = ImagePrefetcher(
                image_paths, lookahead=2 * self.chunk_size, stage_chunks=stage
            )
        try:
            for img_path in image_paths:
                self.process_frame(img_path)
            self._flush_tail(image_paths)
            self._materialize()
        finally:
            if self._prefetcher is not None:
                self._prefetcher.close()
                self._prefetcher = None
        print("SLAM process completed")
        if self.timer.totals:
            print("per-stage timing:\n" + self.timer.report())

    # -- export ------------------------------------------------------------
    def trajectory(self) -> tuple[np.ndarray, np.ndarray]:
        """Global (c2w) poses + intrinsics for every processed frame,
        deduplicating overlap frames between consecutive chunks."""
        from da3slam_tpu.core.transforms import se3_inverse, se3_to_4x4
        import jax.numpy as jnp

        poses, intrs = [], []
        for k, res in enumerate(self.results):
            start = res.get("dedup_skip", 0 if k == 0 else self.overlap_size)
            for i in range(start, len(res["image_paths"])):
                w2c = se3_to_4x4(jnp.asarray(res["extrinsics_global"][i], jnp.float32))
                poses.append(np.asarray(se3_to_4x4(se3_inverse(w2c[:3]))))
                intrs.append(np.asarray(res["intrinsics"][i]))
        return np.stack(poses), np.stack(intrs)
