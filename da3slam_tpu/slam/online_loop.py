"""Online loop closure for the realtime solver.

The reference shipped loop closure disabled and only in its offline
streaming pass (utils/da3_streaming.py:589-624); the TPU rebuild's offline
``DA3Streaming`` matched that.  This module wires the same three proven
stages — learned-descriptor retrieval (:class:`slam.loop.LoopDetector`),
joint-re-inference Sim(3) constraints
(:func:`slam.loop.loop_sim3_from_joint_prediction`), and the LM pose graph
(:mod:`ops.posegraph`) — into the LIVE chunk loop of
:class:`slam.solver.SLAMSolver`, so a revisit re-anchors the trajectory
*while the sequence is still streaming in* instead of in a second pass.

Design:

- Descriptors are free: every forward already pools encoder tokens into
  ``Prediction.frame_desc`` (models/da3.py:84-95); model-less runs fall back
  to grayscale thumbnails.  Each chunk enrolls only its NEW frames, so
  detector indices are global keyframe indices.
- Memory stays bounded in spirit: per chunk we retain a ``stride``-d copy of
  depth/conf (1/stride² of the pixels) plus poses and image paths — the
  registration estimates 7 DoF, for which the strided cloud is statistically
  identical (same rationale as AlignmentConfig.icp_stride).
- The pose graph runs over per-chunk nodes ``N_k`` (chunk-local → global
  Sim(3)).  The solver's chaining gives ``E_global = E_local ∘ N_k^{-1}``
  with ``N_k = E_global_0^{-1} ∘ E_local_0`` — recovered from stored poses,
  so the closer needs no hook into the alignment math itself.
- A gated loop edge triggers one LM solve; the caller rewrites its stored
  ``extrinsics_global`` from the optimised nodes and re-anchors its carry
  (the previous overlap frame's pose), so every future chunk chains from the
  corrected trajectory.

Config block (all optional, mirrors the offline streaming keys)::

    Loop:
      enable: true           # default false — zero overhead when off
      stride: 4              # stored-geometry pixel stride
      chunk_size: 0          # 0 = full chunks in the joint re-inference
      min_chunk_gap: 2       # ignore near-adjacent chunk pairs
      edge_weight: 0.5
      Retrieval: {threshold: 0.92, min_gap: 30, max_loops: 10}
      Gate: {max_rmse: 0.05, min_n_effective: 200, max_reciprocal_err: 0.1}
      SIM3_Optimizer: {max_iterations: 30, lambda_init: 1.e-6, huber_delta: 0.1}
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp

from da3slam_tpu.core.transforms import (
    Sim3,
    se3_compose,
    se3_inverse,
    sim3_transform_w2c,
)
from da3slam_tpu.slam.loop import (
    LoopDetector,
    gate_loop_constraint,
    loop_sim3_from_joint_prediction,
)


def _strided_K(K: np.ndarray, stride: int) -> np.ndarray:
    """Intrinsics of the ``::stride`` pixel grid (strided pixel (u, v) is
    original (stride·u, stride·v), so the first two rows scale down)."""
    K = np.array(K, np.float32, copy=True)
    K[..., :2, :] /= float(stride)
    return K


class OnlineLoopCloser:
    """Per-chunk loop stage for the live solver (see module docstring)."""

    def __init__(self, model: Any, config: dict | None = None,
                 inference_kwargs: dict | None = None):
        cfg = dict(config or {})
        self.model = model
        self.inference_kwargs = dict(inference_kwargs or {})
        self.stride = int(cfg.get("stride", 4))
        self.joint_chunk_size = int(cfg.get("chunk_size", 0))  # 0 = full
        self.min_chunk_gap = int(cfg.get("min_chunk_gap", 2))
        self.edge_weight = float(cfg.get("edge_weight", 0.5))
        rcfg = cfg.get("Retrieval", {}) or {}
        self.detector = LoopDetector(
            threshold=rcfg.get("threshold", 0.92),
            min_gap=rcfg.get("min_gap", 30),
            max_loops=rcfg.get("max_loops", 10),
        )
        gcfg = cfg.get("Gate", {}) or {}
        self.gate_kwargs = dict(
            max_rmse=gcfg.get("max_rmse", 0.05),
            min_n_effective=gcfg.get("min_n_effective", 200),
            max_reciprocal_err=gcfg.get("max_reciprocal_err", 0.1),
        )
        ocfg = cfg.get("SIM3_Optimizer", {}) or {}
        self.opt_kwargs = dict(
            max_iterations=ocfg.get("max_iterations", 30),
            lambda_init=ocfg.get("lambda_init", 1e-6),
            huber_delta=ocfg.get("huber_delta", 0.1),
        )
        icfg = cfg.get("IRLS", {}) or {}
        self.irls_delta = icfg.get("delta", 0.1)
        self.irls_iters = icfg.get("max_iters", 10)
        self.irls_tol = icfg.get("tol")

        self.chunks: list[dict] = []  # strided geometry + paths per chunk
        self.frame_chunk: list[int] = []  # enrolled frame idx → chunk idx
        self.loop_edges: list[tuple[int, int, Sim3]] = []
        self._attempted: set[tuple[int, int]] = set()

    # -- per-chunk ingestion -------------------------------------------------
    def add_chunk(self, cur: dict, new_start: int, frame_desc=None,
                  depth_scale: float = 1.0) -> None:
        """Enroll a processed chunk: descriptors for its NEW frames (from
        ``new_start``, the solver's dedup skip) + the strided geometry the
        constraint estimator needs later.  ``cur`` is the solver's chunk dict
        (depth already prescaled, conf raw with the 1.0 contract floor);
        ``depth_scale`` is the prescale the aligner applied — the stored
        local extrinsic translations must carry it too so the stored cloud
        and poses live in the SAME chunk-local frame (the aligner scales
        them internally but returns only the global chain,
        slam/alignment.py:142-144)."""
        st = self.stride
        E_local = np.asarray(cur["extrinsics"], np.float32).copy()
        E_local[:, :, 3] *= float(depth_scale)
        self.chunks.append({
            "image_paths": list(cur["image_paths"]),
            # conf shifted like the streaming/loop convention (floor at 0)
            "depth": np.asarray(cur["depth"])[:, ::st, ::st].copy(),
            "conf": np.asarray(cur["conf"])[:, ::st, ::st].copy() - 1.0,
            "intrinsics": _strided_K(cur["intrinsics"], st),
            "extrinsics": E_local,
        })
        k = len(self.chunks) - 1
        n = len(cur["image_paths"])
        for i in range(new_start, n):
            desc = None
            if frame_desc is not None and self.detector.kind != "thumbnail":
                desc = np.asarray(frame_desc)[i]
            if desc is None and self.detector.kind == "learned":
                # keep indices aligned when a chunk lacks descriptors
                desc = np.zeros(self.detector.dim, np.float32)
            if desc is not None:
                self.detector.add_frame(None, desc=desc)
            else:
                self.detector.add_frame(cur["processed_images"][i])
            self.frame_chunk.append(k)

    # -- constraint estimation -------------------------------------------------
    def _estimate_constraint(self, a: int, b: int):
        """Joint re-inference over both chunks (bounded by ``chunk_size``)
        → strided Sim(3) registration of each stored chunk to the joint
        frame → composed loop constraint (loop.py)."""
        ca, cb = self.chunks[a], self.chunks[b]
        lcs = self.joint_chunk_size
        if lcs and lcs < min(len(ca["image_paths"]), len(cb["image_paths"])):
            ca = {key: v[:lcs] for key, v in ca.items()}
            cb = {key: v[:lcs] for key, v in cb.items()}
        joint = self.model.inference(
            image=ca["image_paths"] + cb["image_paths"],
            **self.inference_kwargs,
        )
        st = self.stride

        class _J:  # strided view matching the stored chunks' pixel grid
            depth = np.asarray(joint.depth)[:, ::st, ::st]
            conf = np.asarray(joint.conf)[:, ::st, ::st] - 1.0
            extrinsics = np.asarray(joint.extrinsics)
            intrinsics = _strided_K(np.asarray(joint.intrinsics), st)

        return loop_sim3_from_joint_prediction(
            ca, cb, _J, irls_delta=self.irls_delta,
            irls_iters=self.irls_iters, irls_tol=self.irls_tol,
        )

    # -- pose graph ------------------------------------------------------------
    def maybe_close(self, extrinsics_global: list[np.ndarray]):
        """Detect → gate → optimize.  ``extrinsics_global``: the caller's
        CURRENT per-chunk [N, 3, 4] global w2c arrays (same order as
        ``add_chunk`` calls).  Returns the re-anchored per-chunk arrays when
        a new gated loop edge landed, else None."""
        if len(self.chunks) < self.min_chunk_gap + 1:
            return None
        pairs = self.detector.detect()
        new_edges = 0
        for p in pairs:
            a = self.frame_chunk[p.frame_a]
            b = self.frame_chunk[p.frame_b]
            if a > b:
                a, b = b, a
            if b - a < self.min_chunk_gap or (a, b) in self._attempted:
                continue
            self._attempted.add((a, b))
            lc = self._estimate_constraint(a, b)
            if not gate_loop_constraint(lc, **self.gate_kwargs):
                print(f"  [loop] edge REJECTED: chunk {b} → {a} "
                      f"(rmse={lc.rmse:.4f}, n_eff={lc.n_effective}, "
                      f"recip={lc.reciprocal_err:.4f})")
                continue
            print(f"  [loop] edge ACCEPTED: chunk {b} → {a} "
                  f"(sim={p.similarity:.3f}, rmse={lc.rmse:.4f})")
            self.loop_edges.append((a, b, lc.transform))
            new_edges += 1
        if new_edges == 0 or not self.loop_edges:
            return None
        return self._optimize(extrinsics_global)

    def _optimize(self, extrinsics_global: list[np.ndarray]) -> list[np.ndarray]:
        from da3slam_tpu.ops.posegraph import (
            PoseGraphEdges,
            add_loop_edges,
            optimize_sim3_pose_graph,
        )

        K = len(self.chunks)
        # nodes: N_k maps chunk-local → global; E_global = E_local ∘ N_k^{-1}
        # ⇒ N_k = E_global_0^{-1} ∘ E_local_0 (rigid; scale is folded into
        # the chunk-local coords by the depth prescale)
        nodes = [
            np.asarray(se3_compose(
                se3_inverse(jnp.asarray(Eg[0], jnp.float32)),
                jnp.asarray(self.chunks[k]["extrinsics"][0], jnp.float32),
            ))
            for k, Eg in enumerate(extrinsics_global)
        ]
        N = jnp.asarray(np.stack(nodes))  # [K, 3, 4]
        nodes_init = Sim3(jnp.ones(K), N[:, :3, :3], N[:, :3, 3])
        # odometry edges from the SAME chained poses the nodes came from
        rel = se3_compose(se3_inverse(N[:-1]), N[1:])  # [K-1, 3, 4]
        edges = PoseGraphEdges(
            i=jnp.arange(K - 1),
            j=jnp.arange(1, K),
            measurement=Sim3(jnp.ones(K - 1), rel[:, :3, :3], rel[:, :3, 3]),
            weight=jnp.ones(K - 1),
        )
        edges = add_loop_edges(edges, self.loop_edges, weight=self.edge_weight)
        opt = optimize_sim3_pose_graph(nodes_init, edges, **self.opt_kwargs)
        updated = []
        for k in range(K):
            Nk = Sim3(opt.s[k], opt.R[k], opt.t[k])
            E_new = sim3_transform_w2c(
                jnp.asarray(self.chunks[k]["extrinsics"], jnp.float32), Nk
            )
            # rigid renormalisation: sim3_transform_w2c leaves the rotation
            # rows at norm 1/s; scaling the whole 3x4 by s keeps the camera
            # center and orientation while restoring orthonormality (the
            # same convention as the streaming pose export,
            # slam/streaming.py save_camera_poses)
            E_new = opt.s[k] * E_new
            updated.append(np.asarray(E_new, np.float32))
        return updated
