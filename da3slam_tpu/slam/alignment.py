"""Chunk-to-chunk alignment + global pose chaining (jittable core).

The device-side equivalent of the reference's alignment path
(solver.py:116-153 → utils/align_geometry_single.py:192-255):

  1. depth-scale: confidence-gated median ratio on the overlap frame pair
  2. registration: projective ICP between the overlap frames' camera-coord
     clouds (replaces Open3D, SURVEY.md §2.4)
  3. anchoring: cur chunk's frame-0 global pose from the prev overlap pose
  4. chaining: per-frame relative w2c composition, as an associative scan
     instead of the reference's sequential Python loop
     (align_geometry_single.py:241-249)

Everything here runs under ``jit``; per-chunk Python stays on the host.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from da3slam_tpu.core.geometry import backproject_depth, depth_scale_ratio
from da3slam_tpu.core.transforms import (
    Sim3,
    highest_precision,
    orthonormalize_rotation,
    se3_compose,
    se3_inverse,
    sim3_inverse,
)
from da3slam_tpu.ops.icp import ICPResult, icp_point_to_point
from da3slam_tpu.ops.registration import irls_sim3


@dataclasses.dataclass(frozen=True)
class AlignmentConfig:
    """Knobs mirroring configs/config1.yaml + the solver defaults."""

    conf_threshold: float = 0.2  # depth-scale confidence gate (solver.py:125)
    icp_threshold: float = 0.1  # correspondence gate (align_geometry_single.py:195)
    # the reference ran 50 point-to-point Open3D iterations
    # (align_geometry_single.py:196); point-to-plane converges in <10 and
    # each iteration costs a gather pass, so the default is lower
    icp_max_iterations: int = 12
    # source-cloud pixel stride: the overlap frame has ~250k pixels at the
    # reference resolution; ~16k points estimate the same 6-7 DoF transform
    # at a fraction of the gather cost (the target map stays full-res)
    icp_stride: int = 4
    method: str = "icp"  # "icp" | "irls" | "umeyama"
    irls_delta: float = 0.1  # configs/config1.yaml IRLS block
    irls_max_iters: int = 5
    # convergence early-exit (reference configs/config1.yaml:18 `tol`,
    # utils/align.py:199-213 semantics); None = fixed iteration count
    irls_tol: float | None = None
    with_scale: bool = False  # SE(3)+depth-prescale (solver path) vs full Sim(3)


class ChunkAlignment(NamedTuple):
    extrinsics_global: jax.Array  # [N, 3, 4] w2c of the current chunk
    depth_scaled: jax.Array  # [N, H, W] current chunk depth after prescale
    prev_overlap_for_next: jax.Array  # [3, 4] last frame's global w2c
    transform: Sim3  # overlap registration (cur → prev camera frame)
    depth_scale: jax.Array  # scalar s multiplied into cur depth
    fitness: jax.Array
    inlier_rmse: jax.Array


def chain_extrinsics(
    E_local: jax.Array, E_anchor_global: jax.Array, anchor_idx=0
) -> jax.Array:
    """Chain chunk-local w2c extrinsics onto a global anchor.

    The reference chains sequentially,
    ``E_i_global = (E_i_local ∘ E_{i-1}_local^{-1}) ∘ E_{i-1}_global``
    (align_geometry_single.py:241-249); that product telescopes to the
    closed form used here:

      ``E_i_global = E_i_local ∘ E_anchor_local^{-1} ∘ E_anchor_global``

    which is one batched compose instead of a scan, and works for an anchor
    at any frame index (needed when the overlap frame is not frame 0 — e.g.
    overlap_size > 1, or the re-anchored tail window).

    Args:
      E_local:         ``[N, 3, 4]`` chunk-local w2c
      E_anchor_global: ``[3, 4]`` global w2c of the anchor frame
      anchor_idx:      index of the anchor frame within the chunk (may be a
                       traced scalar)
    """
    E_anchor_local = jax.lax.dynamic_index_in_dim(
        E_local, anchor_idx, axis=0, keepdims=False
    )
    rel = se3_compose(E_local, se3_inverse(E_anchor_local)[None])
    return se3_compose(rel, E_anchor_global[None])


@highest_precision
def align_chunk_single_overlap(
    prev_depth: jax.Array,  # [H, W] prev chunk's LAST frame
    prev_conf: jax.Array,
    prev_K: jax.Array,  # [3, 3]
    cur_depth: jax.Array,  # [N, H, W] full current chunk
    cur_conf: jax.Array,  # [N, H, W]
    cur_K: jax.Array,  # [N, 3, 3]
    cur_extrinsics: jax.Array,  # [N, 3, 4] chunk-local w2c
    prev_overlap_global: jax.Array,  # [3, 4] prev last frame's global w2c
    config: AlignmentConfig = AlignmentConfig(),
    anchor_idx=0,
) -> ChunkAlignment:
    """Single-frame-overlap chunk alignment (jittable with static config).

    ``anchor_idx`` is the index WITHIN the current chunk of the frame that
    is physically the previous chunk's last frame: ``overlap_size - 1`` in
    the steady state, larger for the re-anchored tail window
    (slam/chunks.py keeps the tail full-size for static shapes, which
    widens its overlap with the previous chunk).  May be a traced scalar.
    """
    idx = lambda arr: jax.lax.dynamic_index_in_dim(  # noqa: E731
        arr, anchor_idx, axis=0, keepdims=False
    )
    cur_anchor_depth = idx(cur_depth)
    cur_anchor_conf = idx(cur_conf)
    cur_anchor_K = idx(cur_K)

    # 1) depth scale: prev(last) vs cur(anchor) — the SAME physical frame —
    # conf-gated median ratio.  Strided: the exact median needs a full
    # device sort (O(n log^2 n) bitonic on TPU); the median over a stride-4
    # grid of ~16k samples is statistically identical for smooth depth maps
    # and ~16x cheaper.
    sst = max(int(config.icp_stride), 1)
    s_depth = depth_scale_ratio(
        prev_depth[::sst, ::sst],
        cur_anchor_depth[::sst, ::sst],
        prev_conf[::sst, ::sst],
        cur_anchor_conf[::sst, ::sst],
        conf_th=config.conf_threshold,
    )
    depth_scaled = cur_depth * s_depth
    # the chunk's metric rescale applies to its whole local world: extrinsic
    # translations must follow the depth (the reference prescales only depth,
    # solver.py:126, leaving pose-chain translations at the old scale — the
    # scale-drift quirk SURVEY.md §7.3.4 flags for unification)
    cur_extrinsics = jnp.concatenate(
        [cur_extrinsics[..., :3], cur_extrinsics[..., 3:] * s_depth], axis=-1
    )

    # 2) overlap registration in camera coords (viewpoints nearly coincide)
    st = max(int(config.icp_stride), 1)
    scaled_anchor_depth = cur_anchor_depth * s_depth
    tgt_map = backproject_depth(prev_depth, prev_K)  # prev last frame
    src_map = backproject_depth(scaled_anchor_depth, cur_anchor_K)  # cur anchor frame
    src_pts = src_map[::st, ::st].reshape(-1, 3)
    src_valid = scaled_anchor_depth[::st, ::st].reshape(-1) > 1e-6
    tgt_valid = prev_depth > 1e-6

    if config.method == "icp":
        icp: ICPResult = icp_point_to_point(
            src_pts,
            tgt_map,
            prev_K,
            src_valid=src_valid,
            tgt_valid=tgt_valid,
            threshold=config.icp_threshold,
            max_iterations=config.icp_max_iterations,
            with_scale=config.with_scale,
        )
        T, fitness, rmse = icp.transform, icp.fitness, icp.inlier_rmse
    elif config.method == "irls":
        # pixelwise correspondence (same grid, both maps strided identically),
        # confidence-weighted IRLS
        tgt_pts = tgt_map[::st, ::st].reshape(-1, 3)
        w = jnp.sqrt(
            prev_conf[::st, ::st].reshape(-1)
            * cur_anchor_conf[::st, ::st].reshape(-1)
        )
        w = w * src_valid * tgt_valid[::st, ::st].reshape(-1)
        res = irls_sim3(
            src_pts,
            tgt_pts,
            conf=w,
            delta=config.irls_delta,
            max_iters=config.irls_max_iters,
            with_scale=config.with_scale,
            tol=config.irls_tol,
        )
        T, fitness, rmse = res.transform, jnp.asarray(1.0), res.rmse
    elif config.method == "umeyama":
        from da3slam_tpu.ops.registration import weighted_umeyama

        w = (src_valid & tgt_valid[::st, ::st].reshape(-1)).astype(jnp.float32)
        T = weighted_umeyama(
            src_pts, tgt_map[::st, ::st].reshape(-1, 3), w, config.with_scale
        )
        fitness, rmse = jnp.asarray(1.0), jnp.asarray(0.0)
    else:
        raise ValueError(f"unknown alignment method {config.method!r}")

    # 3) anchor: E_anchor_global = T^{-1} ∘ E_prev_global  (w2c composition;
    #    T maps cur-anchor camera coords into prev-overlap camera coords,
    #    reference align_geometry_single.py:224-231).  The inverse is taken
    #    in Sim(3) so the with_scale=True path stays exact (for the SE(3)
    #    solver path s=1 and this reduces to the rigid inverse).
    Tinv = sim3_inverse(T)
    Tinv_mat = jnp.concatenate([Tinv.s * Tinv.R, Tinv.t[:, None]], axis=-1)
    E_anchor_global = se3_compose(Tinv_mat, prev_overlap_global)
    # the anchor pose is the only state that survives from chunk to chunk
    # (the f32 carry, solver.py's prev_overlap_aligned_3x4): without
    # projection its rotation drifts off SO(3) by ~1 ulp per compose and
    # the error COMPOUNDS multiplicatively over hundreds of chunks
    # (SURVEY §7.3.6; the reference instead rescaled by the Sim3 scale,
    # utils/da3_streaming.py:772).  One 3x3 SVD per chunk is free.
    E_anchor_global = jnp.concatenate(
        [orthonormalize_rotation(E_anchor_global[..., :3]),
         E_anchor_global[..., 3:]], axis=-1,
    )

    # 4) chain the rest of the chunk around the anchor frame
    extrinsics_global = chain_extrinsics(
        cur_extrinsics, E_anchor_global, anchor_idx
    )

    return ChunkAlignment(
        extrinsics_global=extrinsics_global,
        depth_scaled=depth_scaled,
        prev_overlap_for_next=extrinsics_global[-1],
        transform=T,
        depth_scale=s_depth,
        fitness=fitness,
        inlier_rmse=rmse,
    )
