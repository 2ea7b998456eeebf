"""Fully device-resident streaming SLAM pipeline: one compiled program.

The TPU-native re-expression of the reference's chunk loop (SURVEY.md §5.7,
BASELINE north star): a ``jax.lax.scan`` over fixed-shape chunk windows whose
carry holds the previous overlap frame's depth/conf/intrinsics and global
pose — preprocessing, model forward, depth-scale, ICP and pose chaining all
fuse into a single XLA executable, so the track-depth-align loop never
leaves the device.

Memory layout: the device holds the sequence ONCE as uint8 frames; each scan
step gathers its window's frames by index and normalises them on the fly
(materialising all float windows up front would cost
``chunk_size/(chunk_size-overlap) × 4``× the sequence size in HBM).

The tail window is re-anchored to keep shapes static (slam/chunks.py), which
widens its overlap with the previous window; the per-window ``anchor_idx``
passed through the scan keeps the alignment pairing physically correct.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models.config import ModelConfig
from da3slam_tpu.models.da3 import forward_fn
from da3slam_tpu.ops.resize import resize_normalize
from da3slam_tpu.slam.alignment import AlignmentConfig, align_chunk_single_overlap
from da3slam_tpu.slam.chunks import make_chunk_indices


class PipelineOutput(NamedTuple):
    depth: jax.Array  # [C, N, H, W]
    conf: jax.Array  # [C, N, H, W]
    extrinsics_global: jax.Array  # [C, N, 3, 4] w2c
    intrinsics: jax.Array  # [C, N, 3, 3]
    depth_scale: jax.Array  # [C]
    fitness: jax.Array  # [C]


def make_windows(
    n_frames: int, chunk_size: int, overlap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Window gather indices ``[C, chunk_size]`` plus per-window anchor
    indices ``[C]`` — the position within window k of the frame that is
    window k-1's last frame (``overlap-1`` in steady state; larger for the
    re-anchored tail)."""
    ranges = make_chunk_indices(n_frames, chunk_size, overlap)
    idx = np.stack([np.arange(a, b) for a, b in ranges])
    anchors = np.zeros(len(ranges), np.int32)
    for k in range(1, len(ranges)):
        prev_last = ranges[k - 1][1] - 1
        anchors[k] = prev_last - ranges[k][0]
    return idx, anchors


def _align_step(carry, out, a_idx, is_first, align_config):
    """One window's alignment/anchoring against the running carry.

    Shared by the fused scan (``run_pipeline``) and the dp-sharded
    two-phase pipeline (``run_pipeline_dp``) so both paths compute the
    identical chain.
    """
    prev_depth, prev_conf, prev_K, prev_E_global = carry

    def align_branch(_):
        a = align_chunk_single_overlap(
            prev_depth=prev_depth,
            prev_conf=prev_conf,
            prev_K=prev_K,
            cur_depth=out["depth"],
            cur_conf=out["conf"],
            cur_K=out["intrinsics"],
            cur_extrinsics=out["extrinsics"],
            prev_overlap_global=prev_E_global,
            config=align_config,
            anchor_idx=a_idx,
        )
        return a.extrinsics_global, a.depth_scaled, a.depth_scale, a.fitness

    def first_branch(_):
        # first chunk defines the global frame (reference solver.py:206-211)
        return (
            out["extrinsics"],
            out["depth"],
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(1.0, jnp.float32),
        )

    ext_global, depth, s, fitness = jax.lax.cond(
        is_first, first_branch, align_branch, operand=None
    )
    new_carry = (
        depth[-1],
        out["conf"][-1],
        out["intrinsics"][-1],
        ext_global[-1],
    )
    emit = (depth, out["conf"], ext_global, out["intrinsics"], s, fitness)
    return new_carry, emit


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "align_config", "attn_impl", "dtype", "process_hw",
                     "spill_dtype"),
)
def run_pipeline(
    params: Any,
    frames: jax.Array,  # [T, H, W, 3] uint8 (or float) — device-resident once
    window_idx: jax.Array,  # [C, N] int32
    anchor_idx: jax.Array,  # [C] int32
    cfg: ModelConfig,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    process_hw: tuple[int, int] | None = None,
    carry=None,
    spill_dtype=None,
) -> tuple[PipelineOutput, tuple]:
    """Scan the SLAM loop over all windows in one compiled program.

    ``carry`` threads segmented runs: pass the carry returned by the previous
    segment to continue a sequence (None starts fresh — the first window then
    defines the global frame).  Returns ``(outputs, final_carry)``.

    ``spill_dtype`` (e.g. ``jnp.float16``) casts the DENSE emitted maps —
    depth and conf, the [C, N, H, W] bulk — at the scan emit, halving both
    the stacked output buffer in HBM and any subsequent device→host spill.
    The alignment math itself (the carry) stays f32; poses/intrinsics/
    scales are tiny and stay f32.  f16's 10-bit mantissa bounds the depth
    error at ~0.05%, well under the model's own noise floor.
    """
    hw = process_hw if process_hw is not None else (frames.shape[1], frames.shape[2])
    fresh_start = carry is None

    def chunk_step(carry, xs):
        idx_row, a_idx, is_first = xs
        chunk_images = resize_normalize(jnp.take(frames, idx_row, axis=0), hw)
        out = forward_fn(params, chunk_images, cfg, ref_idx=0,
                         attn_impl=attn_impl, dtype=dtype)
        new_carry, (d, cf, ext, K, s, fit) = _align_step(
            carry, out, a_idx, is_first, align_config
        )
        if spill_dtype is not None:
            d, cf = d.astype(spill_dtype), cf.astype(spill_dtype)
        return new_carry, (d, cf, ext, K, s, fit)

    C = window_idx.shape[0]
    H, W = hw
    if fresh_start:
        carry = (
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.eye(4, dtype=jnp.float32)[:3],
        )
    is_first = jnp.zeros(C, bool).at[0].set(fresh_start)
    final_carry, (depth, conf, ext, K, s, fit) = jax.lax.scan(
        chunk_step, carry, (window_idx, anchor_idx, is_first)
    )
    return PipelineOutput(depth, conf, ext, K, s, fit), final_carry


def run_pipeline_dp(
    params: Any,
    frames: jax.Array,
    window_idx: jax.Array,  # [C, N] int32
    anchor_idx: jax.Array,  # [C] int32
    cfg: ModelConfig,
    mesh,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    process_hw: tuple[int, int] | None = None,
    carry=None,
) -> tuple[PipelineOutput, tuple]:
    """Multi-chip SLAM: window forwards sharded over the mesh's ``dp`` axis.

    The model forward of window k does not depend on window k-1's
    *alignment* (only the pose chain does), so the dominant cost — the
    16-frame DA3 forward — data-parallelises perfectly over windows:

      phase 1: windows split over the ``dp`` axis with ``shard_map``; each
               device runs the *sequential* per-window forward
               (``lax.map``) over its local windows.  Sequential-per-device
               keeps every kernel at the exact shape the fused scan uses
               (a vmap-batched Pallas flash call lowers ~3.5× slower),
               while devices run their window sets concurrently.
      phase 2: the sequential depth-scale/ICP/pose-chain scan over the
               (much smaller) forward outputs — identical math to
               ``run_pipeline``'s fused scan (shared ``_align_step``).

    Window counts that don't divide the dp size are padded with repeats of
    the last window (dropped again after phase 1).  On C chips this
    approaches a C× end-to-end speedup once the sequence has ≥ C windows
    per segment; single-device meshes degenerate to the fused path's
    arithmetic exactly.
    """
    hw = process_hw if process_hw is not None else (frames.shape[1], frames.shape[2])
    fresh_start = carry is None

    run = _dp_run_factory(mesh, hw, cfg, align_config, attn_impl, dtype)
    C = window_idx.shape[0]
    H, W = hw
    if fresh_start:
        carry = (
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.eye(4, dtype=jnp.float32)[:3],
        )
    is_first = jnp.zeros(C, bool).at[0].set(fresh_start)

    # shard_map needs the window axis to divide dp: pad with repeats of the
    # last window, sliced off again inside the jitted runner
    dp = mesh.shape["dp"]
    pad = (-C) % dp
    widx = np.asarray(window_idx)
    if pad:
        widx = np.concatenate([widx, np.repeat(widx[-1:], pad, axis=0)])
    return run(params, frames, jnp.asarray(widx), jnp.asarray(anchor_idx),
               carry, is_first, C)


@functools.lru_cache(maxsize=None)
def _dp_run_factory(mesh, hw, cfg, align_config, attn_impl, dtype):
    """Jitted two-phase runner, cached per (mesh, geometry, config) so
    repeated segments reuse the compiled executable."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, static_argnames=("n_windows",))
    def run(params, frames, window_idx, anchor_idx, carry, is_first, n_windows):
        def local_forwards(params_, frames_, widx_local):
            # sequential over this device's windows: kernels keep the same
            # per-window shapes as the fused scan (no batched-Pallas path)
            def one_forward(idx_row):
                imgs = resize_normalize(jnp.take(frames_, idx_row, axis=0), hw)
                return forward_fn(params_, imgs, cfg, ref_idx=0,
                                  attn_impl=attn_impl, dtype=dtype)

            return jax.lax.map(one_forward, widx_local)

        outs = shard_map(
            local_forwards,
            mesh=mesh,
            in_specs=(P(), P(), P("dp")),
            out_specs=P("dp"),
            # the Pallas flash kernel's output ShapeDtypeStructs carry no
            # vma annotation, which trips the varying-axes checker on TPU
            check_vma=False,
        )(params, frames, window_idx)
        # drop the divisibility padding
        outs = jax.tree.map(lambda x: x[:n_windows], outs)

        def step(c, xs):
            out, a_idx, first = xs
            return _align_step(c, out, a_idx, first, align_config)

        final_carry, emits = jax.lax.scan(
            step, carry, (outs, anchor_idx, is_first)
        )
        return PipelineOutput(*emits), final_carry

    return run


def run_streaming_slam(
    params: Any,
    frames,  # [T, H, W, 3] uint8 (numpy or device array)
    cfg: ModelConfig,
    chunk_size: int = 16,
    overlap: int = 1,
    process_hw: tuple[int, int] | None = None,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
    segment_windows: int | None = None,
    segment_spill: str = "host",
    spill_dtype=None,
    mesh=None,
) -> PipelineOutput:
    """Host convenience wrapper: window indexing + the scan pipeline.

    ``segment_windows`` bounds device memory for arbitrarily long sequences:
    the scan runs ``segment_windows`` windows at a time, keeping only each
    segment's frame slice in HBM and threading the carry between segments —
    results are identical to the single-scan path.

    ``segment_spill`` says where segment outputs accumulate: "host" (the
    default — per-segment dense outputs move off-device, the true
    bounded-HBM mode) or "device" (outputs stay as device arrays; use when
    the caller will immediately reduce them on-device, or to measure the
    compute path without the host link).

    ``spill_dtype`` (e.g. ``jnp.float16``) emits the dense depth/conf maps
    in a compact dtype straight from the scan — halving the per-segment
    HBM output buffer AND the device→host spill bytes (the host link is
    the bounded-HBM mode's bottleneck: depth+conf dominate the transfer
    at ~32 MB per 16-frame window in f32).  None keeps the bit-exact f32
    path.

    ``mesh`` switches to the multi-chip pipeline (``run_pipeline_dp``):
    window forwards shard over the mesh's ``dp`` axis, the pose chain
    scans sequentially over the small forward outputs.
    """
    T = frames.shape[0]
    idx, anchors = make_windows(T, chunk_size, overlap)

    def run_segment(seg_frames, seg_idx, seg_anchors, carry):
        if mesh is not None:
            out, c = run_pipeline_dp(
                params, seg_frames, seg_idx, seg_anchors, cfg, mesh,
                align_config, attn_impl, dtype, process_hw, carry=carry,
            )
            if spill_dtype is not None:  # dp path: cast before the spill
                out = out._replace(depth=out.depth.astype(spill_dtype),
                                   conf=out.conf.astype(spill_dtype))
            return out, c
        return run_pipeline(
            params, seg_frames, seg_idx, seg_anchors, cfg,
            align_config, attn_impl, dtype, process_hw, carry=carry,
            spill_dtype=spill_dtype,
        )

    if segment_windows is None or segment_windows >= idx.shape[0]:
        out, _ = run_segment(
            jnp.asarray(frames), jnp.asarray(idx), jnp.asarray(anchors), None
        )
        return out

    if segment_spill not in ("host", "device"):
        raise ValueError(f"segment_spill must be 'host' or 'device', got {segment_spill!r}")
    on_device_frames = isinstance(frames, jax.Array)
    if not on_device_frames:
        frames = np.asarray(frames)

    starts = list(range(0, idx.shape[0], segment_windows))

    def stage(s0):
        """Segment's (frames, rebased idx, anchors) with frames staged in HBM.

        ``jax.device_put`` dispatches the upload asynchronously, so calling
        this for segment k+1 right after dispatching segment k's scan
        double-buffers: the host→device copy rides under the compute.
        """
        seg_idx = idx[s0 : s0 + segment_windows]
        f_lo, f_hi = int(seg_idx.min()), int(seg_idx.max()) + 1
        if on_device_frames:
            # already in HBM: slice device-side, no host round-trip
            seg_frames = jax.lax.slice_in_dim(frames, f_lo, f_hi, axis=0)
        else:
            seg_frames = jax.device_put(frames[f_lo:f_hi])
        return seg_frames, jnp.asarray(seg_idx - f_lo), jnp.asarray(
            anchors[s0 : s0 + segment_windows]
        )

    outputs = []
    carry = None
    staged = stage(starts[0])
    for k, s0 in enumerate(starts):
        seg_frames, seg_idx_dev, seg_anchors_dev = staged
        out, carry = run_segment(seg_frames, seg_idx_dev, seg_anchors_dev, carry)
        if k + 1 < len(starts):  # prefetch while this segment computes
            staged = stage(starts[k + 1])
        # the host fetch (spill) below is what blocks on the compute
        outputs.append(jax.tree.map(np.asarray, out) if segment_spill == "host" else out)
    cat = np.concatenate if segment_spill == "host" else jnp.concatenate
    return PipelineOutput(*[cat(parts) for parts in zip(*outputs)])
