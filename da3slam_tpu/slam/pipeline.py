"""Fully device-resident streaming SLAM pipeline: one compiled program.

The TPU-native re-expression of the reference's chunk loop (SURVEY.md §5.7,
BASELINE north star): a ``jax.lax.scan`` over fixed-shape chunk windows whose
carry holds the previous overlap frame's depth/conf/intrinsics and global
pose — model forward, depth-scale, ICP and pose chaining all fuse into a
single XLA executable, so the track-depth-align loop never leaves the device.

The host only prepares the stacked window tensor (overlapping views of the
frame array — cheap numpy stride tricks) and reads back the final stacked
results.
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


def make_windows(n_frames: int, chunk_size: int, overlap: int) -> np.ndarray:
    """Window start indices → ``[C, chunk_size]`` gather indices."""
    ranges = make_chunk_indices(n_frames, chunk_size, overlap)
    return np.stack([np.arange(a, b) for a, b in ranges])


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "align_config", "attn_impl", "dtype"),
)
def run_pipeline(
    params: Any,
    windows: jax.Array,  # [C, N, H, W, 3] normalised images
    cfg: ModelConfig,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
) -> PipelineOutput:
    """Scan the SLAM loop over all windows in one compiled program."""

    def forward(chunk_images):
        return forward_fn(params, chunk_images, cfg, ref_idx=0,
                          attn_impl=attn_impl, dtype=dtype)

    def chunk_step(carry, chunk_images):
        prev_depth, prev_conf, prev_K, prev_E_global, is_first = carry
        out = forward(chunk_images)

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
            jnp.asarray(False),
        )
        emit = (depth, out["conf"], ext_global, out["intrinsics"], s, fitness)
        return new_carry, emit

    C, N, H, W, _ = windows.shape
    init = (
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        jnp.eye(4, dtype=jnp.float32)[:3],
        jnp.asarray(True),
    )
    _, (depth, conf, ext, K, s, fit) = jax.lax.scan(chunk_step, init, windows)
    return PipelineOutput(depth, conf, ext, K, s, fit)


def run_streaming_slam(
    params: Any,
    frames: np.ndarray,  # [T, H, W, 3] uint8
    cfg: ModelConfig,
    chunk_size: int = 16,
    overlap: int = 1,
    process_hw: tuple[int, int] | None = None,
    align_config: AlignmentConfig = AlignmentConfig(),
    attn_impl: str = "auto",
    dtype=jnp.bfloat16,
) -> PipelineOutput:
    """Host convenience wrapper: window assembly + on-device preprocessing +
    the scan pipeline."""
    T = frames.shape[0]
    idx = make_windows(T, chunk_size, overlap)
    x = jnp.asarray(frames)
    if process_hw is not None:
        x = resize_normalize(x, process_hw)
    else:
        x = resize_normalize(x, (frames.shape[1], frames.shape[2]))
    windows = x[jnp.asarray(idx)]  # [C, N, H, W, 3]
    return run_pipeline(params, windows, cfg, align_config, attn_impl, dtype)
