"""View-sharded (sequence-parallel) multi-view forward.

Shards the chunk's *view* axis across the mesh: patch embedding, intra-view
attention, MLPs and the DPT head are embarrassingly parallel over views and
run on local shards; the cross-view attention — the quadratic term — runs
as ring attention over the mesh axis (parallel/ring_attention.py), so a
chunk too large for one chip's attention scales across ICI.  The tiny
camera head runs globally on the gathered camera tokens so reference-view
normalisation sees all views.

This is the multi-chip *inference* layout (the training step in
parallel/train.py shards the batch-of-windows axis instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from da3slam_tpu.models import camera, dpt, vit
from da3slam_tpu.models.config import ModelConfig


def make_sharded_forward(
    cfg: ModelConfig,
    mesh: Mesh,
    axis: str = "dp",
    ref_idx: int = 0,
    dtype=jnp.float32,
    jit: bool = True,
):
    """Build a jitted forward over ``mesh`` with views sharded on ``axis``.

    Returned fn: ``(params, images [N, H, W, 3]) -> prediction dict``;
    N must divide by the axis size.  ``jit=False`` returns the raw traced
    body (no in_shardings) for embedding inside a larger jitted program —
    e.g. the sp-SLAM scan (slam/pipeline.py:run_pipeline_sp).
    """
    view_spec = P(axis)

    def local_encode(params, imgs):
        taps, final, grid = vit.encode(
            params["encoder"], imgs, cfg,
            attn_impl="xla", dtype=dtype, cross_attn_impl=f"ring:{axis}",
        )
        H, W = imgs.shape[1], imgs.shape[2]
        depth, conf, rays = dpt.apply_dpt(params["dpt"], taps, grid, (H, W), cfg)
        return depth, conf, rays, final[:, 0, :]

    def fwd(params, images):
        sharded = shard_map(
            local_encode,
            mesh=mesh,
            in_specs=(P(), view_spec),
            out_specs=(view_spec, view_spec, view_spec, view_spec),
        )
        depth, conf, rays, cam_tokens = sharded(params, images)
        # camera head: tiny, global (needs the reference view's pose)
        H, W = images.shape[1], images.shape[2]
        extrinsics, intrinsics = camera.apply_camera_head(
            params["camera"], cam_tokens, (H, W), ref_idx
        )
        return {
            "depth": depth,
            "conf": conf,
            "extrinsics": extrinsics,
            "intrinsics": intrinsics,
            "rays": rays,
        }

    if not jit:
        return fwd
    in_shardings = (NamedSharding(mesh, P()), NamedSharding(mesh, view_spec))
    return jax.jit(fwd, in_shardings=in_shardings)
