"""Distributed training step for the DA3 model.

The reference pipeline is inference-only; production deployment of a depth
model needs fine-tuning (domain adaptation to e.g. endoscopy, C3VD), so the
framework ships a real train step: scale-invariant log-depth loss with
confidence weighting + pose loss, AdamW, jitted over the ``(dp, tp)`` mesh
with explicit parameter/batch shardings.  Collectives (gradient psum over
dp, activation collectives from tensor parallelism) are inserted by GSPMD.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from da3slam_tpu.models.config import ModelConfig
from da3slam_tpu.models.da3 import forward_fn, init_params
from da3slam_tpu.parallel.sharding import batch_sharding, param_shardings, replicated


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def depth_loss(pred_depth, pred_conf, gt_depth, eps=1e-6):
    """Confidence-weighted scale-invariant log loss (Eigen-style affine
    invariance is handled by the pose/scale heads; here si-log suffices)."""
    valid = (gt_depth > eps).astype(jnp.float32)
    diff = (jnp.log(pred_depth + eps) - jnp.log(gt_depth + eps)) * valid
    n = jnp.maximum(valid.sum(), 1.0)
    silog = (diff**2).sum() / n - 0.5 * (diff.sum() / n) ** 2
    # conf head learns to predict its own error (weighted residual - log conf).
    # The -log(conf) reward must be masked too: on invalid pixels diff is 0,
    # so an unmasked term would push conf up without bound.
    conf_term = ((pred_conf * diff**2 - jnp.log(pred_conf)) * valid).sum() / n
    return silog + 0.1 * conf_term


def pose_loss(pred_ext, gt_ext):
    return jnp.mean((pred_ext - gt_ext) ** 2)



def _commit_state(tx, state: "TrainState", mesh: Mesh) -> "TrainState":
    """Commit every TrainState leaf to an explicit sharding.

    ``tx.init`` creates uncommitted arrays; saving and restoring a
    checkpoint then pins them to one device, which clashes with the
    mesh-sharded params inside the donated step jit ("incompatible
    devices").  Optimizer moments mirror their parameter's sharding (the
    memory-correct layout: sharded params get sharded moments); scalar
    leaves (optimizer ``count``, ``step``) replicate over the mesh.
    """
    rep = replicated(mesh)
    opt_state = optax.tree_map_params(
        tx,
        lambda o, p: jax.device_put(o, p.sharding),
        state.opt_state,
        state.params,
        transform_non_params=lambda x: jax.device_put(x, rep),
    )
    return TrainState(state.params, opt_state, jax.device_put(state.step, rep))


def make_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
    dtype=jnp.float32,
):
    """Returns ``(init_fn, step_fn)`` jitted over the mesh.

    ``step_fn(state, batch)`` where batch = dict(images [B,N,H,W,3] f32
    normalised, depth [B,N,H,W], extrinsics [B,N,3,4]), sharded over dp.
    """
    tx = optax.adamw(learning_rate)

    def loss_fn(params, batch):
        def per_window(images, gt_depth, gt_ext):
            out = forward_fn(params, images, cfg, dtype=dtype)
            return (
                depth_loss(out["depth"], out["conf"], gt_depth)
                + pose_loss(out["extrinsics"], gt_ext)
            )

        losses = jax.vmap(per_window)(
            batch["images"], batch["depth"], batch["extrinsics"]
        )
        return jnp.mean(losses)

    p_shard = lambda params: param_shardings(params, mesh)  # noqa: E731

    def init_fn(seed: int = 0) -> TrainState:
        params = init_params(jax.random.PRNGKey(seed), cfg)
        params = jax.device_put(params, p_shard(params))
        opt_state = tx.init(params)
        return _commit_state(
            tx, TrainState(params, opt_state, jnp.zeros((), jnp.int32)), mesh
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch) -> tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def place_batch(batch):
        return jax.device_put(batch, batch_sharding(mesh))

    return init_fn, step_fn, place_batch


def make_sp_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    axis: str = "dp",
    learning_rate: float = 1e-4,
    dtype=jnp.float32,
    ref_idx: int = 0,
):
    """View-sharded (sequence-parallel) train step for giant-tier fine-tuning.

    Where ``make_train_step`` shards the batch-of-windows axis, this shards
    the *view* axis of one window across ``axis``: patch embed, intra-view
    attention, MLPs and the DPT head run on local view shards inside
    ``shard_map``; cross-view attention runs as the differentiable ring
    (parallel/ring_attention.py — ``ppermute`` transposes to the reverse
    ring in the backward pass, and the flash custom-VJP covers the local
    blocks); the tiny camera head and the losses run globally on the
    view-sharded logical arrays, with GSPMD inserting the reductions.

    Returns ``(init_fn, step_fn, place_batch)``.  ``step_fn(state, batch)``
    with batch = dict(images [N,H,W,3] f32 normalised, depth [N,H,W],
    extrinsics [N,3,4]), views sharded over ``axis`` (N divisible by the
    axis size).  Parameters are replicated (sp targets activation memory —
    the quadratic cross-view attention — not weight memory).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from da3slam_tpu.models import camera, dpt, vit

    tx = optax.adamw(learning_rate)
    view_spec = P(axis)

    def local_encode(params, imgs):
        taps, final, grid = vit.encode(
            params["encoder"], imgs, cfg,
            attn_impl="xla", dtype=dtype, cross_attn_impl=f"ring:{axis}",
        )
        H, W = imgs.shape[1], imgs.shape[2]
        depth, conf, _rays = dpt.apply_dpt(params["dpt"], taps, grid, (H, W), cfg)
        return depth, conf, final[:, 0, :]

    def loss_fn(params, batch):
        sharded = shard_map(
            local_encode,
            mesh=mesh,
            in_specs=(P(), view_spec),
            out_specs=(view_spec, view_spec, view_spec),
        )
        depth, conf, cam_tokens = sharded(params, batch["images"])
        H, W = batch["images"].shape[1], batch["images"].shape[2]
        ext, _intr = camera.apply_camera_head(
            params["camera"], cam_tokens, (H, W), ref_idx
        )
        return depth_loss(depth, conf, batch["depth"]) + pose_loss(
            ext, batch["extrinsics"]
        )

    def init_fn(seed: int = 0) -> TrainState:
        params = init_params(jax.random.PRNGKey(seed), cfg)
        params = jax.device_put(params, replicated(mesh))
        opt_state = tx.init(params)
        return _commit_state(
            tx, TrainState(params, opt_state, jnp.zeros((), jnp.int32)), mesh
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch) -> tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def place_batch(batch):
        return jax.device_put(batch, NamedSharding(mesh, view_spec))

    return init_fn, step_fn, place_batch


def make_pp_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    n_stages: int | None = None,
    learning_rate: float = 1e-4,
    dtype=jnp.float32,
    attn_impl: str = "xla",
):
    """Pipeline-parallel train step (GPipe): stage-sharded encoder blocks.

    The forward is ``pp_forward.make_pp_encode``'s microbatch ring; the
    backward needs no hand-written 1F1B schedule — ``jax.grad``
    differentiates straight through the ``shard_map``/``lax.scan``/
    ``ppermute`` pipeline, and the transposed ``ppermute`` runs the ring in
    reverse, which IS the synchronous GPipe backward (bubble
    ``2(S-1)/(M+S-1)``).  Stage weights, their grads, and their AdamW
    moments all live sharded over the ``pp`` axis — per-chip optimizer
    memory shrinks by the stage count, the point of pp for the giant tier.

    Loss: the DPT taps assembled from the stages feed the (replicated)
    depth head per microbatch; confidence-weighted SI-log depth loss.
    Batch = dict(images [M, N, H, W, 3] normalised, depth [M, N, H, W]).

    Returns ``(init_fn, step_fn, place_batch)``; state.params is
    ``(stage_params, rest, dpt)``.
    """
    from da3slam_tpu.models import dpt, vit
    from da3slam_tpu.parallel.pp_forward import make_pp_encode, split_encoder_params

    if n_stages is None:
        n_stages = mesh.shape["pp"]
    tx = optax.adamw(learning_rate)
    encode_pp = make_pp_encode(cfg, mesh, n_stages, attn_impl, dtype)

    def loss_fn(params, batch):
        stage_params, rest, dpt_params = params
        taps, _final = encode_pp(stage_params, rest, batch["images"])
        H, W = batch["images"].shape[2], batch["images"].shape[3]
        grid = (H // cfg.patch_size, W // cfg.patch_size)

        def head(taps_m):
            depth, conf, _rays = dpt.apply_dpt(
                dpt_params, list(taps_m), grid, (H, W), cfg
            )
            return depth, conf

        depth, conf = jax.vmap(head)(taps)  # [M, N, H, W]
        flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
        return depth_loss(flat(depth), flat(conf), flat(batch["depth"]))

    def init_fn(seed: int = 0) -> TrainState:
        full = init_params(jax.random.PRNGKey(seed), cfg)
        stage_params, rest = split_encoder_params(full["encoder"], n_stages, mesh)
        rest = jax.device_put(rest, replicated(mesh))
        dpt_params = jax.device_put(full["dpt"], replicated(mesh))
        params = (stage_params, rest, dpt_params)
        return _commit_state(
            tx, TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch) -> tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def place_batch(batch):
        return jax.device_put(batch, replicated(mesh))

    return init_fn, step_fn, place_batch


def synthetic_batch(cfg: ModelConfig, batch: int, n_views: int, hw: tuple[int, int], seed=0):
    """Tiny synthetic supervised batch for smoke tests / dryruns."""
    import numpy as np

    rng = np.random.default_rng(seed)
    H, W = hw
    return {
        "images": rng.normal(size=(batch, n_views, H, W, 3)).astype("float32"),
        "depth": rng.uniform(0.5, 3.0, size=(batch, n_views, H, W)).astype("float32"),
        "extrinsics": np.tile(
            np.eye(4, dtype="float32")[:3], (batch, n_views, 1, 1)
        ),
    }
