"""Pipeline-parallel (pp) encoder forward for the big DA3 tiers.

GPipe-style microbatch pipelining expressed the TPU way: the encoder's
block stack is split into ``n_stages`` contiguous stages whose parameters
are *stacked* along a leading stage axis and sharded over the mesh's
``pp`` axis — each device holds ``depth / n_stages`` blocks.  Microbatches
of view-chunks flow through a ``shard_map``: every pipeline tick each
stage applies its local blocks, then hands its activations to the next
stage with a single ``ppermute`` hop over ICI.  The classic GPipe bubble
applies: utilisation is ``M / (M + S - 1)`` for M microbatches on S
stages.

Two DA3-specific wrinkles, both handled on-device:

- **Alternating intra-/cross-view blocks.**  Whether a block is
  cross-view depends on its *global* index, which mixes the (traced)
  stage id with the (static) local offset — so each block applies via
  ``lax.cond`` on the computed flag instead of Python control flow.
- **DPT taps.**  The head reads activations from four interior layers
  (``cfg.dpt_layers``), which generally live on different stages.  Taps
  never travel the ring: each stage knows which microbatch it processes
  at tick t (``m = t - stage_id``) and writes its own layers' taps into a
  local ``[M, n_taps, ...]`` buffer (zeros for layers it doesn't own);
  the per-stage buffers are summed across the ``pp`` axis afterwards —
  tap slots are disjoint by construction, so the sum is an assembly, not
  a reduction.  Only the activations ride the ``ppermute``.

The giant tier (40 blocks, 1.5 GB bf16) fits one v5e chip, so pp is about
*scaling headroom* (weight memory per chip shrinks by the stage count)
and validating the full tp/pp/dp/sp story on the virtual mesh — see
``tests/test_pp_forward.py`` and ``__graft_entry__.dryrun_multichip``.

Reference parity note: the reference has no distributed story at all (its
model runs single-GPU through torch, SURVEY.md §5.8); this module is part
of the framework's TPU-native scale-out surface.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from da3slam_tpu.models.config import ModelConfig
from da3slam_tpu.models import vit


def split_encoder_params(params: Any, n_stages: int, mesh: Mesh | None = None):
    """Encoder params → (stage-stacked block pytree, rest).

    The block list becomes a pytree whose leaves have a leading
    ``[n_stages, depth // n_stages, ...]`` axis; with ``mesh`` given, the
    leaves are placed sharded over the mesh's ``pp`` axis (stage s's
    weights live only on pipeline rank s).
    """
    blocks = params["blocks"]
    depth = len(blocks)
    if depth % n_stages != 0:
        raise ValueError(f"n_stages={n_stages} must divide depth={depth}")
    per = depth // n_stages
    stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[s * per : (s + 1) * per])
        for s in range(n_stages)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
    if mesh is not None:
        spec = NamedSharding(mesh, P("pp"))
        stacked = jax.tree.map(lambda x: jax.device_put(x, spec), stacked)
    rest = {k: v for k, v in params.items() if k != "blocks"}
    return stacked, rest


def _embed(rest: Any, images: jax.Array, cfg: ModelConfig, dtype) -> jax.Array:
    """vit.embed for one microbatch (kept replicated — it is tiny)."""
    x, _grid = vit.embed(rest, images, cfg, dtype)
    return x


def make_pp_encode(
    cfg: ModelConfig,
    mesh: Mesh,
    n_stages: int | None = None,
    attn_impl: str = "xla",
    dtype=jnp.float32,
):
    """Build the pipelined encoder forward.

    Returns ``encode_pp(stage_params, rest, images_mb)`` with
    ``images_mb: [M, N, H, W, 3]`` (M microbatches of N views), producing
    ``(taps [M, n_taps, N, S, D], final [M, N, S, D])`` — the same
    contract as ``vit.encode`` per microbatch, so the DPT/camera heads
    apply unchanged downstream.
    """
    if n_stages is None:
        n_stages = mesh.shape["pp"]
    if mesh.shape["pp"] != n_stages:
        raise ValueError(
            f"mesh pp axis is {mesh.shape['pp']}, expected {n_stages} stages"
        )
    if cfg.depth % n_stages != 0:
        raise ValueError(f"n_stages={n_stages} must divide depth={cfg.depth}")
    per = cfg.depth // n_stages
    n_taps = len(cfg.dpt_layers)
    S = n_stages
    interval = cfg.cross_view_interval

    def apply_block(bp, x, is_cross):
        def cross_branch(args):
            bp_, x_ = args
            return vit._block(bp_, x_, cfg.num_heads, True, attn_impl)

        def intra_branch(args):
            bp_, x_ = args
            return vit._block(bp_, x_, cfg.num_heads, False, attn_impl)

        return jax.lax.cond(is_cross, cross_branch, intra_branch, (bp, x))

    if cfg.remat:
        # GPipe + remat: the backward recomputes each block from its input,
        # so jax.grad through the pipeline scan stores only the per-tick
        # ppermute activations instead of every intra-block intermediate —
        # the TPU-idiomatic route to 1F1B's activation-memory goal without
        # a hand-scheduled interleaved backward (see make_pp_train_step)
        apply_block = jax.checkpoint(apply_block)

    def stage_apply(local_blocks, x, stage_id):
        """Apply this device's ``per`` blocks; collect taps for the layers
        this stage owns (zeros elsewhere — slots are disjoint per stage)."""
        taps = jnp.zeros((n_taps,) + x.shape, x.dtype)
        for j in range(per):
            bp = jax.tree.map(lambda a, j=j: a[0, j], local_blocks)
            g = stage_id * per + j  # global block index (traced)
            is_cross = (g % interval) == (interval - 1)
            x = apply_block(bp, x, is_cross)
            for k, layer in enumerate(cfg.dpt_layers):
                taps = taps.at[k].set(jnp.where(g == layer, x, taps[k]))
        return x, taps

    def pp_body(stage_params, x_mb):
        """shard_map body: x_mb [M, N, S_tok, D] replicated; stage params
        local ``[1, per, ...]``.  GPipe schedule over M + S - 1 ticks."""
        stage_id = jax.lax.axis_index("pp")
        M = x_mb.shape[0]
        # vma checking is off (see shard_map below), so the carry buffers
        # need no explicit unvarying→varying pcast promotion
        vary = lambda a: a  # noqa: E731
        zeros_x = vary(jnp.zeros_like(x_mb[0]))
        outs_x = vary(jnp.zeros((M,) + x_mb.shape[1:], x_mb.dtype))
        outs_taps = vary(jnp.zeros((M, n_taps) + x_mb.shape[1:], x_mb.dtype))
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            prev_x, ox, ot = carry
            # hand the previous tick's activations one stage down the ring
            # (taps never travel: each stage keeps its own, merged after)
            in_x = jax.lax.ppermute(prev_x, "pp", perm)
            # stage 0 ingests microbatch t instead (clamped when drained)
            mb = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            in_x = jnp.where(stage_id == 0, mb, in_x)
            out_x, taps_local = stage_apply(stage_params, in_x, stage_id)
            # this stage processed microbatch m = t - stage_id at tick t
            m = t - stage_id
            m_valid = (m >= 0) & (m < M)
            idx = jnp.clip(m, 0, M - 1)
            ot = jax.lax.dynamic_update_index_in_dim(
                ot, jnp.where(m_valid, taps_local, ot[idx]), idx, 0
            )
            # the last stage's activation output completes microbatch m
            write = (stage_id == S - 1) & m_valid
            ox = jax.lax.dynamic_update_index_in_dim(
                ox, jnp.where(write, out_x, ox[idx]), idx, 0
            )
            return (out_x, ox, ot), None

        (_, outs_x, outs_taps), _ = jax.lax.scan(
            tick, (zeros_x, outs_x, outs_taps), jnp.arange(M + S - 1)
        )
        # expose per-stage buffers: outs_x is meaningful on the last stage
        # only; outs_taps holds each stage's own (disjoint) tap layers
        return outs_x[None], outs_taps[None]

    sharded = shard_map(
        pp_body,
        mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=(P("pp"), P("pp")),
        # the Pallas flash kernel's output ShapeDtypeStructs carry no vma
        # annotation, which trips the varying-axes checker on TPU when
        # attn_impl resolves to flash (same as run_pipeline_dp's forward)
        check_vma=False,
    )

    @functools.partial(jax.jit, static_argnames=())
    def encode_pp(stage_params, rest, images_mb):
        M = images_mb.shape[0]
        x_mb = jax.vmap(lambda im: _embed(rest, im, cfg, dtype))(images_mb)
        outs_x, outs_taps = sharded(stage_params, x_mb)
        final_x = outs_x[S - 1]  # [M, N, S_tok, D] from the last stage
        # assemble taps: stage buffers hold disjoint layer slots (zeros
        # elsewhere), so the stage-axis sum is a gather, not a reduction
        taps = outs_taps.sum(axis=0)  # [M, n_taps, N, S_tok, D]
        final = jax.vmap(lambda x: vit.layer_norm(rest["norm"], x))(final_x)
        return taps, final

    return encode_pp
