"""Multi-view ViT encoder (DINOv2-style) with alternating intra-/cross-view
attention — the DA3 backbone.

Functional style: parameters are plain pytrees (nested dicts / lists of
per-block dicts), ``apply`` functions are pure and jit-safe.  This keeps the
PyTorch→JAX weight mapping transparent (models/weights.py) and composes
directly with ``pjit`` sharding annotations (parallel/).

Token layout per view: ``[camera_token, register_tokens..., patch_tokens...]``.
Intra-view blocks attend over one view's tokens (batch = views); cross-view
blocks attend over the concatenation of all views' tokens — this is the
mechanism that makes depth/pose mutually consistent across a chunk (the
quadratic term bounded by the SLAM chunk size, SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from da3slam_tpu.models.config import ModelConfig
from da3slam_tpu.ops.attention import multi_head_attention

Params = Any  # nested dict pytree


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def init_encoder(key: jax.Array, cfg: ModelConfig, base_grid: int = 37) -> Params:
    """Initialise encoder params.  ``base_grid`` is the patch grid the learned
    pos-embed is stored at (37x37 = 518/14, the reference's default
    process_res, SURVEY.md §6)."""
    D = cfg.embed_dim
    hidden = cfg.mlp_hidden
    keys = iter(jax.random.split(key, 6 + cfg.depth))

    params: dict[str, Any] = {
        "patch_embed": {
            "kernel": _trunc_normal(next(keys), (cfg.patch_size, cfg.patch_size, 3, D)),
            "bias": jnp.zeros((D,)),
        },
        "pos_embed": _trunc_normal(next(keys), (base_grid, base_grid, D)),
        "camera_token": _trunc_normal(next(keys), (1, 1, D)),
        "register_tokens": _trunc_normal(next(keys), (1, cfg.num_register_tokens, D)),
        "norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }

    blocks = []
    for _ in range(cfg.depth):
        bk = iter(jax.random.split(next(keys), 4))
        if cfg.mlp_type == "swiglu":
            # DINOv2-giant's SwiGLUFFN: silu(x·wg)·(x·wv) → w3.  The released
            # checkpoints fuse gate+value into one ``mlp.w12`` tensor; we
            # store them separately so tensor parallelism can column-shard
            # gate and value IDENTICALLY (a fused [D, 2h] column shard would
            # place all of the gate on one device and all of the value on
            # another, forcing an all-to-all before the elementwise product).
            # models/torch_import.py splits/concats at the boundary.
            kg, kv = jax.random.split(next(bk))
            mlp = {
                "wg": _trunc_normal(kg, (D, hidden)),
                "bg": jnp.zeros((hidden,)),
                "wv": _trunc_normal(kv, (D, hidden)),
                "bv": jnp.zeros((hidden,)),
                "w3": _trunc_normal(next(bk), (hidden, D)),
                "b3": jnp.zeros((D,)),
            }
        else:
            mlp = {
                "w1": _trunc_normal(next(bk), (D, hidden)),
                "b1": jnp.zeros((hidden,)),
                "w2": _trunc_normal(next(bk), (hidden, D)),
                "b2": jnp.zeros((D,)),
            }
        blocks.append({
            "ln1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "attn": {
                "qkv_w": _trunc_normal(next(bk), (D, 3 * D)),
                "qkv_b": jnp.zeros((3 * D,)),
                "proj_w": _trunc_normal(next(bk), (D, D)),
                "proj_b": jnp.zeros((D,)),
            },
            "ls1": jnp.full((D,), cfg.layerscale_init),
            "ln2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "mlp": mlp,
            "ls2": jnp.full((D,), cfg.layerscale_init),
        })
    params["blocks"] = blocks
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def layer_norm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # LN in f32 for stability regardless of activation dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _attn_core(
    p: Params, qkv: jax.Array, num_heads: int, impl: str
) -> jax.Array:
    """Split/reshape → attention → out-projection (shared by the float and
    W8A8 QKV producers).  The out-projection stays float in both: its input
    is the attention output, with no preceding elementwise pass to fuse a
    quantize into (dynamic act-quant is a measured negative, ops/quant.py)."""
    B, S, D3 = qkv.shape
    D = D3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = D // num_heads
    q = q.reshape(B, S, num_heads, hd)
    k = k.reshape(B, S, num_heads, hd)
    v = v.reshape(B, S, num_heads, hd)
    out = multi_head_attention(q, k, v, impl=impl)
    out = out.reshape(B, S, D)
    return out @ p["proj_w"].astype(qkv.dtype) + p["proj_b"].astype(qkv.dtype)


def _attention(p: Params, x: jax.Array, num_heads: int, impl: str) -> jax.Array:
    """x: [B, S, D] → [B, S, D]."""
    qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    return _attn_core(p, qkv, num_heads, impl)


def _attention_w8a8(
    p: Params, x8: jax.Array, xs: jax.Array, dtype, num_heads: int, impl: str
) -> jax.Array:
    """QKV via pre-quantized int8×int8 GEMM (ops/quant.py); attention and
    out-projection run in ``dtype`` as usual."""
    from da3slam_tpu.ops.quant import int8_gemm

    qkv = int8_gemm(x8, xs, p["qkv_q"], p["qkv_b"], out_dtype=dtype)
    return _attn_core(p, qkv, num_heads, impl)


def _mlp(p: Params, x: jax.Array) -> jax.Array:
    if "wg" in p:  # SwiGLU (param structure is static under jit)
        g = x @ p["wg"].astype(x.dtype) + p["bg"].astype(x.dtype)
        v = x @ p["wv"].astype(x.dtype) + p["bv"].astype(x.dtype)
        h = jax.nn.silu(g) * v
        return h @ p["w3"].astype(x.dtype) + p["b3"].astype(x.dtype)
    h = x @ p["w1"].astype(x.dtype) + p["b1"].astype(x.dtype)
    h = jax.nn.gelu(h)
    return h @ p["w2"].astype(x.dtype) + p["b2"].astype(x.dtype)


def _mlp_w8a8(p: Params, x8: jax.Array, xs: jax.Array, dtype) -> jax.Array:
    """Both MLP GEMMs int8: the first consumes the layernorm's fused quant,
    the second a quantize fused into the nonlinearity's elementwise pass."""
    from da3slam_tpu.ops.quant import int8_gemm, quantize_rows

    if "wg_q" in p:
        g = int8_gemm(x8, xs, p["wg_q"], p["bg"], out_dtype=dtype)
        v = int8_gemm(x8, xs, p["wv_q"], p["bv"], out_dtype=dtype)
        h8, hs = quantize_rows(jax.nn.silu(g) * v)
        return int8_gemm(h8, hs, p["w3_q"], p["b3"], out_dtype=dtype)
    h = int8_gemm(x8, xs, p["w1_q"], p["b1"], out_dtype=dtype)
    h8, hs = quantize_rows(jax.nn.gelu(h))
    return int8_gemm(h8, hs, p["w2_q"], p["b2"], out_dtype=dtype)


def _block(
    p: Params, x: jax.Array, num_heads: int, cross_view: bool, impl: str,
    cross_impl: str | None = None,
) -> jax.Array:
    """x: [N, S, D] (N views).  Cross-view blocks fold views into one sequence.

    ``cross_impl`` lets cross-view blocks use a different attention backend
    (e.g. ``"ring:dp"`` under a view-sharded shard_map) while intra-view
    blocks stay local."""
    N, S, D = x.shape
    if cross_view:
        h = x.reshape(1, N * S, D)
        if cross_impl is not None:
            impl = cross_impl
    else:
        h = x
    if "qkv_q" in p["attn"]:  # W8A8 pytree (quantize_encoder_params) —
        # static under jit, like the SwiGLU dispatch in _mlp
        from da3slam_tpu.ops.quant import layer_norm_quant

        x8, xs = layer_norm_quant(p["ln1"], h)
        a = _attention_w8a8(p["attn"], x8, xs, x.dtype, num_heads, impl)
        h = h + a * p["ls1"].astype(x.dtype)
        m8, ms = layer_norm_quant(p["ln2"], h)
        m = _mlp_w8a8(p["mlp"], m8, ms, x.dtype)
    else:
        a = _attention(p["attn"], layer_norm(p["ln1"], h), num_heads, impl)
        h = h + a * p["ls1"].astype(x.dtype)
        m = _mlp(p["mlp"], layer_norm(p["ln2"], h))
    h = h + m * p["ls2"].astype(x.dtype)
    return h.reshape(N, S, D)


def interpolate_pos_embed(pos: jax.Array, hp: int, wp: int) -> jax.Array:
    """Bilinearly resample the learned ``[G, G, D]`` pos-embed grid to the
    actual patch grid (DINOv2-style resolution adaptation)."""
    if pos.shape[0] == hp and pos.shape[1] == wp:
        return pos.reshape(1, hp * wp, -1)
    out = jax.image.resize(pos, (hp, wp, pos.shape[-1]), method="bilinear")
    return out.reshape(1, hp * wp, -1)


def embed(
    params: Params, images: jax.Array, cfg: ModelConfig, dtype=jnp.float32
) -> tuple[jax.Array, tuple[int, int]]:
    """Pre-block stage: patch conv + pos embed + [camera, register] prefix.

    ``images: [N, H, W, 3]`` → ``([N, S, D] tokens, (Hp, Wp) patch grid)``.
    Shared by the sequential encoder (:func:`encode`) and the
    pipeline-parallel one (parallel/pp_forward.py) so the token layout
    cannot drift between them.
    """
    N, H, W, _ = images.shape
    P = cfg.patch_size
    hp, wp = H // P, W // P

    x = jax.lax.conv_general_dilated(
        images.astype(dtype),
        params["patch_embed"]["kernel"].astype(dtype),
        window_strides=(P, P),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(dtype)
    x = x.reshape(N, hp * wp, cfg.embed_dim)
    x = x + interpolate_pos_embed(params["pos_embed"], hp, wp).astype(dtype)

    cam = jnp.broadcast_to(
        params["camera_token"].astype(dtype), (N, 1, cfg.embed_dim)
    )
    reg = jnp.broadcast_to(
        params["register_tokens"].astype(dtype),
        (N, cfg.num_register_tokens, cfg.embed_dim),
    )
    return jnp.concatenate([cam, reg, x], axis=1), (hp, wp)  # [N, S, D]


def encode(
    params: Params,
    images: jax.Array,
    cfg: ModelConfig,
    attn_impl: str = "auto",
    dtype=jnp.float32,
    cross_attn_impl: str | None = None,
) -> tuple[list[jax.Array], jax.Array, tuple[int, int]]:
    """Run the encoder over a chunk of views.

    Args:
      images: ``[N, H, W, 3]`` float, ImageNet-normalised, H/W multiples of
              ``patch_size``.

    Returns:
      taps:   list of ``[N, S, D]`` activations at ``cfg.dpt_layers`` (post-block)
      final:  ``[N, S, D]`` final-norm output
      grid:   (Hp, Wp) patch grid
    """
    x, (hp, wp) = embed(params, images, cfg, dtype)

    taps: list[jax.Array] = []
    tap_set = set(cfg.dpt_layers)
    block_fn = _block
    if cfg.remat:
        # recompute block activations in the backward pass (trade FLOPs for
        # HBM when training the large/giant tiers)
        block_fn = jax.checkpoint(_block, static_argnums=(2, 3, 4, 5))
    for i, bp in enumerate(params["blocks"]):
        cross = (i % cfg.cross_view_interval) == (cfg.cross_view_interval - 1)
        x = block_fn(bp, x, cfg.num_heads, cross, attn_impl, cross_attn_impl)
        if i in tap_set:
            taps.append(x)

    final = layer_norm(params["norm"], x)
    return taps, final, (hp, wp)


def num_prefix_tokens(cfg: ModelConfig) -> int:
    return 1 + cfg.num_register_tokens
