"""W8A8 int8 quantization for the encoder's projection GEMMs.

The v5e MXU runs int8 at 2x the bf16 rate, but *dynamically* quantizing a
GEMM's activations right before the matmul is a measured NEGATIVE on this
chip (tools/int8_gemm_probe.py, round 3: 85.8 TF/s vs bf16's 112.6 at the
LARGE encoder shape — the amax/round/cast passes don't fuse away).  With
PRE-quantized activations the same GEMM measured 147.8 TF/s (+31%).  This
module exploits that by fusing activation quantization into elementwise
passes the encoder already pays for:

  - ``layer_norm_quant``: the block layernorm emits int8 + per-token scale
    directly (it already runs a full f32 read/normalize pass per token; the
    epilogue amax/round/cast rides the same pass, and the int8 write is 4x
    smaller than the bf16 one it replaces)
  - the MLP's nonlinearity (GELU / SiLU-gate product) quantizes its output
    the same way, feeding the second MLP GEMM

so the QKV and both MLP GEMMs (11 of each block's 12 D² GEMM units) run
int8×int8→int32 with pre-staged inputs.  The attention out-projection stays
bf16: its input is the flash-attention output with no preceding elementwise
pass to hide the quantize in (the dynamic-quant regression would eat the
int8 win).  Attention itself stays bf16 too (int8 attention is a separate
measured negative, tools/int8_flash_probe.py).

Weights are quantized ONCE, offline, per output channel
(:func:`quantize_encoder_params`); activations per token (row), symmetric
round-to-nearest in both cases.  The quantized pytree keeps layernorm /
layerscale / bias tensors in f32 — only the big projection matrices change.

Reference relevance: the reference runs its torch model in bf16/fp16
autocast (da3_streaming.py:143-145) with no quantization; this is a
TPU-native optimization beyond it, opt-in via
``DepthAnything3.from_pretrained(..., quant="w8a8")`` / bench
``forward_fps_large_w8a8``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any

_QMAX = 127.0


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row (per-token) int8 quantization.

    ``x: [..., D]`` → ``(int8 values [..., D], f32 scales [..., 1])`` with
    ``x ≈ values * scales``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / _QMAX
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def quantize_weight(w: jax.Array) -> dict[str, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a ``[D_in, D_out]``
    projection matrix (done once at load time, not in the forward)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / _QMAX
    q = jnp.clip(jnp.round(wf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return {"w8": q, "wscale": scale[0]}  # wscale: [D_out]


def int8_gemm(
    x8: jax.Array,
    xscale: jax.Array,
    wq: dict[str, jax.Array],
    bias: jax.Array | None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """``(x8 · w8) * xscale * wscale + bias`` — int8×int8→int32 on the MXU,
    one f32 rescale over the output (negligible next to the matmul)."""
    acc = jax.lax.dot_general(
        x8, wq["w8"],
        dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (xscale * wq["wscale"])
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def layer_norm_quant(
    p: Params, x: jax.Array, eps: float = 1e-6
) -> tuple[jax.Array, jax.Array]:
    """vit.layer_norm with the int8 quantize fused as its epilogue.

    Same math as :func:`da3slam_tpu.models.vit.layer_norm` (f32 mean/var),
    then per-token symmetric int8.  Returns ``(int8 [..., D], f32 scale
    [..., 1])``."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    amax = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / _QMAX
    q = jnp.clip(jnp.round(out / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def quantize_encoder_params(enc: Params) -> Params:
    """Pre-quantize an encoder pytree's projection GEMM weights.

    Per block: ``attn.qkv_w`` and the MLP matrices (``w1``/``w2`` or SwiGLU
    ``wg``/``wv``/``w3``) become ``{"w8", "wscale"}`` int8 pairs; the
    attention out-projection, norms, layerscales, biases, and embeddings
    stay float.  The returned tree's *structure* tells the forward which
    path to take (static under jit, like the SwiGLU dispatch)."""
    out = dict(enc)
    blocks = []
    for bp in enc["blocks"]:
        b = dict(bp)
        attn = dict(bp["attn"])
        attn["qkv_q"] = quantize_weight(attn.pop("qkv_w"))
        b["attn"] = attn
        mlp = dict(bp["mlp"])
        for k in ("w1", "w2", "wg", "wv", "w3"):
            if k in mlp:
                mlp[k + "_q"] = quantize_weight(mlp.pop(k))
        b["mlp"] = mlp
        blocks.append(b)
    out["blocks"] = blocks
    return out
