"""Multi-head attention dispatch.

Single entry point used by the ViT so the implementation can be swapped per
backend: XLA's fused attention (excellent on TPU for moderate sequence
lengths) or the Pallas flash-attention kernel for long cross-view sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("impl",))
def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, impl: str = "auto"
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q, k, v: ``[B, S, H, Dh]``
      impl: "auto" | "xla" | "pallas"

    Returns ``[B, S, H, Dh]``.
    """
    if impl == "pallas":
        from da3slam_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)
