"""Multi-head attention dispatch.

Single entry point used by the ViT so the implementation can be swapped per
backend: XLA's fused attention (excellent on TPU for moderate sequence
lengths) or the Pallas flash-attention kernel for long cross-view sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# below this sequence length XLA's fused attention wins (dispatch-latency
# bound); above it the Pallas flash kernel wins by streaming K/V through
# VMEM (measured on v5e: 1.66x at S≈21k, the 16-frame cross-view shape)
FLASH_MIN_SEQ = 4096


@functools.partial(jax.jit, static_argnames=("impl",))
def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, impl: str = "auto"
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q, k, v: ``[B, S, H, Dh]``
      impl: "auto" (flash on TPU for long sequences, XLA otherwise) |
            "xla" | "pallas"

    Returns ``[B, S, H, Dh]``.
    """
    if impl.startswith("ring:"):
        # sequence-parallel: inside shard_map, K/V rotate over the named
        # mesh axis (parallel/ring_attention.py)
        from da3slam_tpu.parallel.ring_attention import ring_attention

        return ring_attention(q, k, v, impl.split(":", 1)[1])
    use_flash = impl == "pallas" or (
        impl == "auto"
        and q.shape[1] >= FLASH_MIN_SEQ
        # the flash kernels ride the spare MXU lanes (D < 128) for the
        # softmax denominator; at D >= 128 that trick would double the
        # matmul width, so wide-head configs stay on XLA's fused path
        and q.shape[-1] < 128
        and jax.default_backend() == "tpu"
    )
    if use_flash:
        from da3slam_tpu.ops.flash_attention import flash_attention

        # stable=False: the max-free norm-bound forward (67 → 81 TF/s at
        # the cross-view hot shape).  Sound here by construction — every
        # q/k entering this dispatch comes out of the encoder's LayerNorm
        # + learned projections, whose activation norms sit orders of
        # magnitude below the bound-precision cliff the flash_attention
        # docstring describes.
        return flash_attention(q, k, v, stable=False)
    return jax.nn.dot_product_attention(q, k, v)
