"""Multi-head attention dispatch.

Single entry point used by the ViT so the implementation can be swapped per
backend: XLA's fused attention (excellent on TPU for moderate sequence
lengths) or the Pallas flash-attention kernel for long cross-view sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# above this the long-sequence flash path (streaming K/V blocks through
# VMEM) is used as-is (measured on v5e: 1.66x over XLA at S≈21k, the
# 16-frame cross-view shape)
FLASH_MIN_SEQ = 4096
# medium sequences (the intra-view S≈1.3k shape) also run the Pallas kernel,
# but as ONE S-sized block per (batch, head): XLA's fused attention
# materialises the full [B, H, S, S] f32 score tensor (650 MB at the
# 16-view intra shape — ~12 ms of the SMALL forward, profiled r3), while
# the one-block kernel keeps it in VMEM.  Below this floor the pad-to-128
# waste dominates and XLA wins.
FLASH_ONEBLOCK_MIN_SEQ = 512
# one-block scores are [S', S'] f32 in VMEM — cap so 2048^2 * 4 = 16.8 MiB
FLASH_ONEBLOCK_MAX = 2048


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


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
    S = q.shape[1]
    # the flash kernels ride the spare MXU lanes (D < 128) for the softmax
    # denominator; at D >= 128 that trick would double the matmul width,
    # so wide-head configs stay on XLA's fused path
    flash_ok = q.shape[-1] < 128 and jax.default_backend() == "tpu"
    use_flash = impl == "pallas" or (
        impl == "auto" and flash_ok and S >= FLASH_MIN_SEQ
    )
    one_block = (
        impl == "auto"
        and flash_ok
        and FLASH_ONEBLOCK_MIN_SEQ <= S < FLASH_MIN_SEQ
        and _round_up(S, 128) <= FLASH_ONEBLOCK_MAX
    )
    if use_flash or one_block:
        from da3slam_tpu.ops.flash_attention import flash_attention

        # stable=False: the max-free norm-bound forward (67 → 81 TF/s at
        # the cross-view hot shape).  Sound here by construction — every
        # q/k entering this dispatch comes out of the encoder's LayerNorm
        # + learned projections, whose activation norms sit orders of
        # magnitude below the bound-precision cliff the flash_attention
        # docstring describes.
        if one_block:
            b = _round_up(S, 128)
            return flash_attention(q, k, v, block_q=b, block_k=b, stable=False)
        return flash_attention(q, k, v, stable=False)
    return jax.nn.dot_product_attention(q, k, v)
