"""Image resizing + normalisation for model ingest.

Implements the reference's ``process_res_method="upper_bound_resize"``
(observed contract: aspect-preserving resize so the max side ≤ process_res,
snapped to patch multiples — SURVEY.md §2.5, utils/da3_camara.py:25-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def upper_bound_shape(h: int, w: int, process_res: int = 504, patch: int = 14) -> tuple[int, int]:
    """Target (H, W): scale so max side ≤ process_res, snap to patch multiples.

    518×518 inputs at process_res=504 produce the typical 37×37 ViT-14 grid
    (SURVEY.md §6: "process_res 504 (snapped; 518×518 typical)").
    """
    scale = process_res / max(h, w)
    # floor-snap: rounding up could exceed process_res when it is not a
    # patch multiple, violating the documented upper bound
    th = max(int(h * scale) // patch, 1) * patch
    tw = max(int(w * scale) // patch, 1) * patch
    return th, tw


def resize_normalize(images: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """``[N, H, W, 3]`` uint8/float RGB → resized, ImageNet-normalised float.

    Pure JAX; runs on device as part of the jitted forward step.
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8 or (isinstance(images, np.ndarray) and images.dtype == np.uint8):
        x = x / 255.0
    N = x.shape[0]
    H, W = out_hw
    if (x.shape[1], x.shape[2]) != (H, W):
        x = jax.image.resize(x, (N, H, W, 3), method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def denormalize_to_uint8(images: jax.Array) -> jax.Array:
    """Inverse of ``resize_normalize`` normalisation → uint8 RGB."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (images * std + mean) * 255.0
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
