"""Debug visualisation helpers (reference utils.py:62-115): distinct
per-chunk colors and solid chunk coloring of image batches — the eyeball
check that chunk alignment is correct (used at main_align.py:92,113)."""

from __future__ import annotations

import colorsys

import numpy as np


def get_distinct_color(index: int, saturation: float = 0.85, value: float = 0.95) -> tuple[int, int, int]:
    """Deterministic well-separated RGB color for chunk ``index`` (golden-
    ratio hue stepping)."""
    hue = (index * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(hue, saturation, value)
    return int(r * 255), int(g * 255), int(b * 255)


def apply_chunk_color_to_images_batch(
    images: np.ndarray, chunk_index: int, blend: float = 0.6
) -> np.ndarray:
    """Tint a chunk's frames with its debug color.

    ``images``: ``[N, H, W, 3]`` uint8.  ``blend`` = 1 gives a solid fill
    (the reference's behavior); lower keeps image content visible.
    """
    color = np.asarray(get_distinct_color(chunk_index), np.float32)
    out = np.asarray(images, np.float32) * (1 - blend) + color * blend
    return np.clip(out, 0, 255).astype(np.uint8)
