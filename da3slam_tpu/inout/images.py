"""Image path discovery + keyframe decimation (reference utils.py:7-55)."""

from __future__ import annotations

import glob
import os
from pathlib import Path

import numpy as np

IMAGE_EXTENSIONS = ("*.png", "*.jpg", "*.jpeg", "*.bmp", "*.tiff", "*.tif")


def load_image_paths(folder: str | Path) -> list[str]:
    """All images in a folder, sorted by the number embedded in the filename."""
    paths: list[str] = []
    for ext in IMAGE_EXTENSIONS:
        paths.extend(glob.glob(os.path.join(str(folder), ext)))

    def extract_number(p: str) -> int:
        stem = Path(p).stem
        digits = "".join(ch for ch in stem if ch.isdigit())
        return int(digits) if digits else 0

    paths.sort(key=extract_number)
    return paths


def extract_keyframes(paths: list[str], interval: int) -> list[str]:
    """Every ``interval``-th frame (reference utils.py:31)."""
    if interval <= 1:
        return list(paths)
    return list(paths[::interval])


def load_images(paths: list[str]) -> np.ndarray:
    """Decode to a stacked ``[N, H, W, 3]`` uint8 array (host-side)."""
    from PIL import Image

    frames = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    return np.stack(frames)
