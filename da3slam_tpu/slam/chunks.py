"""Overlapping temporal chunking — the sequence-scaling mechanism.

The reference bounds quadratic cross-view attention cost by processing
overlapping windows (SURVEY.md §5.7): step = chunk_size - overlap, with the
tail window re-anchored so every window has the full chunk size
(align_geometry.py:371-392, utils/da3_streaming.py:308-320).
"""

from __future__ import annotations

from typing import Sequence, TypeVar

T = TypeVar("T")


def make_chunk_indices(
    n_frames: int, chunk_size: int, overlap: int
) -> list[tuple[int, int]]:
    """[start, end) index ranges; the last range is re-anchored to keep the
    full chunk size (so shapes stay static for XLA)."""
    if chunk_size <= overlap:
        raise ValueError(f"chunk_size ({chunk_size}) must exceed overlap ({overlap})")
    if n_frames <= chunk_size:
        return [(0, n_frames)]
    step = chunk_size - overlap
    ranges = []
    start = 0
    while start + chunk_size < n_frames:
        ranges.append((start, start + chunk_size))
        start += step
    ranges.append((n_frames - chunk_size, n_frames))
    return ranges


def make_image_chunks(
    items: Sequence[T], chunk_size: int, overlap: int
) -> list[list[T]]:
    """Materialised chunk lists (reference ``make_image_chunks``,
    align_geometry.py:371)."""
    return [list(items[a:b]) for a, b in make_chunk_indices(len(items), chunk_size, overlap)]
