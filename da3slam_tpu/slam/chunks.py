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


def run_chunked_alignment(
    model,
    paths: Sequence,
    chunk_size: int,
    overlap: int = 1,
    process_res: int = 504,
    align_config=None,
    collect_images: bool = False,
    verbose: bool = True,
    dedup_overlap: bool = False,
):
    """The shared chunked-inference + global-alignment loop of the offline
    CLIs (main_align / main_3dgs / main_mesh): run the model per chunk,
    chain each chunk into the global frame via single-overlap alignment,
    and return the concatenated arrays (overlap frames appear once per
    chunk, like the reference's per-chunk exports).

    ``dedup_overlap=True`` drops each non-initial chunk's leading overlap
    frames (``anchor + 1`` of them — more than ``overlap`` for the widened
    tail) before concatenation, so every physical frame appears exactly
    once.  Weighted consumers (TSDF fusion) want this: duplicated overlap
    observations double-weight chunk seams in the running average.

    The tail chunk is re-anchored to keep the full chunk size
    (:func:`make_chunk_indices`), which widens its overlap with its
    predecessor — ``anchor_idx = prev_end - 1 - tail_start`` keeps the
    alignment pairing physically correct (the same correction as
    solver.py's tail flush; anchor 0 would register depth maps of
    DIFFERENT frames and mis-place the whole tail).

    Returns dict(depth [T', H, W], conf, intrinsics, extrinsics_global,
    images (when requested), ranges).
    """
    import jax.numpy as jnp
    import numpy as np

    from da3slam_tpu.slam.alignment import (
        AlignmentConfig,
        align_chunk_single_overlap,
    )

    ranges = make_chunk_indices(len(paths), chunk_size, overlap)
    depths, confs, Ks, Es, imgs = [], [], [], [], []
    prev = None
    prev_overlap = None
    for k, (a, b) in enumerate(ranges):
        cur = model.inference(image=list(paths[a:b]), process_res=process_res)
        anchor = -1
        if k == 0:
            ext_global = np.asarray(cur.extrinsics, np.float32)
        else:
            anchor = ranges[k - 1][1] - 1 - a  # index of prev chunk's last frame
            out = align_chunk_single_overlap(
                prev_depth=jnp.asarray(prev.depth[-1]),
                prev_conf=jnp.asarray(prev.conf[-1]),
                prev_K=jnp.asarray(prev.intrinsics[-1]),
                cur_depth=jnp.asarray(cur.depth),
                cur_conf=jnp.asarray(cur.conf),
                cur_K=jnp.asarray(cur.intrinsics),
                cur_extrinsics=jnp.asarray(cur.extrinsics),
                prev_overlap_global=jnp.asarray(prev_overlap, jnp.float32),
                config=align_config or AlignmentConfig(),
                anchor_idx=np.int32(anchor),
            )
            ext_global = np.asarray(out.extrinsics_global, np.float32)
            cur.depth = np.asarray(out.depth_scaled)
        # first frame kept of this chunk (dedup drops the frames already
        # contributed by the previous chunk, incl. the widened tail overlap)
        s = anchor + 1 if dedup_overlap else 0
        depths.append(np.asarray(cur.depth)[s:])
        confs.append(np.asarray(cur.conf)[s:])
        Ks.append(np.asarray(cur.intrinsics)[s:])
        Es.append(ext_global[s:])
        if collect_images:
            imgs.append(np.asarray(cur.processed_images)[s:])
        prev, prev_overlap = cur, ext_global[-1]
        if verbose:
            print(f"chunk {k + 1}/{len(ranges)} done")

    out = {
        "depth": np.concatenate(depths),
        "conf": np.concatenate(confs),
        "intrinsics": np.concatenate(Ks),
        "extrinsics_global": np.concatenate(Es),
        "ranges": ranges,
    }
    if collect_images:
        out["images"] = np.concatenate(imgs)
    return out
