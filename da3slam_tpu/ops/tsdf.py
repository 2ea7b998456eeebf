"""TSDF volumetric fusion (device-resident, fixed-shape).

The reference fuses geometry by concatenating per-chunk point clouds
(utils/da3_streaming.py:664-690, viewer.py:317-356) — unbounded memory, no
surface.  This module adds the production alternative: a truncated signed
distance field updated in place on the device, one ``lax.scan`` over frames,
O(voxels) memory regardless of sequence length, meshable via
inout/mesh.py's marching-tetrahedra extractor.

TPU mapping: the grid lives in HBM as two ``[X, Y, Z]`` f32 arrays (sdf,
weight); each frame's update is one fused elementwise+gather pass over the
flattened voxel centers (project → nearest-pixel depth/conf lookup →
truncate → weighted running average).  No scatter is needed — the gather
direction (voxels → pixels) keeps every update a pure map, which XLA
vectorises cleanly (a splat/scatter formulation would serialise).

Conventions: w2c OpenCV extrinsics and zero-skew pinhole K, matching the
model contract (solver.py:174); sdf is stored in truncation-normalised
units (+1 free space → -1 behind surface), weights accumulate confidence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TSDFGrid(NamedTuple):
    """Volumetric state: ``sdf``/``weight`` are ``[X, Y, Z]`` f32; ``origin``
    is the world position of voxel (0,0,0)'s center; ``voxel`` the edge
    length; ``trunc`` the truncation distance (world units)."""

    sdf: jax.Array
    weight: jax.Array
    origin: jax.Array  # [3]
    voxel: jax.Array  # scalar
    trunc: jax.Array  # scalar


def make_grid(
    origin, size_xyz: tuple[int, int, int], voxel: float, trunc: float | None = None
) -> TSDFGrid:
    """Fresh grid: sdf=+1 (free), weight=0.  ``trunc`` defaults to 3 voxels."""
    if trunc is None:
        trunc = 3.0 * voxel
    return TSDFGrid(
        sdf=jnp.ones(size_xyz, jnp.float32),
        weight=jnp.zeros(size_xyz, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel=jnp.asarray(voxel, jnp.float32),
        trunc=jnp.asarray(trunc, jnp.float32),
    )


def grid_from_bounds(lo, hi, resolution: int = 192) -> TSDFGrid:
    """Grid covering the axis-aligned box [lo, hi] with ``resolution`` voxels
    along the longest axis (static shapes derived host-side)."""
    import numpy as np

    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    extent = np.maximum(hi - lo, 1e-6)
    voxel = float(extent.max() / resolution)
    size = tuple(int(n) for n in np.maximum(np.ceil(extent / voxel), 2).astype(int))
    return make_grid(lo, size, voxel)


def _voxel_centers_cam(grid: TSDFGrid, E_w2c: jax.Array) -> jax.Array:
    """World voxel centers transformed to the camera frame → ``[V, 3]``."""
    X, Y, Z = grid.sdf.shape
    ix = jnp.arange(X, dtype=jnp.float32)
    iy = jnp.arange(Y, dtype=jnp.float32)
    iz = jnp.arange(Z, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(ix, iy, iz, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    pts = pts * grid.voxel + grid.origin
    R, t = E_w2c[:3, :3], E_w2c[:3, 3]
    return pts @ R.T + t


def integrate(
    grid: TSDFGrid,
    depth: jax.Array,  # [H, W]
    conf: jax.Array,  # [H, W] (>= 0; used as the observation weight)
    K: jax.Array,  # [3, 3]
    E_w2c: jax.Array,  # [3, 4]
    max_weight: float = 64.0,
) -> TSDFGrid:
    """Fuse one depth frame into the grid (pure; jit/scan-safe).

    Per voxel: project its center; voxels that land on a valid pixel with
    positive depth get the truncated SDF observation
    ``clamp((d_pix - z_vox)/trunc, -1, 1)``; observations strictly behind
    the surface (< -1 before clamping) are occluded — not updated.  The
    running average is weighted by ``conf`` and capped at ``max_weight`` so
    the surface can still adapt late in a long sequence.
    """
    H, W = depth.shape
    cam = _voxel_centers_cam(grid, E_w2c)  # [V, 3]
    z = cam[:, 2]
    u = cam[:, 0] / jnp.maximum(z, 1e-9) * K[0, 0] + K[0, 2]
    v = cam[:, 1] / jnp.maximum(z, 1e-9) * K[1, 1] + K[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_img = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    ui = jnp.clip(ui, 0, W - 1)
    vi = jnp.clip(vi, 0, H - 1)

    flat = vi * W + ui
    d_pix = jnp.take(depth.reshape(-1), flat)
    w_pix = jnp.take(conf.reshape(-1), flat)

    sdf_obs = (d_pix - z) / grid.trunc
    valid = in_img & (d_pix > 1e-6) & (sdf_obs > -1.0)
    sdf_obs = jnp.clip(sdf_obs, -1.0, 1.0)

    w_obs = jnp.where(valid, jnp.maximum(w_pix, 0.0), 0.0)
    w_old = grid.weight.reshape(-1)
    s_old = grid.sdf.reshape(-1)
    w_new = w_old + w_obs
    s_new = jnp.where(
        w_new > 0.0, (s_old * w_old + sdf_obs * w_obs) / jnp.maximum(w_new, 1e-12),
        s_old,
    )
    w_new = jnp.minimum(w_new, max_weight)
    shape = grid.sdf.shape
    return grid._replace(sdf=s_new.reshape(shape), weight=w_new.reshape(shape))


@functools.partial(jax.jit, static_argnames=("max_weight",))
def integrate_frames(
    grid: TSDFGrid,
    depth: jax.Array,  # [N, H, W]
    conf: jax.Array,  # [N, H, W]
    K: jax.Array,  # [N, 3, 3]
    E_w2c: jax.Array,  # [N, 3, 4]
    max_weight: float = 64.0,
) -> TSDFGrid:
    """Fuse a stack of frames with one compiled ``lax.scan`` (the TSDF
    analogue of the SLAM pipeline's window scan)."""

    def body(g, xs):
        d, c, k, e = xs
        return integrate(g, d, c, k, e, max_weight=max_weight), None

    grid, _ = jax.lax.scan(body, grid, (depth, conf, K, E_w2c))
    return grid


def fuse_frames(
    depth,  # [T, H, W]
    conf,  # [T, H, W]
    K,  # [T, 3, 3]
    E_w2c,  # [T, 3, 4]
    resolution: int = 192,
    conf_floor: float = 1.0,
    max_weight: float = 64.0,
    margin: float = 0.05,
) -> TSDFGrid:
    """TSDF-fuse a stack of posed depth frames, bounds auto-estimated.

    Bounds come from a strided backprojection of the fused cloud (1%/99%
    quantiles + ``margin``, host side); confidence below ``conf_floor``
    contributes zero weight (the model's conf contract floor is 1.0,
    solver.py:125)."""
    import numpy as np

    from da3slam_tpu.core.geometry import backproject_depth

    depth = jnp.asarray(depth)
    conf = jnp.asarray(conf)
    K = jnp.asarray(K)
    E = jnp.asarray(E_w2c)

    pts = np.asarray(
        backproject_depth(depth[:, ::8, ::8], K, E)
    ).reshape(-1, 3)
    d8 = np.asarray(depth[:, ::8, ::8]).reshape(-1)
    ok = np.isfinite(pts).all(axis=1) & (d8 > 1e-6)
    lo = np.quantile(pts[ok], 0.01, axis=0) - margin
    hi = np.quantile(pts[ok], 0.99, axis=0) + margin
    grid = grid_from_bounds(lo, hi, resolution)

    w = jnp.maximum(conf - conf_floor, 0.0)
    return integrate_frames(grid, depth, w, K, E, max_weight=max_weight)


def fuse_pipeline_output(
    out,  # slam.pipeline.PipelineOutput
    resolution: int = 192,
    conf_floor: float = 1.0,
    max_weight: float = 64.0,
    margin: float = 0.05,
) -> TSDFGrid:
    """TSDF-fuse a full SLAM pipeline run (flattens the window axis)."""
    C, N = out.depth.shape[:2]
    return fuse_frames(
        jnp.asarray(out.depth).reshape(C * N, *out.depth.shape[2:]),
        jnp.asarray(out.conf).reshape(C * N, *out.conf.shape[2:]),
        jnp.asarray(out.intrinsics).reshape(C * N, 3, 3),
        jnp.asarray(out.extrinsics_global).reshape(C * N, 3, 4),
        resolution=resolution,
        conf_floor=conf_floor,
        max_weight=max_weight,
        margin=margin,
    )
