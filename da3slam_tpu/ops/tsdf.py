"""TSDF volumetric fusion (device-resident, fixed-shape).

The reference fuses geometry by concatenating per-chunk point clouds
(utils/da3_streaming.py:664-690, viewer.py:317-356) — unbounded memory, no
surface.  This module adds the production alternative: a truncated signed
distance field updated in place on the device, one ``lax.scan`` over frames,
O(voxels) memory regardless of sequence length, meshable via
inout/mesh.py's marching-tetrahedra extractor.

TPU mapping — two paths:
  * DENSE (``integrate_frames``): each frame is one fused elementwise +
    gather pass over every voxel center (project → nearest-pixel
    depth/conf lookup → truncate → weighted running average).  The gather
    direction (voxels → pixels) keeps the update a pure map; a
    splat/scatter formulation measures ~2x slower per element on a v5e.
  * BLOCK-SPARSE (``integrate_frames_sparse``): the voxel-hashing
    formulation — only blocks that can intersect a truncation band are
    gathered, updated, and scattered back (see the section comment below).
    5-10x faster at production grid sizes; band-only semantics.
Both paths batch several frames per dispatch where it pays, and the sparse
path unrolls its step loop instead of using ``lax.scan``: on the v5e a
scan copies a multi-MB carry every step at ~1 GB/s (measured), which would
dominate the fusion entirely.

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
    length; ``trunc`` the truncation distance (world units).  ``color``
    (optional, ``[X, Y, Z, 3]`` f32 in 0..255) accumulates with the same
    weights when frames are integrated with images."""

    sdf: jax.Array
    weight: jax.Array
    origin: jax.Array  # [3]
    voxel: jax.Array  # scalar
    trunc: jax.Array  # scalar
    # premultiplied color accumulator [X, Y, Z, 4]: (sum w*rgb, sum w).
    # Color keeps its OWN weight sum — near-surface observations only, so
    # normalising by the sdf weight (which also counts free-space hits)
    # would bias early-seen voxels toward black.
    color: jax.Array | None = None


def make_grid(
    origin,
    size_xyz: tuple[int, int, int],
    voxel: float,
    trunc: float | None = None,
    with_color: bool = False,
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
        color=jnp.zeros((*size_xyz, 4), jnp.float32) if with_color else None,
    )


def grid_from_bounds(
    lo, hi, resolution: int = 192, with_color: bool = False
) -> TSDFGrid:
    """Grid covering the axis-aligned box [lo, hi] with ``resolution`` voxels
    along the longest axis (static shapes derived host-side)."""
    import numpy as np

    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    extent = np.maximum(hi - lo, 1e-6)
    voxel = float(extent.max() / resolution)
    size = tuple(int(n) for n in np.maximum(np.ceil(extent / voxel), 2).astype(int))
    return make_grid(lo, size, voxel, with_color=with_color)


def _voxel_centers_world(grid: TSDFGrid) -> jax.Array:
    """World voxel centers ``[V, 3]`` (constant across frames — hoist out of
    per-frame bodies so the scan doesn't rebuild the meshgrid every step)."""
    X, Y, Z = grid.sdf.shape
    ix = jnp.arange(X, dtype=jnp.float32)
    iy = jnp.arange(Y, dtype=jnp.float32)
    iz = jnp.arange(Z, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(ix, iy, iz, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    return pts * grid.voxel + grid.origin


def _voxel_centers_cam(
    grid: TSDFGrid, E_w2c: jax.Array, pts_world: jax.Array | None = None
) -> jax.Array:
    """World voxel centers transformed to the camera frame → ``[V, 3]``.

    The transform is written elementwise rather than as ``pts @ R.T``: a
    [V, 3] x [3, 3] matmul pads its 3-deep/3-wide contraction onto the
    128x128 MXU (~40x wasted work at multi-million-voxel grids); nine
    broadcast FMAs fuse into the projection's VPU passes instead."""
    if pts_world is None:
        pts_world = _voxel_centers_world(grid)
    return _transform_points(E_w2c, pts_world)


def _transform_points(E_w2c: jax.Array, pts_world: jax.Array) -> jax.Array:
    """Rigid transform ``[..., 3] → [..., 3]`` as nine broadcast FMAs (a
    [V, 3] x [3, 3] matmul would pad its 3-deep contraction onto the
    128x128 MXU; the FMAs fuse into the projection's VPU passes)."""
    R, t = E_w2c[:3, :3], E_w2c[:3, 3]
    x, y, z = pts_world[..., 0], pts_world[..., 1], pts_world[..., 2]
    return jnp.stack(
        [
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0],
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1],
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2],
        ],
        axis=-1,
    )


def integrate(
    grid: TSDFGrid,
    depth: jax.Array,  # [H, W]
    conf: jax.Array,  # [H, W] (>= 0; used as the observation weight)
    K: jax.Array,  # [3, 3]
    E_w2c: jax.Array,  # [3, 4]
    max_weight: float = 64.0,
    image: jax.Array | None = None,  # [H, W, 3] (needs grid.color)
    pts_world: jax.Array | None = None,  # precomputed [V, 3] voxel centers
    band_only: bool = False,
) -> TSDFGrid:
    """Fuse one depth frame into the grid (pure; jit/scan-safe).

    Per voxel: project its center; voxels that land on a valid pixel with
    positive depth get the truncated SDF observation
    ``clamp((d_pix - z_vox)/trunc, -1, 1)``; observations strictly behind
    the surface (< -1 before clamping) are occluded — not updated.  The
    running average is weighted by ``conf`` and capped at ``max_weight`` so
    the surface can still adapt late in a long sequence.

    ``band_only=True`` restricts updates to the truncation band
    (``|d_pix - z_vox| <= trunc``), skipping the free-space ``+1``
    observations in front of it — the voxel-hashing TSDF semantics, and
    the exact dense oracle for :func:`integrate_frames_sparse`.
    """
    H, W = depth.shape
    cam = _voxel_centers_cam(grid, E_w2c, pts_world)  # [V, 3]
    z = cam[:, 2]
    u = cam[:, 0] / jnp.maximum(z, 1e-9) * K[0, 0] + K[0, 2]
    v = cam[:, 1] / jnp.maximum(z, 1e-9) * K[1, 1] + K[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_img = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    ui = jnp.clip(ui, 0, W - 1)
    vi = jnp.clip(vi, 0, H - 1)

    flat = vi * W + ui
    # ONE gather for depth+conf (TPU gathers are per-element; packing the
    # lookups into [H*W, 2] rows halves the dominant cost of the update)
    dc = jnp.take(
        jnp.stack([depth.reshape(-1), conf.reshape(-1)], axis=-1), flat, axis=0
    )
    d_pix, w_pix = dc[:, 0], dc[:, 1]

    sdf_obs = (d_pix - z) / grid.trunc
    valid = in_img & (d_pix > 1e-6) & (sdf_obs > -1.0)
    if band_only:
        valid = valid & (sdf_obs <= 1.0)
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

    color = grid.color
    if color is not None and image is not None:
        c_pix = jnp.take(
            image.reshape(-1, 3).astype(jnp.float32), flat, axis=0
        )  # [V, 3]
        # color only accumulates NEAR the surface (|sdf| < 1): free-space
        # voxels would otherwise average in whatever pixel they project to
        w_col = jnp.where(jnp.abs(sdf_obs) < 1.0, w_obs, 0.0)[:, None]
        c = color.reshape(-1, 4)
        c = c.at[:, :3].add(c_pix * w_col)
        c = c.at[:, 3:].add(w_col)
        color = c.reshape(*shape, 4)
    return grid._replace(
        sdf=s_new.reshape(shape), weight=w_new.reshape(shape), color=color
    )


@functools.partial(jax.jit, static_argnames=("max_weight",))
def integrate_frames(
    grid: TSDFGrid,
    depth: jax.Array,  # [N, H, W]
    conf: jax.Array,  # [N, H, W]
    K: jax.Array,  # [N, 3, 3]
    E_w2c: jax.Array,  # [N, 3, 4]
    max_weight: float = 64.0,
    images: jax.Array | None = None,  # [N, H, W, 3] (needs grid.color)
) -> TSDFGrid:
    """Fuse a stack of frames with one compiled ``lax.scan`` (the TSDF
    analogue of the SLAM pipeline's window scan)."""

    pts_world = _voxel_centers_world(grid)  # constant: built once, not per step
    if images is None:

        def body(g, xs):
            d, c, k, e = xs
            return integrate(g, d, c, k, e, max_weight=max_weight,
                             pts_world=pts_world), None

        grid, _ = jax.lax.scan(body, grid, (depth, conf, K, E_w2c))
    else:

        def body_img(g, xs):
            d, c, k, e, im = xs
            return integrate(g, d, c, k, e, max_weight=max_weight, image=im,
                             pts_world=pts_world), None

        grid, _ = jax.lax.scan(body_img, grid, (depth, conf, K, E_w2c, images))
    return grid


# ---------------------------------------------------------------------------
# Block-sparse fusion
#
# The dense update gathers depth/conf once per voxel — gather-rate bound at
# ~7-14 ns/voxel, while only ~1-5% of voxels lie near any surface.  The
# sparse path is the voxel-hashing formulation (Niessner-style, TPU-shaped):
# per frame it (1) tests every bs^3 BLOCK against a pooled min/max depth
# pyramid (conservative truncation-band intersection), (2) compacts the
# active blocks to a FIXED budget with one small argsort (static shapes —
# no dynamic allocation), (3) row-gathers just those blocks' sdf/weight
# from the HBM-resident blocked grid, runs the per-voxel update on
# budget*bs^3 voxels instead of all of them, and row-scatters back.
# Semantics are band-only (``integrate(band_only=True)`` is the exact dense
# oracle): free-space voxels outside the truncation band keep sdf=+1/w=0,
# which the zero-crossing mesher never looks at anyway.  ``carve=True``
# restores the dense path's free-space carving for OCCUPIED blocks (the
# only place a free-space observation changes anything — on sdf=+1/w=0
# voxels it is value-neutral): spurious early surfaces contradicted by
# later observations get erased; measured cost ~1% on the bench scene.
# ---------------------------------------------------------------------------

_POOL_T0 = 16  # finest min/max depth tile, pixels
_POOL_LEVELS = 4  # coarsest tile = 16 * 2**3 = 128 px


def _depth_minmax_pyramid(depth: jax.Array, conf: jax.Array | None = None):
    """Per-frame min/max depth pyramid for the block activity test.

    Levels l=0..3 pool valid depth over (16*2^l)^2 pixel tiles; every
    level is replicated back to the finest tile grid so one flat
    ``[L*Ht*Wt, 2]`` table serves data-dependent per-block level lookups.
    Invalid pixels pool to (+inf, -inf) → an all-invalid tile intersects
    no band and stays inactive.

    ``conf`` (the observation weight) tightens validity to ``conf > 0``
    pixels — EXACT, not approximate: a zero-weight observation is a no-op
    in the dense update, so blocks whose covering pixels all carry zero
    weight can be skipped outright.  On low-confidence inference depth
    this is the single biggest activity cut."""
    H, W = depth.shape
    coarse = _POOL_T0 * 2 ** (_POOL_LEVELS - 1)
    Hp = -(-H // coarse) * coarse
    Wp = -(-W // coarse) * coarse
    valid = depth > 1e-6
    if conf is not None:
        valid = valid & (conf > 0.0)
    dmin = jnp.full((Hp, Wp), jnp.inf, jnp.float32)
    dmin = dmin.at[:H, :W].set(jnp.where(valid, depth, jnp.inf))
    dmax = jnp.full((Hp, Wp), -jnp.inf, jnp.float32)
    dmax = dmax.at[:H, :W].set(jnp.where(valid, depth, -jnp.inf))
    Ht, Wt = Hp // _POOL_T0, Wp // _POOL_T0
    lv_min = dmin.reshape(Ht, _POOL_T0, Wt, _POOL_T0).min(axis=(1, 3))
    lv_max = dmax.reshape(Ht, _POOL_T0, Wt, _POOL_T0).max(axis=(1, 3))
    levels = []
    for lvl in range(_POOL_LEVELS):
        if lvl:
            h, w = lv_min.shape
            lv_min = lv_min.reshape(h // 2, 2, w // 2, 2).min(axis=(1, 3))
            lv_max = lv_max.reshape(h // 2, 2, w // 2, 2).max(axis=(1, 3))
        rep = 2**lvl
        up = lambda a: jnp.repeat(jnp.repeat(a, rep, axis=0), rep, axis=1)
        levels.append(jnp.stack([up(lv_min), up(lv_max)], axis=-1))
    return jnp.stack(levels).reshape(_POOL_LEVELS * Ht * Wt, 2), (Ht, Wt)


def _block_activity(
    centers_world: jax.Array,  # [NB, 3]
    half_extent: jax.Array,  # scalar: half the block diagonal per axis bound
    depth_hw: tuple[int, int],
    K: jax.Array,
    E_w2c: jax.Array,
    pyramid: jax.Array,  # [L*Ht*Wt, 2]
    tiles_hw: tuple[int, int],
    trunc: jax.Array,
    occupied: jax.Array | None = None,  # [NB] bool — carve mode
) -> jax.Array:
    """Conservative per-block activity: does any voxel of the block possibly
    fall inside the truncation band of any pixel it projects to?

    The block is an axis-aligned world cube of half-edge ``half_extent``;
    its camera-space extent per axis is bounded by the L1 norm of the
    corresponding rotation row: |x_p - x_c| <= h * ||R_0||_1, etc — ~20%
    tighter than the isotropic circumradius.  Pixel-footprint bound per
    axis (exact, not the small-angle guess): from
    u_p - u_c = fx[(x_p-x_c)/z_p + x_c(1/z_p - 1/z_c)],
    |u_p - u_c| <= (fx*xh + |u_c - cx|*zh) / z_min with z_min = z_c - zh.
    The pyramid level l is picked so the footprint bbox spans at most TWO
    level-l tiles per axis (2*rho <= 16*2^l); the FOUR bbox-corner lookups
    then cover the whole bbox — tighter than a fixed 3x3 center
    neighborhood (less min/max dilution from unrelated pixels) and 2.25x
    fewer gathers.  Blocks too close for even the coarsest level (or
    straddling the camera plane) are unconditionally active.

    ``occupied`` (free-space carving, VERDICT r4 #8): blocks that already
    hold weight stay active whenever any of their voxels could receive an
    observation at all — i.e. the back-side band bound alone,
    ``z - zh <= dmax + trunc`` — so the clipped ``+1`` free-space
    observations in front of the surface reach (and erase) spurious early
    surfaces that later frames contradict, the dense ``band_only=False``
    semantics."""
    H, W = depth_hw
    Ht, Wt = tiles_hw
    cam = _transform_points(E_w2c, centers_world)
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    eps = 1e-6
    R = E_w2c[:3, :3]
    l1 = jnp.sum(jnp.abs(R), axis=1)  # [3] per-camera-axis L1 row norms
    xh = half_extent * l1[0]
    yh = half_extent * l1[1]
    zh = half_extent * l1[2]
    zs = jnp.maximum(z, eps)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = x / zs * fx + cx
    v = y / zs * fy + cy
    zmin = jnp.maximum(z - zh, eps)
    # +0.5: the per-voxel observation samples depth at round(u), which can
    # land up to half a pixel beyond the continuous projection — without
    # the margin a voxel whose rounded pixel crosses a tile boundary can
    # read a tile the bbox corners never covered (missed active block)
    rho_u = (fx * xh + jnp.abs(u - cx) * zh) / zmin + 0.5
    rho_v = (fy * yh + jnp.abs(v - cy) * zh) / zmin + 0.5
    rho = jnp.maximum(rho_u, rho_v)

    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(2.0 * rho, 1.0) / _POOL_T0)),
        0,
        _POOL_LEVELS - 1,
    ).astype(jnp.int32)
    base = lvl * (Ht * Wt)
    dmin = jnp.full(z.shape, jnp.inf, jnp.float32)
    dmax = jnp.full(z.shape, -jnp.inf, jnp.float32)
    for du in (-1.0, 1.0):
        for dv in (-1.0, 1.0):
            xx = jnp.clip(
                jnp.floor((u + du * rho_u) / _POOL_T0).astype(jnp.int32),
                0, Wt - 1,
            )
            yy = jnp.clip(
                jnp.floor((v + dv * rho_v) / _POOL_T0).astype(jnp.int32),
                0, Ht - 1,
            )
            mm = jnp.take(pyramid, base + yy * Wt + xx, axis=0)
            dmin = jnp.minimum(dmin, mm[..., 0])
            dmax = jnp.maximum(dmax, mm[..., 1])

    in_front = (z + zh) > eps
    straddle = (z - zh) <= eps  # center projection unusable
    in_img = (
        (u >= -rho_u - 1.0)
        & (u <= W + rho_u)
        & (v >= -rho_v - 1.0)
        & (v <= H + rho_v)
    )
    front_ok = (z - zh) <= dmax + trunc
    back_ok = (z + zh) >= dmin - trunc
    if occupied is not None:
        # carve: occupied blocks need only the front-side bound (their
        # free-space voxels get the clipped +1 observation); empty blocks
        # keep the full band test — a free-space update on sdf=+1/w=0 is
        # value-neutral, so skipping it loses nothing but a weight prior.
        band = front_ok & (occupied | back_ok)
    else:
        band = front_ok & back_ok
    too_big = 2.0 * rho > _POOL_T0 * 2 ** (_POOL_LEVELS - 1)
    return in_front & (straddle | (in_img & (band | too_big)))


def _block_layout(a: jax.Array, bs: int, pad_value: float) -> jax.Array:
    """[X, Y, Z(, C)] → [NB, bs^3(, C)] blocked layout (padded to multiples
    of ``bs`` with ``pad_value``), plus one trailing dummy row for the
    inactive-slot scatter sentinel."""
    X, Y, Z = a.shape[:3]
    trail = a.shape[3:]
    pads = [(0, -X % bs), (0, -Y % bs), (0, -Z % bs)] + [(0, 0)] * len(trail)
    a = jnp.pad(a, pads, constant_values=pad_value)
    Xp, Yp, Zp = a.shape[:3]
    a = a.reshape(Xp // bs, bs, Yp // bs, bs, Zp // bs, bs, *trail)
    a = a.transpose(0, 2, 4, 1, 3, 5, *range(6, 6 + len(trail)))
    nb = (Xp // bs) * (Yp // bs) * (Zp // bs)
    a = a.reshape(nb, bs**3, *trail)
    dummy = jnp.full((1, bs**3, *trail), pad_value, a.dtype)
    return jnp.concatenate([a, dummy], axis=0)


def _unblock(a: jax.Array, dims: tuple[int, int, int], bs: int) -> jax.Array:
    """Inverse of :func:`_block_layout` (drops the dummy row + padding)."""
    X, Y, Z = dims
    bx, by, bz = -(-X // bs), -(-Y // bs), -(-Z // bs)
    trail = a.shape[2:]
    a = a[:-1].reshape(bx, by, bz, bs, bs, bs, *trail)
    a = a.transpose(0, 3, 1, 4, 2, 5, *range(6, 6 + len(trail)))
    a = a.reshape(bx * bs, by * bs, bz * bs, *trail)
    return a[:X, :Y, :Z]


def _block_meta(bdims, bs, voxel, origin):
    """Hoisted per-grid constants: block centers (world), circumradius,
    in-block voxel offsets."""
    BX, BY, BZ = bdims
    nb = BX * BY * BZ
    bi = jnp.arange(nb, dtype=jnp.int32)
    bxyz = jnp.stack([bi // (BY * BZ), (bi // BZ) % BY, bi % BZ], axis=-1)
    centers = (bxyz.astype(jnp.float32) * bs + (bs - 1) / 2.0) * voxel + origin
    half_extent = jnp.float32(0.5 * (bs - 1)) * voxel  # voxel-center cube
    o = jnp.arange(bs, dtype=jnp.float32)
    ox, oy, oz = jnp.meshgrid(o, o, o, indexing="ij")
    offs = jnp.stack([ox, oy, oz], axis=-1).reshape(bs**3, 3)
    return centers, half_extent, offs


def _tiles_hw(hw):
    coarse = _POOL_T0 * 2 ** (_POOL_LEVELS - 1)
    return (
        (-(-hw[0] // coarse) * coarse) // _POOL_T0,
        (-(-hw[1] // coarse) * coarse) // _POOL_T0,
    )


@functools.partial(
    jax.jit, static_argnames=("bdims", "block_size", "hw", "carve")
)
def _count_active_impl(
    origin, voxel, trunc, depth, conf, K, E_w2c,
    bdims: tuple[int, int, int], block_size: int, hw: tuple[int, int],
    occ0=None, carve: bool = False,
):
    """True per-frame active-block counts (the cheap activity-only pass
    behind ``active_blocks=None`` auto-sizing).

    ``carve`` threads a conservative occupancy accumulator through the
    scan: a block MAY be occupied by frame i if it started occupied
    (``occ0``, from the grid's initial weights) or was band-active in any
    earlier frame — a superset of true occupancy (activity does not imply
    weight was written), so the returned counts upper-bound the carve
    path's true per-frame active sets and the auto-sized budget never
    drops blocks."""
    centers, half_extent, _ = _block_meta(bdims, block_size, voxel, origin)
    tiles = _tiles_hw(hw)

    def body(occ, xs):
        d, c, k, e = xs
        pyr, _t = _depth_minmax_pyramid(d, c)
        a = _block_activity(centers, half_extent, hw, k, e, pyr, tiles,
                            trunc, occupied=occ)
        occ_next = (occ | a) if carve else occ
        return occ_next, a.sum()

    occ = occ0 if carve else None
    _, counts = jax.lax.scan(body, occ, (depth, conf, K, E_w2c))
    return counts


@functools.partial(
    jax.jit,
    static_argnames=("bdims", "block_size", "active_blocks", "max_weight",
                     "hw", "batch", "carve"),
)
def _integrate_sparse_impl(
    sdf_b,  # [NB+1, B3]
    w_b,  # [NB+1, B3]
    col_b,  # [NB+1, B3, 4] | None
    origin,
    voxel,
    trunc,
    depth,  # [N, H, W] with N % batch == 0
    conf,  # [N, H, W]
    K,  # [N, 3, 3]
    E_w2c,  # [N, 3, 4]
    images,  # [N, H, W, 3] | None
    bdims: tuple[int, int, int],
    block_size: int,
    active_blocks: int,
    max_weight: float,
    hw: tuple[int, int],
    batch: int,
    carve: bool = False,
):
    bs = block_size
    BX, BY, BZ = bdims
    nb = BX * BY * BZ
    H, W = hw
    b3 = bs**3
    n = depth.shape[0]
    steps = n // batch
    centers, half_extent, offs = _block_meta(bdims, bs, voxel, origin)
    tiles = _tiles_hw(hw)

    # pack sdf|weight into one [NB+1, 2*B3] array: ONE row gather + ONE row
    # scatter per frame, and 128-lane-aligned rows even at bs=4 (B3=64)
    sw_b = jnp.concatenate([sdf_b, w_b], axis=1)

    def body(sw_b, col_b, d, c, k, e, img):
        # One step handles `batch` frames: activity/selection and the
        # per-voxel observation math are frame-independent, so they batch
        # — crucially the depth/conf lookup becomes ONE big gather (the
        # per-gather dispatch overhead, ~2-3 ms on a v5e, would otherwise
        # be paid per frame).  Only the tiny row-granular state updates
        # stay sequential, which keeps results bit-identical to the
        # frame-at-a-time semantics.
        pyr, _t = jax.vmap(_depth_minmax_pyramid)(d, c)
        # carve: occupancy snapshot at dispatch granularity — a block
        # filled by frame i of this batch is carve-eligible from the NEXT
        # batch on (≤`batch`-frame latency; exact at batch=1)
        occ = (sw_b[:-1, b3:] > 0.0).any(axis=1) if carve else None
        active = jax.vmap(
            lambda kk, ee, pp: _block_activity(
                centers, half_extent, (H, W), kk, ee, pp, tiles, trunc,
                occupied=occ,
            )
        )(k, e, pyr)  # [B, NB]
        n_active = active.sum(axis=1)
        # fixed-budget compaction WITHOUT a sort: cumsum gives each active
        # block its output slot, one drop-mode scatter writes the ids
        # (within-bounds slots are unique per row, overflow and inactive
        # land out of bounds at slot A).  Selects the exact same id set as
        # the previous stable-argsort-and-slice — ascending block index —
        # at O(NB) VPU work instead of an O(NB log NB) lane-shuffling sort
        # (~0.3 ms of the ~1.9 ms/frame support passes, ROADMAP r4).
        pos = jnp.cumsum(active, axis=-1) - 1  # [B, NB]
        dest = jnp.where(active & (pos < active_blocks), pos, active_blocks)
        src = jnp.broadcast_to(
            jnp.arange(nb, dtype=jnp.int32), active.shape
        )
        ids = jnp.full((batch, active_blocks), nb, jnp.int32).at[
            jnp.arange(batch, dtype=jnp.int32)[:, None], dest
        ].set(src, mode="drop")  # inactive slots → sentinel = dummy row

        # voxel centers of the selected blocks (sentinel rows decode out of
        # the grid; their updates land in the dummy row).  Per-voxel math
        # runs on [B, A*B3] arrays — flat minor axis, full 128-lane vregs
        # even at bs=4 — with x/y/z as separate arrays (a trailing stacked
        # axis of 3 would tile just as badly as a 64-wide one).
        cxv = (ids // (BY * BZ)).astype(jnp.float32) * bs  # [B, A]
        cyv = ((ids // BZ) % BY).astype(jnp.float32) * bs
        czv = (ids % BZ).astype(jnp.float32) * bs
        px = ((cxv[..., None] + offs[None, None, :, 0]) * voxel
              + origin[0]).reshape(batch, -1)
        py = ((cyv[..., None] + offs[None, None, :, 1]) * voxel
              + origin[1]).reshape(batch, -1)
        pz = ((czv[..., None] + offs[None, None, :, 2]) * voxel
              + origin[2]).reshape(batch, -1)
        R, t = e[:, :3, :3], e[:, :3, 3]

        def rc(i, j):
            return R[:, i, j][:, None]

        x = rc(0, 0) * px + rc(0, 1) * py + rc(0, 2) * pz + t[:, 0][:, None]
        y = rc(1, 0) * px + rc(1, 1) * py + rc(1, 2) * pz + t[:, 1][:, None]
        z = rc(2, 0) * px + rc(2, 1) * py + rc(2, 2) * pz + t[:, 2][:, None]
        zs = jnp.maximum(z, 1e-9)
        u = x / zs * k[:, 0, 0][:, None] + k[:, 0, 2][:, None]
        v = y / zs * k[:, 1, 1][:, None] + k[:, 1, 2][:, None]
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        in_img = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        flat = (
            jnp.clip(vi, 0, H - 1) * W
            + jnp.clip(ui, 0, W - 1)
            + (jnp.arange(batch, dtype=jnp.int32) * (H * W))[:, None]
        )
        dc = jnp.take(
            jnp.stack([d.reshape(-1), c.reshape(-1)], axis=-1),
            flat.reshape(-1), axis=0,
        ).reshape(batch, -1, 2)
        d_pix, w_pix = dc[..., 0], dc[..., 1]

        sdf_obs = (d_pix - z) / trunc
        valid = in_img & (d_pix > 1e-6) & (sdf_obs > -1.0)
        if not carve:
            valid = valid & (sdf_obs <= 1.0)  # band-only semantics
        sdf_obs = jnp.clip(sdf_obs, -1.0, 1.0)
        w_obs = jnp.where(valid, jnp.maximum(w_pix, 0.0), 0.0)

        with_color = col_b is not None and images is not None
        if with_color:
            c_pix = jnp.take(
                img.reshape(-1, 3).astype(jnp.float32), flat.reshape(-1),
                axis=0,
            ).reshape(batch, -1, 3)
            w_col = jnp.where(jnp.abs(sdf_obs) < 1.0, w_obs, 0.0)

        # sequential (exact) state updates — row-granular, cheap
        for b in range(batch):
            idb = ids[b]
            rows = jnp.take(sw_b, idb, axis=0)  # [A, 2*B3]
            sb = rows[:, :b3].reshape(-1)
            wb = rows[:, b3:].reshape(-1)
            w_new = wb + w_obs[b]
            s_new = jnp.where(
                w_new > 0.0,
                (sb * wb + sdf_obs[b] * w_obs[b])
                / jnp.maximum(w_new, 1e-12),
                sb,
            )
            w_new = jnp.minimum(w_new, max_weight)
            rows = jnp.concatenate(
                [s_new.reshape(-1, b3), w_new.reshape(-1, b3)], axis=1
            )
            sw_b = sw_b.at[idb].set(rows)
            if with_color:
                crows = jnp.take(col_b, idb, axis=0)  # [A, B3, 4]
                add = jnp.stack(
                    [
                        c_pix[b, :, 0] * w_col[b],
                        c_pix[b, :, 1] * w_col[b],
                        c_pix[b, :, 2] * w_col[b],
                        w_col[b],
                    ],
                    axis=-1,
                ).reshape(-1, b3, 4)
                col_b = col_b.at[idb].set(crows + add)
        return sw_b, col_b, n_active

    # STATIC unroll over steps instead of lax.scan: on this platform a scan
    # copies its carry every step at ~1 GB/s (measured: a 7-step identity
    # scan over a 31 MB carry costs ~200 ms), which would dominate the
    # whole fusion.  Straight-line dataflow lets XLA update the blocked
    # grid in place.
    counts = []
    for s in range(steps):
        sl = slice(s * batch, (s + 1) * batch)
        sw_b, col_b, n_active = body(
            sw_b, col_b, depth[sl], conf[sl], K[sl], E_w2c[sl],
            images[sl] if images is not None else None,
        )
        counts.append(n_active)
    return (
        sw_b[:, :b3], sw_b[:, b3:], col_b,
        jnp.concatenate(counts) if counts else jnp.zeros((0,), jnp.int32),
    )


def integrate_frames_sparse(
    grid: TSDFGrid,
    depth: jax.Array,  # [N, H, W]
    conf: jax.Array,  # [N, H, W]
    K: jax.Array,  # [N, 3, 3]
    E_w2c: jax.Array,  # [N, 3, 4]
    max_weight: float = 64.0,
    images: jax.Array | None = None,
    block_size: int = 4,
    active_blocks: int | None = None,
    batch: int = 8,
    carve: bool = False,
) -> tuple[TSDFGrid, "np.ndarray"]:
    """Block-sparse fusion of a frame stack (band-only semantics).

    Equivalent to ``integrate(band_only=True)`` per frame whenever the
    per-frame active-block count fits ``active_blocks``; over budget, an
    arbitrary subset of active blocks is dropped for that frame.  The
    default ``active_blocks=None`` AUTO-SIZES the budget with a cheap
    activity-only counting pass (exact coverage, like sizing a voxel-hash
    table to the scene).  ``batch`` frames share one gather dispatch per
    scan step; results are bit-identical to frame-at-a-time updates.

    ``carve=True`` adds free-space carving (the dense ``band_only=False``
    semantics, VERDICT r4 #8): blocks that already hold weight are also
    updated whenever they sit in front of observed depth, so the clipped
    ``+1`` free-space observations erase spurious early surfaces that
    later frames contradict.  Per-voxel math on every selected block is
    exactly the dense full update; the only remaining gap to dense is
    that never-occupied pure-free-space blocks skip the (value-neutral,
    sdf stays +1) weight-prior accumulation.  Occupancy refreshes at
    dispatch granularity: a surface written by frame i becomes
    carve-eligible ``<= batch`` frames later (exact at ``batch=1``).

    Returns ``(grid, counts)`` where ``counts`` is the TRUE per-frame
    active-block count — with an explicit budget, callers should check
    ``counts.max() <= active_blocks``.
    """
    import numpy as np

    bs = block_size
    X, Y, Z = grid.sdf.shape
    bdims = (-(-X // bs), -(-Y // bs), -(-Z // bs))
    nb = bdims[0] * bdims[1] * bdims[2]
    hw = (int(depth.shape[1]), int(depth.shape[2]))
    depth = jnp.asarray(depth)
    conf = jnp.asarray(conf)
    K = jnp.asarray(K)
    E_w2c = jnp.asarray(E_w2c)

    if depth.shape[0] == 0:  # empty stack: nothing to fuse
        return grid, np.zeros((0,), np.int64)

    sdf_b = _block_layout(grid.sdf, bs, 1.0)
    w_b = _block_layout(grid.weight, bs, 0.0)
    col_b = (
        _block_layout(grid.color, bs, 0.0) if grid.color is not None else None
    )

    if active_blocks is None:
        occ0 = (w_b[:-1] > 0.0).any(axis=1) if carve else None
        counts = _count_active_impl(
            grid.origin, grid.voxel, grid.trunc, depth, conf, K, E_w2c,
            bdims, bs, hw, occ0=occ0, carve=carve,
        )
        # round up for shape stability across similar scenes (each distinct
        # budget is its own compile)
        active_blocks = -(-(int(counts.max()) + 1) // 128) * 128
    active_blocks = max(1, min(int(active_blocks), nb))

    n = depth.shape[0]
    batch = max(1, min(int(batch), n))
    pad = -n % batch
    if pad:
        def padf(a, fill=0.0):
            return jnp.concatenate(
                [a, jnp.full((pad, *a.shape[1:]), fill, a.dtype)], axis=0
            )

        depth = padf(depth)
        conf = padf(conf)  # zero conf → padded frames are exact no-ops
        K = jnp.concatenate([K, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))])
        E_w2c = jnp.concatenate(
            [E_w2c, jnp.tile(jnp.eye(4)[:3][None], (pad, 1, 1))]
        )

    if images is not None and grid.color is None:
        raise ValueError("images given but grid has no color accumulator")
    if images is not None:
        images = jnp.asarray(images)
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *images.shape[1:]), images.dtype)]
            )

    sdf_b, w_b, col_b, counts = _integrate_sparse_impl(
        sdf_b, w_b, col_b, grid.origin, grid.voxel, grid.trunc,
        depth, conf, K, E_w2c, images,
        bdims, bs, int(active_blocks), float(max_weight), hw, batch,
        carve=carve,
    )
    dims = (X, Y, Z)
    return grid._replace(
        sdf=_unblock(sdf_b, dims, bs),
        weight=_unblock(w_b, dims, bs),
        color=None if col_b is None else _unblock(col_b, dims, bs),
    ), np.asarray(counts)[:n]


def vertex_colors(grid: TSDFGrid, verts_world) -> "np.ndarray":
    """Per-vertex uint8 colors by nearest-voxel lookup of the color
    accumulator (host-side; vertices from inout.mesh.tsdf_to_mesh).

    Vertices whose nearest voxel never received near-surface color weight
    (possible at mesh borders where only clipped free-space observations
    landed) fall back to the scene's mean color instead of black."""
    import numpy as np

    if grid.color is None:
        raise ValueError("grid has no color accumulator (make_grid with_color)")
    c = np.asarray(grid.color)
    idx = np.round(
        (np.asarray(verts_world) - np.asarray(grid.origin)) / float(grid.voxel)
    ).astype(np.int64)
    idx = np.clip(idx, 0, np.asarray(c.shape[:3]) - 1)
    acc = c[idx[:, 0], idx[:, 1], idx[:, 2]]
    has_w = acc[:, 3] > 1e-12
    rgb = acc[:, :3] / np.maximum(acc[:, 3:], 1e-12)
    if not has_w.all():
        fallback = rgb[has_w].mean(axis=0) if has_w.any() else np.full(3, 128.0)
        rgb[~has_w] = fallback
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def estimate_bounds(
    depth, K, E_w2c, resolution: int = 192, margin: float = 0.05
) -> tuple["np.ndarray", "np.ndarray"]:
    """Scene bounds (lo, hi) from a strided backprojection: 1%/99% point
    quantiles, padded past the truncation band (a wall-facing camera puts
    ~99% of its points ON one plane, so the raw quantile box edge would
    land exactly on the surface and clip the sign change a mesh needs)."""
    import numpy as np

    from da3slam_tpu.core.geometry import backproject_depth

    depth = jnp.asarray(depth)
    K = jnp.asarray(K)
    # the 8x-strided grid needs 8x-smaller intrinsics (pixel (u,v) of the
    # strided map is (8u, 8v) in the original): full-res K here collapses
    # the estimated bounds to a corner sliver of the scene
    K8 = K.at[:, :2, :].multiply(1.0 / 8.0)
    pts = np.asarray(
        backproject_depth(depth[:, ::8, ::8], K8, jnp.asarray(E_w2c))
    ).reshape(-1, 3)
    d8 = np.asarray(depth[:, ::8, ::8]).reshape(-1)
    ok = np.isfinite(pts).all(axis=1) & (d8 > 1e-6)
    if not ok.any():
        raise ValueError(
            "TSDF bounds estimation found no valid depth sample — every "
            "strided pixel is non-finite or <= 1e-6; check the depth scale "
            "and validity masking"
        )
    lo = np.quantile(pts[ok], 0.01, axis=0)
    hi = np.quantile(pts[ok], 0.99, axis=0)
    pad = max(margin, 4.0 * float(np.max(hi - lo, initial=1e-6)) / resolution)
    return lo - pad, hi + pad


def fuse_frames(
    depth,  # [T, H, W]
    conf,  # [T, H, W]
    K,  # [T, 3, 3]
    E_w2c,  # [T, 3, 4]
    resolution: int = 192,
    conf_floor: float = 1.0,
    max_weight: float = 64.0,
    margin: float = 0.05,
    images=None,  # [T, H, W, 3] → colored grid
    sparse: bool = False,
    block_size: int = 4,
    active_blocks: int | None = None,
    carve: bool = False,
    batch: int = 8,
) -> TSDFGrid:
    """TSDF-fuse a stack of posed depth frames, bounds auto-estimated.

    Bounds come from a strided backprojection of the fused cloud (1%/99%
    quantiles + ``margin``, host side); confidence below ``conf_floor``
    contributes zero weight (the model's conf contract floor is 1.0,
    solver.py:125).  ``sparse=True`` routes through the block-sparse
    band-only path (:func:`integrate_frames_sparse`) — the same surface,
    but only near-band voxels are touched; a warning fires if any frame's
    active set exceeded the block budget.  ``carve=True`` (sparse only)
    adds free-space carving of occupied blocks — the dense path always
    carves."""
    depth = jnp.asarray(depth)
    conf = jnp.asarray(conf)
    K = jnp.asarray(K)
    E = jnp.asarray(E_w2c)

    lo, hi = estimate_bounds(depth, K, E, resolution=resolution, margin=margin)
    grid = grid_from_bounds(lo, hi, resolution,
                            with_color=images is not None)

    w = jnp.maximum(conf - conf_floor, 0.0)
    if images is not None:
        images = jnp.asarray(images)
    if sparse:
        grid, counts = integrate_frames_sparse(
            grid, depth, w, K, E, max_weight=max_weight, images=images,
            block_size=block_size, active_blocks=active_blocks, carve=carve,
            batch=batch,
        )
        # active_blocks=None auto-sizes from a counting pass → never drops
        if active_blocks is not None and counts.max() > active_blocks:
            import warnings

            warnings.warn(
                f"sparse TSDF: {int(counts.max())} active blocks exceed the "
                f"budget of {active_blocks}; some surface observations were "
                "dropped — raise active_blocks",
                stacklevel=2,
            )
        return grid
    return integrate_frames(grid, depth, w, K, E, max_weight=max_weight,
                            images=images)


def fuse_pipeline_output(
    out,  # slam.pipeline.PipelineOutput
    resolution: int = 192,
    conf_floor: float = 1.0,
    max_weight: float = 64.0,
    margin: float = 0.05,
    window_idx=None,  # [C, N] original-frame indices (pipeline.make_windows)
    sparse: bool = False,
    carve: bool = False,
) -> TSDFGrid:
    """TSDF-fuse a full SLAM pipeline run (flattens the window axis).

    Pipeline windows overlap, so the same physical frame appears in more
    than one window (and the re-anchored tail repeats several); fusing the
    flat stack double-weights those observations at window seams.  Pass the
    pipeline's ``window_idx`` to keep only each frame's first occurrence
    (duplicate slots contribute zero weight; shapes stay static)."""
    import numpy as np

    C, N = out.depth.shape[:2]
    conf = jnp.asarray(out.conf).reshape(C * N, *out.conf.shape[2:])
    if window_idx is not None:
        flat = np.asarray(window_idx).reshape(-1)
        first = np.zeros(flat.shape[0], bool)
        seen: set[int] = set()
        for i, f in enumerate(flat):
            if int(f) not in seen:
                seen.add(int(f))
                first[i] = True
        # conf_floor gating maps masked slots to zero fusion weight
        conf = jnp.where(jnp.asarray(first)[:, None, None], conf, 0.0)
    return fuse_frames(
        jnp.asarray(out.depth).reshape(C * N, *out.depth.shape[2:]),
        conf,
        jnp.asarray(out.intrinsics).reshape(C * N, 3, 3),
        jnp.asarray(out.extrinsics_global).reshape(C * N, 3, 4),
        resolution=resolution,
        conf_floor=conf_floor,
        max_weight=max_weight,
        margin=margin,
        sparse=sparse,
        carve=carve,
    )
