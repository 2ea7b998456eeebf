"""Differentiable 3D-Gaussian-splat rasterizer, TPU-first.

The reference's ``main_3dgs.py`` is a 5-line stub (reference main_3dgs.py:1-5);
this module supplies the real thing: an EWA-splatting rasterizer whose forward
AND backward run on-device with fixed shapes, enabling appearance-grade splat
training (ops/splats.py's consistency refinement handles geometry; this adds
the photometric render loss of the 3DGS formulation).

CUDA 3DGS rasterizers are built around per-tile atomics, warp ballots, and
data-dependent early termination — none of which map to XLA.  The TPU design
replaces them:

  binning    — each splat emits a FIXED fan of (tile, depth, splat) triples
               covering its 3σ footprint (overflow tiles drop, counted);
               one lexicographic ``lax.sort`` groups triples by tile and
               orders them front-to-back WITHIN each tile simultaneously;
               a rank-scatter packs them into a dense ``[tiles, K]`` table.
               Sorting-as-scheduling instead of atomics.
  composite  — front-to-back alpha blending is not a sequential loop:
               transmittance T_k = Π_{j<k}(1 − α_j) becomes
               ``exp(cumsum(log1p(−α)))`` — a parallel scan, so the whole
               tile composites as dense [K, pixels] tensor math on the VPU,
               and autodiff through it is exact (no hand-written backward;
               the CUDA implementations need one precisely because their
               loop is sequential with early exit).
  shapes     — everything is [tiles, K] / [tiles, px]; no dynamic sizes,
               no host sync.  Truncation (fan, K) is explicit and reported.

Gradients flow to every splat attribute (means, scales, rotations, colors,
opacity) through the gathered per-tile values; the binning indices are
integer scheduling, correctly treated as constant per step (same as CUDA
3DGS, whose tile lists are rebuilt each iteration outside the tape).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Projected2D(NamedTuple):
    """Per-view screen-space gaussians (all [G, ...])."""

    mean2d: jax.Array   # [G, 2] pixel coords (u, v)
    conic: jax.Array    # [G, 3] inverse 2D covariance (a, b, c): ax²+2bxy+cy²
    depth: jax.Array    # [G] camera z
    radius: jax.Array   # [G] 3σ footprint radius in pixels (0 = culled)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-normalised (w, x, y, z) quaternions ``[..., 4]`` → ``[..., 3, 3]``
    (matches inout/export3d.py's PLY quaternion convention)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def project_gaussians(
    means: jax.Array,       # [G, 3] world
    scales: jax.Array,      # [G, 3] per-axis radii (σ, world units)
    quats: jax.Array,       # [G, 4] (w, x, y, z)
    K: jax.Array,           # [3, 3] zero-skew pinhole
    E: jax.Array,           # [3, 4] w2c, OpenCV convention (SURVEY §2.5)
    img_hw: tuple[int, int],
    near: float = 1e-2,
) -> Projected2D:
    """EWA splatting: perspective-project 3D gaussians to screen space.

    Σ_world = R·diag(s²)·Rᵀ;  Σ_2D = J·W·Σ_world·Wᵀ·Jᵀ + 0.3·I where J is
    the projection Jacobian at the mean and W the camera rotation.  The
    +0.3 px dilation is the standard 3DGS anti-aliasing floor."""
    H, W_img = img_hw
    R_w = quat_to_rotmat(quats)                     # [G, 3, 3]
    S = scales[..., None, :] * jnp.eye(3)           # [G, 3, 3] diag
    M = R_w @ S
    cov3d = M @ jnp.swapaxes(M, -1, -2)             # [G, 3, 3]

    Rc, tc = E[:3, :3], E[:3, 3]
    t = means @ Rc.T + tc                           # [G, 3] camera coords
    z = t[:, 2]
    z_safe = jnp.maximum(z, near)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = fx * t[:, 0] / z_safe + cx
    v = fy * t[:, 1] / z_safe + cy

    zero = jnp.zeros_like(z_safe)
    J = jnp.stack(
        [
            jnp.stack([fx / z_safe, zero, -fx * t[:, 0] / z_safe**2], -1),
            jnp.stack([zero, fy / z_safe, -fy * t[:, 1] / z_safe**2], -1),
        ],
        axis=-2,
    )                                               # [G, 2, 3]
    JW = J @ Rc                                     # [G, 2, 3]
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)   # [G, 2, 2]
    cov2d = cov2d + 0.3 * jnp.eye(2)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    det = jnp.maximum(det, 1e-12)
    conic = jnp.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], -1
    )
    # 3σ of the major axis bounds the footprint
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    on_screen = (
        (z > near)
        & (u + radius >= 0.0) & (u - radius <= W_img - 1.0)
        & (v + radius >= 0.0) & (v - radius <= H - 1.0)
    )
    radius = jnp.where(on_screen, radius, 0.0)
    return Projected2D(jnp.stack([u, v], -1), conic, z, radius)


def _n_tiles(H: int, W: int, tile: int) -> tuple[int, int]:
    return -(-H // tile), -(-W // tile)


def bin_splats(
    proj: Projected2D,
    img_hw: tuple[int, int],
    tile: int = 16,
    max_per_tile: int = 256,
    fan: int = 5,
) -> tuple[jax.Array, jax.Array]:
    """Pack splats into a dense front-to-back per-tile table.

    Each splat emits a ``fan × fan`` block of candidate tiles anchored at
    its footprint's top-left tile (splats larger than ``fan`` tiles are
    truncated — with 16 px tiles and 3σ radii that is a splat over ~40 px
    across, which the training loop's scale regulariser discourages).  One
    ``lax.sort`` over (tile_id, depth) keys both groups and depth-orders
    the triples; each triple's rank within its tile comes from a
    searchsorted against the sorted tile ids, and a dropping scatter packs
    ranks < K into the table.

    Returns ``(table [T, K] int32 splat indices (-1 = empty),
    overflow [T] int32 count of dropped triples per tile)``.
    """
    H, W = img_hw
    ty_n, tx_n = _n_tiles(H, W, tile)
    T = ty_n * tx_n
    G = proj.mean2d.shape[0]

    u, v = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    tx0 = jnp.floor((u - r) / tile).astype(jnp.int32)
    ty0 = jnp.floor((v - r) / tile).astype(jnp.int32)
    tx1 = jnp.floor((u + r) / tile).astype(jnp.int32)
    ty1 = jnp.floor((v + r) / tile).astype(jnp.int32)

    dy = jnp.arange(fan, dtype=jnp.int32)
    dx = jnp.arange(fan, dtype=jnp.int32)
    cand_ty = ty0[:, None, None] + dy[None, :, None]      # [G, fan, 1]
    cand_tx = tx0[:, None, None] + dx[None, None, :]      # [G, 1, fan]
    valid = (
        (cand_ty <= ty1[:, None, None]) & (cand_tx <= tx1[:, None, None])
        & (cand_ty >= 0) & (cand_ty < ty_n)
        & (cand_tx >= 0) & (cand_tx < tx_n)
        & (r[:, None, None] > 0.0)
    )                                                      # [G, fan, fan]
    tile_id = jnp.where(valid, cand_ty * tx_n + cand_tx, T)
    tile_id = tile_id.reshape(-1)                          # [G·fan²]
    depth = jnp.broadcast_to(proj.depth[:, None, None], valid.shape).reshape(-1)
    splat = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None, None], valid.shape
    ).reshape(-1)

    # lexicographic (tile, depth) sort: groups by tile AND orders
    # front-to-back within each tile in one pass
    tile_s, _, splat_s = jax.lax.sort(
        (tile_id, depth, splat), dimension=0, num_keys=2
    )
    starts = jnp.searchsorted(tile_s, tile_s, side="left")
    rank = jnp.arange(tile_s.shape[0], dtype=jnp.int32) - starts.astype(jnp.int32)

    keep = (tile_s < T) & (rank < max_per_tile)
    # dropped scatters go out of bounds on the rank axis (mode="drop")
    scat_tile = jnp.where(keep, tile_s, 0)
    scat_rank = jnp.where(keep, rank, max_per_tile)
    table = jnp.full((T, max_per_tile), -1, jnp.int32)
    table = table.at[scat_tile, scat_rank].set(
        jnp.where(keep, splat_s, -1), mode="drop"
    )
    overflow = jnp.zeros((T,), jnp.int32).at[scat_tile].add(
        ((tile_s < T) & (rank >= max_per_tile)).astype(jnp.int32), mode="drop"
    )
    return table, overflow


def _composite(alpha: jax.Array, colors: jax.Array, bg: jax.Array):
    """Front-to-back blend as a parallel scan (module docstring).

    alpha  [K, P]   per splat per pixel, already masked/clamped
    colors [K, 3]   per splat
    →  rgb [P, 3], alpha_out [P]
    """
    # exclusive cumulative transmittance: T_k = Π_{j<k} (1 - α_j)
    log_t = jnp.cumsum(jnp.log1p(-alpha), axis=0)
    trans = jnp.exp(jnp.concatenate(
        [jnp.zeros_like(log_t[:1]), log_t[:-1]], axis=0))  # [K, P]
    w = alpha * trans                                       # [K, P]
    rgb = jnp.einsum("kp,kc->pc", w, colors)
    t_final = jnp.exp(log_t[-1])                            # [P]
    return rgb + t_final[:, None] * bg[None, :], 1.0 - t_final


def _rasterize_tile(
    idx, mean2d, conic, radius, colors, opacity, tile_yx, *, tile: int, bg,
):
    """Composite one tile's K splats over its tile×tile pixels."""
    valid = idx >= 0
    g = jnp.maximum(idx, 0)
    mu = mean2d[g]                   # [K, 2]
    co = conic[g]                    # [K, 3]
    rad = radius[g]                  # [K]
    col = colors[g]                  # [K, 3]
    op = jnp.where(valid, opacity[g], 0.0)

    py = tile_yx[0] * tile + jnp.arange(tile, dtype=jnp.float32)[:, None]
    px = tile_yx[1] * tile + jnp.arange(tile, dtype=jnp.float32)[None, :]
    pix = jnp.stack(
        [jnp.broadcast_to(px, (tile, tile)), jnp.broadcast_to(py, (tile, tile))],
        axis=-1,
    ).reshape(-1, 2)                 # [P, 2] (u, v) at pixel centers

    d = pix[None, :, :] - mu[:, None, :]                  # [K, P, 2]
    power = -0.5 * (
        co[:, 0:1] * d[..., 0] ** 2
        + 2.0 * co[:, 1:2] * d[..., 0] * d[..., 1]
        + co[:, 2:3] * d[..., 1] ** 2
    )                                                     # [K, P]
    alpha = jnp.clip(op[:, None] * jnp.exp(jnp.minimum(power, 0.0)), 0.0, 0.995)
    # the 3σ box cutoff (same predicate the binner used to choose tiles)
    # plus the CUDA-3DGS 1/255 floor: keeps far-tail gradients from
    # dragging every splat toward every pixel, and makes the footprint
    # identical to ``rasterize_dense`` so the oracle comparison is exact
    in_foot = (
        (jnp.abs(d[..., 0]) <= rad[:, None]) & (jnp.abs(d[..., 1]) <= rad[:, None])
    )
    alpha = jnp.where(in_foot & (alpha >= 1.0 / 255.0), alpha, 0.0)
    return _composite(alpha, col, bg)


@functools.partial(
    jax.jit,
    static_argnames=("img_hw", "tile", "max_per_tile", "fan"),
)
def rasterize(
    means: jax.Array,      # [G, 3]
    scales: jax.Array,     # [G, 3]
    quats: jax.Array,      # [G, 4] (w,x,y,z)
    colors: jax.Array,     # [G, 3] in [0, 1]
    opacity: jax.Array,    # [G] in (0, 1)
    K: jax.Array,          # [3, 3]
    E: jax.Array,          # [3, 4] w2c
    img_hw: tuple[int, int],
    bg: jax.Array | None = None,
    tile: int = 16,
    max_per_tile: int = 256,
    fan: int = 5,
):
    """Render one view.  Returns ``(rgb [H, W, 3], alpha [H, W],
    aux dict(overflow [T], n_binned []))`` — fully differentiable w.r.t.
    every splat attribute."""
    H, W = img_hw
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    proj = project_gaussians(means, scales, quats, K, E, img_hw)
    table, overflow = bin_splats(
        proj, img_hw, tile=tile, max_per_tile=max_per_tile, fan=fan
    )
    ty_n, tx_n = _n_tiles(H, W, tile)
    tiles_yx = jnp.stack(
        jnp.meshgrid(
            jnp.arange(ty_n, dtype=jnp.float32),
            jnp.arange(tx_n, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 2)                                       # [T, 2]

    rgb_t, a_t = jax.vmap(
        functools.partial(_rasterize_tile, tile=tile, bg=bg),
        in_axes=(0, None, None, None, None, None, 0),
    )(table, proj.mean2d, proj.conic, proj.radius, colors, opacity, tiles_yx)

    rgb = (
        rgb_t.reshape(ty_n, tx_n, tile, tile, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ty_n * tile, tx_n * tile, 3)[:H, :W]
    )
    alpha = (
        a_t.reshape(ty_n, tx_n, tile, tile)
        .transpose(0, 2, 1, 3)
        .reshape(ty_n * tile, tx_n * tile)[:H, :W]
    )
    aux = {"overflow": overflow, "n_binned": jnp.sum(table >= 0)}
    return rgb, alpha, aux


def rasterize_dense(
    means, scales, quats, colors, opacity, K, E, img_hw, bg=None
):
    """Reference renderer: every splat against every pixel, one global
    depth sort, no tiling/truncation.  O(G·H·W) — tests and tiny scenes
    only; the oracle the tiled path is validated against."""
    H, W = img_hw
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    proj = project_gaussians(means, scales, quats, K, E, img_hw)
    order = jnp.argsort(proj.depth)
    mu, co = proj.mean2d[order], proj.conic[order]
    col = colors[order]
    op = jnp.where(proj.radius[order] > 0.0, opacity[order], 0.0)

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xx, yy], -1).reshape(-1, 2)
    d = pix[None, :, :] - mu[:, None, :]
    power = -0.5 * (
        co[:, 0:1] * d[..., 0] ** 2
        + 2.0 * co[:, 1:2] * d[..., 0] * d[..., 1]
        + co[:, 2:3] * d[..., 1] ** 2
    )
    in_foot = (
        (jnp.abs(d[..., 0]) <= proj.radius[order][:, None])
        & (jnp.abs(d[..., 1]) <= proj.radius[order][:, None])
    )
    alpha = jnp.clip(op[:, None] * jnp.exp(jnp.minimum(power, 0.0)), 0.0, 0.995)
    alpha = jnp.where(in_foot & (alpha >= 1.0 / 255.0), alpha, 0.0)
    rgb, a = _composite(alpha, col, bg)
    return rgb.reshape(H, W, 3), a.reshape(H, W)
