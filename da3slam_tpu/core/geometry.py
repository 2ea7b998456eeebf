"""Pinhole camera geometry: backprojection / projection / depth-scale.

Single canonical implementation of the depth→point-cloud math the reference
repo carried in four near-identical copies (align_geometry.py:192,
utils/align_geometry_single.py:52, utils/geometry.py:4,
utils/da3_streaming.py:53).

Pixel convention: ``u`` is the column index, ``v`` the row index, rays are
``K^-1 @ [u, v, 1]`` (no half-pixel offset — matching the reference and the
vendored VGGT geometry, src/vggt/utils/geometry.py:105-112).

All functions are batched over an arbitrary leading shape and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from da3slam_tpu.core.transforms import highest_precision, se3_inverse


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel coordinates ``[H, W, 3]`` = (u, v, 1)."""
    v = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    u = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    return jnp.stack([u, v, jnp.ones_like(u)], axis=-1)


def _invert_intrinsics(K: jax.Array) -> jax.Array:
    """Closed-form inverse of a zero-skew pinhole matrix ``[..., 3, 3]``.

    Cheaper and better conditioned than a general 3x3 inverse; the DA3
    intrinsics contract is zero-skew (src/vggt/utils/geometry.py:99).
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, zeros, -cx / fx], -1)
    row1 = jnp.stack([zeros, 1.0 / fy, -cy / fy], -1)
    row2 = jnp.stack([zeros, zeros, ones], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


@highest_precision
def backproject_depth(
    depth: jax.Array,
    K: jax.Array,
    extrinsics: jax.Array | None = None,
) -> jax.Array:
    """Depth maps → 3-D point maps.

    Args:
      depth:      ``[..., H, W]``
      K:          ``[..., 3, 3]`` zero-skew pinhole intrinsics
      extrinsics: optional ``[..., 3, 4]`` w2c; if given, points are returned
                  in *world* coordinates, otherwise in *camera* coordinates
                  (the reference's ``in_coords`` toggle,
                  align_geometry.py:246-251).

    Returns: ``[..., H, W, 3]`` points.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    pix = pixel_grid(H, W, depth.dtype)  # [H, W, 3]
    Kinv = _invert_intrinsics(K)  # [..., 3, 3]
    rays = jnp.einsum("...ij,hwj->...hwi", Kinv, pix)  # [..., H, W, 3]
    cam = rays * depth[..., None]
    if extrinsics is None:
        return cam
    c2w = se3_inverse(extrinsics)  # [..., 3, 4]
    Rw, tw = c2w[..., :3, :3], c2w[..., :3, 3]
    return jnp.einsum("...ij,...hwj->...hwi", Rw, cam) + tw[..., None, None, :]


@highest_precision
def project_points(
    points: jax.Array,
    K: jax.Array,
    extrinsics: jax.Array | None = None,
    eps: float = 1e-8,
) -> tuple[jax.Array, jax.Array]:
    """3-D points → pixel coordinates + depth.

    Args:
      points:     ``[..., N, 3]`` in world coords (or camera coords if
                  ``extrinsics`` is None)
      K:          ``[..., 3, 3]``
      extrinsics: optional ``[..., 3, 4]`` w2c

    Returns: ``(uv [..., N, 2], z [..., N])``; the inverse of
    ``backproject_depth`` (cf. src/vggt/utils/geometry.py:174-288).
    """
    if extrinsics is not None:
        R, t = extrinsics[..., :3, :3], extrinsics[..., :3, 3]
        cam = points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    else:
        cam = points
    z = cam[..., 2]
    xy = cam[..., :2] / jnp.maximum(z[..., None], eps)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = fx[..., None] * xy[..., 0] + cx[..., None]
    v = fy[..., None] * xy[..., 1] + cy[..., None]
    return jnp.stack([u, v], axis=-1), z


def normalize_pixel_tracks(
    tracks: jax.Array, hw: tuple[int, int], mode: str = "minus_one_to_one"
) -> jax.Array:
    """Normalise pixel-coordinate tracks ``[..., 2]`` to a canonical range
    (the vendored VGGT track normalisation, src/vggt/utils/geometry.py:293-323).

    mode: "minus_one_to_one" (align_corners-style [-1, 1]) or "zero_to_one".
    """
    H, W = hw
    size = jnp.asarray([W - 1.0, H - 1.0], tracks.dtype)
    unit = tracks / size
    if mode == "zero_to_one":
        return unit
    if mode == "minus_one_to_one":
        return unit * 2.0 - 1.0
    raise ValueError(f"unknown mode {mode!r}")


def denormalize_pixel_tracks(
    tracks: jax.Array, hw: tuple[int, int], mode: str = "minus_one_to_one"
) -> jax.Array:
    """Inverse of :func:`normalize_pixel_tracks`."""
    H, W = hw
    size = jnp.asarray([W - 1.0, H - 1.0], tracks.dtype)
    if mode == "zero_to_one":
        return tracks * size
    if mode == "minus_one_to_one":
        return (tracks + 1.0) * 0.5 * size
    raise ValueError(f"unknown mode {mode!r}")


def depth_scale_ratio(
    depth_prev: jax.Array,
    depth_cur: jax.Array,
    conf_prev: jax.Array | None = None,
    conf_cur: jax.Array | None = None,
    conf_th: float = 0.2,
    min_points: int = 50,
    eps: float = 1e-6,
) -> jax.Array:
    """Robust median depth-scale estimate between two co-registered depth maps.

    Scale such that ``depth_prev ≈ s * depth_cur`` on confident pixels.
    Reproduces the robust variant of the reference's ``estimate_depth_scale``
    (utils/align_geometry_single.py:31-49) in fixed shapes: the masked median
    is computed by sorting with invalid entries pushed to +inf, and the
    <``min_points``-valid / non-finite / non-positive fallbacks return 1.0.
    """
    d_prev = depth_prev.reshape(-1)
    d_cur = depth_cur.reshape(-1)
    mask = (d_prev > eps) & (d_cur > eps) & jnp.isfinite(d_prev) & jnp.isfinite(d_cur)
    if conf_prev is not None and conf_cur is not None:
        mask &= (conf_prev.reshape(-1) > conf_th) & (conf_cur.reshape(-1) > conf_th)

    ratio = jnp.where(mask, d_prev / jnp.maximum(d_cur, eps), jnp.inf)
    n_valid = jnp.sum(mask)
    sorted_ratio = jnp.sort(ratio)
    # median over the first n_valid entries (invalid are +inf at the tail)
    lo = jnp.clip((n_valid - 1) // 2, 0, ratio.shape[0] - 1)
    hi = jnp.clip(n_valid // 2, 0, ratio.shape[0] - 1)
    med = 0.5 * (sorted_ratio[lo] + sorted_ratio[hi])
    ok = (n_valid >= min_points) & jnp.isfinite(med) & (med > 0)
    return jnp.where(ok, med, 1.0)
