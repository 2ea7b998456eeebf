"""TPU-native ICP via projective data association.

Replaces Open3D's ``registration_icp(TransformationEstimationPointToPoint)``
(reference utils/align_geometry_single.py:126-180) with a fixed-shape JAX
kernel.  Open3D finds correspondences with a KD-tree; that doesn't map to the
TPU.  But both clouds in the SLAM overlap step come from *depth maps of
near-identical viewpoints* (prev chunk's last frame vs cur chunk's first
frame), so correspondences can be found by *projecting* the moving cloud into
the target camera and reading the target's point map at that pixel — the
classic KinectFusion-style projective association.  Each iteration is then:

    associate (project + bilinear-gather)  →  gate (distance threshold)
    →  closed-form weighted Kabsch/Umeyama update

run under ``lax.fori_loop`` with static shapes throughout.

Diagnostics (``fitness``, ``inlier_rmse``) mirror Open3D's so the reference's
convergence checks (utils/align_geometry_single.py:166-177) stay comparable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from da3slam_tpu.core.transforms import (
    Sim3,
    highest_precision,
    orthonormalize_rotation,
    sim3_compose,
)


class ICPResult(NamedTuple):
    transform: Sim3  # maps source points into the target frame
    fitness: jax.Array  # inlier fraction of valid source points (Open3D-style)
    inlier_rmse: jax.Array  # RMS distance over inliers


def estimate_normals(point_map: jax.Array) -> jax.Array:
    """Per-pixel normals of an organised ``[H, W, 3]`` point map.

    Central differences along the pixel grid + cross product; normals are
    oriented towards the camera (−z half-space) like Open3D's
    ``orient_normals_towards_camera_location`` would for these clouds.
    """
    du = jnp.roll(point_map, -1, axis=1) - jnp.roll(point_map, 1, axis=1)
    dv = jnp.roll(point_map, -1, axis=0) - jnp.roll(point_map, 1, axis=0)
    n = jnp.cross(du, dv)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # orient towards the camera at the origin: n · p must be negative
    flip = jnp.sign(jnp.sum(n * point_map, axis=-1, keepdims=True))
    return -n * jnp.where(flip == 0, 1.0, flip)


def bilinear_gather(point_map: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Bilinearly sample a ``[H, W, C]`` map at continuous pixel coords ``[N, 2]``.

    Returns ``(values [N, C], in_bounds [N])``.  Out-of-bounds samples return
    zeros and ``in_bounds=False``.
    """
    H, W = point_map.shape[0], point_map.shape[1]
    u, v = uv[..., 0], uv[..., 1]
    # half-pixel slop so border pixels survive f32 projection round-trip noise
    in_bounds = (u >= -0.5) & (u <= W - 0.5) & (v >= -0.5) & (v <= H - 0.5)
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    p00 = point_map[v0, u0]
    p01 = point_map[v0, u1]
    p10 = point_map[v1, u0]
    p11 = point_map[v1, u1]
    top = p00 * (1 - fu) + p01 * fu
    bot = p10 * (1 - fu) + p11 * fu
    return top * (1 - fv) + bot * fv, in_bounds


@highest_precision
def icp_point_to_point(
    src_points: jax.Array,
    tgt_point_map: jax.Array,
    tgt_K: jax.Array,
    src_valid: jax.Array | None = None,
    tgt_valid: jax.Array | None = None,
    threshold: float = 0.1,
    max_iterations: int = 50,
    with_scale: bool = False,
) -> ICPResult:
    """Align ``src_points`` onto the cloud behind ``tgt_point_map``.

    Args:
      src_points:    ``[N, 3]`` source cloud in *target-camera-like* coords
                     (the SLAM overlap uses camera-frame clouds of two nearly
                     identical views, so identity init is valid — matching
                     the reference's ``trans_init = I``,
                     utils/align_geometry_single.py:151).
      tgt_point_map: ``[H, W, 3]`` organised target cloud (camera coords),
                     i.e. ``backproject_depth(depth, K)``.
      tgt_K:         ``[3, 3]`` target intrinsics (pixel↔camera mapping of
                     the organised cloud).
      src_valid:     optional ``[N]`` bool — finite/positive-depth mask
                     (replaces the reference's NaN filtering,
                     utils/align_geometry_single.py:136-139).
      tgt_valid:     optional ``[H, W]`` bool mask of valid target pixels.
      threshold:     correspondence distance gate (Open3D ``threshold``).
      max_iterations: fixed iteration count (no data-dependent early exit;
                     each iteration is a handful of tiny matmuls).
      with_scale:    solve Sim(3) instead of SE(3).

    Returns ``ICPResult`` with ``transform`` s.t. ``tgt ≈ s R src + t``.
    """
    n = src_points.shape[0]
    if src_valid is None:
        src_valid = jnp.ones(n, bool)
    src_valid = src_valid & jnp.all(jnp.isfinite(src_points), -1)
    src = jnp.where(src_valid[:, None], src_points, 0.0)

    tgt_map = jnp.nan_to_num(tgt_point_map, nan=0.0, posinf=0.0, neginf=0.0)
    if tgt_valid is None:
        tgt_valid = jnp.all(jnp.isfinite(tgt_point_map), -1) & (tgt_point_map[..., 2] > 0)
    tgt_w = tgt_valid.astype(jnp.float32)[..., None]

    fx, fy = tgt_K[0, 0], tgt_K[1, 1]
    cx, cy = tgt_K[0, 2], tgt_K[1, 2]
    tgt_normals = estimate_normals(tgt_map)
    H, W = tgt_map.shape[0], tgt_map.shape[1]
    # One stacked channel tensor so each association is a SINGLE gather:
    # [point(3) | normal(3) | validity(1)].  TPU gathers are expensive; the
    # original 3-map bilinear association (12 corner gathers per iteration)
    # dominated the SLAM loop's runtime.
    stacked = jnp.concatenate([tgt_map, tgt_normals, tgt_w], axis=-1).reshape(H * W, 7)

    def associate(T: Sim3):
        p = T.s * (src @ T.R.T) + T.t  # moved source
        z = jnp.maximum(p[..., 2], 1e-8)
        u = fx * p[..., 0] / z + cx
        v = fy * p[..., 1] / z + cy
        # nearest-pixel association (KinectFusion-style): one flat gather
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        in_bounds = (u >= -0.5) & (u <= W - 0.5) & (v >= -0.5) & (v <= H - 0.5)
        vals = jnp.take(stacked, vi * W + ui, axis=0)  # [N, 7]
        q = vals[..., 0:3]
        n = vals[..., 3:6]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        tgt_ok = vals[..., 6] > 0.5
        dist = jnp.linalg.norm(p - q, axis=-1)
        valid = (src_valid & in_bounds & tgt_ok & (p[..., 2] > 0)).astype(jnp.float32)
        return p, q, n, dist, valid

    n_params = 7 if with_scale else 6

    def body(_, T: Sim3) -> Sim3:
        # Point-to-plane Gauss-Newton step.  Projective association yields
        # correspondences along viewing rays, for which point-to-point
        # updates converge to biased fixed points; minimising the distance to
        # the target *tangent plane* (KinectFusion-style) is both unbiased and
        # quadratically convergent here.
        p, q, n, dist, valid = associate(T)
        r = jnp.sum(n * (p - q), axis=-1)  # signed plane residual
        # Huber on the plane residual (soft gate; hard gating stalls)
        w = valid * jnp.where(
            jnp.abs(r) <= threshold, 1.0, threshold / jnp.maximum(jnp.abs(r), 1e-12)
        )
        # jacobian rows of r wrt the twist [σ?, ω, u]: δr = n·(σ p + ω×p + u)
        cross_pn = jnp.cross(p, n)
        if with_scale:
            A = jnp.concatenate(
                [jnp.sum(n * p, -1, keepdims=True), cross_pn, n], axis=-1
            )  # [N, 7]
        else:
            A = jnp.concatenate([cross_pn, n], axis=-1)  # [N, 6]
        Aw = A * w[:, None]
        H = Aw.T @ A + 1e-6 * jnp.eye(n_params, dtype=A.dtype)
        g = Aw.T @ (-r)
        xi = jnp.linalg.solve(H, g)
        if with_scale:
            sigma, omega, upd = xi[0], xi[1:4], xi[4:7]
        else:
            sigma, omega, upd = jnp.asarray(0.0, xi.dtype), xi[0:3], xi[3:6]
        # skew(omega) built explicitly (small rotation), then re-orthonormalised
        skew = jnp.zeros((3, 3), xi.dtype)
        skew = skew.at[0, 1].set(-omega[2]).at[0, 2].set(omega[1])
        skew = skew.at[1, 0].set(omega[2]).at[1, 2].set(-omega[0])
        skew = skew.at[2, 0].set(-omega[1]).at[2, 1].set(omega[0])
        R_delta = orthonormalize_rotation(jnp.eye(3, dtype=xi.dtype) + skew)
        delta = Sim3(1.0 + sigma, R_delta, upd)
        T_new = sim3_compose(delta, T)
        has_corr = jnp.sum(w) >= float(n_params)
        return Sim3(
            jnp.where(has_corr, T_new.s, T.s),
            jnp.where(has_corr, T_new.R, T.R),
            jnp.where(has_corr, T_new.t, T.t),
        )

    T0 = Sim3(jnp.asarray(1.0, jnp.float32), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    T = jax.lax.fori_loop(0, max_iterations, body, T0)

    _, _, _, dist, valid = associate(T)
    w = valid * (dist < threshold)  # hard gate for Open3D-style diagnostics
    n_src = jnp.maximum(jnp.sum(src_valid.astype(jnp.float32)), 1.0)
    n_inlier = jnp.sum(w)
    fitness = n_inlier / n_src
    inlier_rmse = jnp.sqrt(jnp.sum(w * dist**2) / jnp.maximum(n_inlier, 1.0))
    return ICPResult(T, fitness, inlier_rmse)
