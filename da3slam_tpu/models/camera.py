"""Camera head: per-view pose (w2c) + pinhole intrinsics from camera tokens.

Emits the §2.5 contract (reference solver.py:174-176): extrinsics
``[N, 3, 4]`` w2c OpenCV convention *local to the chunk* with the reference
view ≈ identity, and zero-skew intrinsics ``[N, 3, 3]`` in pixels of the
processed resolution.

``ref_view_strategy`` (reference da3_streaming.py:263-273) selects which
view anchors the local frame; poses are normalised by right-composing with
the inverse of the reference view's raw pose.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from da3slam_tpu.core.transforms import (
    highest_precision,
    quat_to_rotmat,
    se3_compose,
    se3_inverse,
)
from da3slam_tpu.models.config import ModelConfig

Params = Any


def _linear_init(key, cin, cout, std=0.02):
    return jax.random.truncated_normal(key, -2, 2, (cin, cout)) * std


def init_camera_head(key: jax.Array, cfg: ModelConfig) -> Params:
    D, C = cfg.embed_dim, cfg.camera_dim
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": _linear_init(k1, D, C),
        "b1": jnp.zeros((C,)),
        "w2": _linear_init(k2, C, C),
        "b2": jnp.zeros((C,)),
        # outputs: quat(4) + trans(3) + log-focal(2) + principal-offset(2)
        "w_out": _linear_init(k3, C, 11, std=1e-3),
        "b_out": jnp.zeros((11,)).at[0].set(1.0),  # identity quaternion bias
    }


@highest_precision
def pose_from_rays(
    rays: jax.Array,
    K: jax.Array,
    stride: int = 8,
    eps: float = 1e-6,
) -> jax.Array:
    """Recover per-view w2c extrinsics from predicted Plücker ray maps.

    The depth-ray representation: every pixel predicts its viewing ray in the
    chunk frame as ``(d, m)`` with unit direction ``d`` and moment
    ``m = c × d`` (``c`` = camera center).  Then:

      * camera center: least squares over rays,
        ``Σ (I − d dᵀ) c = Σ d × m``  (3x3 solve per view)
      * rotation: Kabsch between the canonical camera-frame pixel rays
        ``K⁻¹ [u, v, 1]`` and the predicted world directions → R_c2w

    Args:
      rays: ``[N, H, W, 6]``; K: ``[N, 3, 3]``.

    Returns ``[N, 3, 4]`` w2c.
    """
    from da3slam_tpu.core.geometry import pixel_grid

    N, H, W, _ = rays.shape
    d = rays[:, ::stride, ::stride, 0:3].reshape(N, -1, 3)
    m = rays[:, ::stride, ::stride, 3:6].reshape(N, -1, 3)

    # center: A c = b with A = Σ (I − d dᵀ), b = Σ d × m
    A = jnp.sum(
        jnp.eye(3)[None, None] - d[..., :, None] * d[..., None, :], axis=1
    )  # [N, 3, 3]
    b = jnp.sum(jnp.cross(d, m), axis=1)  # [N, 3]
    A = A + eps * jnp.eye(3)[None]
    c = jnp.linalg.solve(A, b[..., None])[..., 0]  # [N, 3]

    # rotation: canonical camera rays at the same strided pixels
    pix = pixel_grid(H, W, rays.dtype)[::stride, ::stride].reshape(-1, 3)  # [P, 3]
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    r = jnp.stack(
        [
            (pix[None, :, 0] - cx[:, None]) / fx[:, None],
            (pix[None, :, 1] - cy[:, None]) / fy[:, None],
            jnp.ones((N, pix.shape[0]), rays.dtype),
        ],
        axis=-1,
    )
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), eps)

    # Kabsch per view: world dirs = R_c2w @ cam dirs
    Sigma = jnp.einsum("npi,npj->nij", d, r)  # [N, 3, 3]
    U, _, Vt = jnp.linalg.svd(Sigma)
    det = jnp.linalg.det(jnp.einsum("nij,njk->nik", U, Vt))
    D = jnp.ones((N, 3)).at[:, 2].set(det)
    R_c2w = jnp.einsum("nij,nj,njk->nik", U, D, Vt)

    R_w2c = jnp.swapaxes(R_c2w, -1, -2)
    t = -jnp.einsum("nij,nj->ni", R_w2c, c)
    return jnp.concatenate([R_w2c, t[..., None]], axis=-1)


def rays_from_pose(
    extrinsics: jax.Array, K: jax.Array, hw: tuple[int, int]
) -> jax.Array:
    """Inverse of :func:`pose_from_rays` for testing/supervision: the exact
    Plücker ray map ``[N, H, W, 6]`` of given w2c poses."""
    from da3slam_tpu.core.geometry import pixel_grid
    from da3slam_tpu.core.transforms import se3_inverse

    H, W = hw
    pix = pixel_grid(H, W)  # [H, W, 3]
    Kinv_ray = jnp.einsum(
        "nij,hwj->nhwi", jnp.linalg.inv(K), pix
    )
    c2w = se3_inverse(extrinsics)
    d = jnp.einsum("nij,nhwj->nhwi", c2w[:, :3, :3], Kinv_ray)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    c = c2w[:, :3, 3]
    m = jnp.cross(jnp.broadcast_to(c[:, None, None], d.shape), d)
    return jnp.concatenate([d, m], axis=-1)


def ref_view_index(n_views: int, strategy: str) -> int:
    """Static reference-view selection (the local-frame anchor)."""
    if strategy in ("first", "default"):
        return 0
    if strategy == "middle":
        return n_views // 2
    if strategy == "last":
        return n_views - 1
    raise ValueError(f"unknown ref_view_strategy {strategy!r}")


@highest_precision
def apply_camera_head(
    params: Params,
    camera_tokens: jax.Array,
    image_hw: tuple[int, int],
    ref_idx: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """camera_tokens: ``[N, D]`` (final-norm camera token per view).

    Returns ``(extrinsics [N, 3, 4] w2c, intrinsics [N, 3, 3])``.
    """
    x = camera_tokens.astype(jnp.float32)
    h = jax.nn.gelu(x @ params["w1"] + params["b1"])
    h = jax.nn.gelu(h @ params["w2"] + params["b2"])
    out = h @ params["w_out"] + params["b_out"]

    quat = out[:, 0:4]
    trans = out[:, 4:7]
    log_f = out[:, 7:9]
    pp_off = out[:, 9:11]

    R = quat_to_rotmat(quat)
    E_raw = jnp.concatenate([R, trans[:, :, None]], axis=-1)  # [N,3,4] w2c
    # normalise so the reference view is the world frame:
    #   E_i' = E_i ∘ E_ref^{-1}  ⇒  E_ref' = I
    E_ref_inv = se3_inverse(E_raw[ref_idx])
    extrinsics = se3_compose(E_raw, E_ref_inv[None])

    H, W = image_hw
    size = jnp.float32(max(H, W))
    fx = jnp.exp(log_f[:, 0]) * size
    fy = jnp.exp(log_f[:, 1]) * size
    cx = (0.5 + 0.1 * jnp.tanh(pp_off[:, 0])) * W
    cy = (0.5 + 0.1 * jnp.tanh(pp_off[:, 1])) * H
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    K = jnp.stack(
        [
            jnp.stack([fx, zeros, cx], -1),
            jnp.stack([zeros, fy, cy], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return extrinsics, K
