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

from da3slam_tpu.core.transforms import quat_to_rotmat, se3_compose, se3_inverse
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


def ref_view_index(n_views: int, strategy: str) -> int:
    """Static reference-view selection (the local-frame anchor)."""
    if strategy in ("first", "default"):
        return 0
    if strategy == "middle":
        return n_views // 2
    if strategy == "last":
        return n_views - 1
    raise ValueError(f"unknown ref_view_strategy {strategy!r}")


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
