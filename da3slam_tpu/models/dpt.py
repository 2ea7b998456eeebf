"""DPT-style dense prediction head: patch tokens → depth + confidence maps.

Standard DPT decode (project → reassemble at 4 scales → residual-conv fusion
→ output head), implemented NHWC with ``lax.conv_general_dilated`` so XLA
maps the convs onto the MXU.  Upsampling uses bilinear resize + conv (no
transposed convs — avoids checkerboard artifacts and keeps shapes friendly
to the 14-pixel patch stride, where power-of-two transposed strides don't
divide evenly).

Output contract (reference solver.py:171-176): depth ``[N, H, W]`` positive,
conf ``[N, H, W]`` ≈ ≥ 1.0 (the streaming path subtracts 1.0,
da3_streaming.py:276).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from da3slam_tpu.models.config import ModelConfig

Params = Any


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def conv2d(p: Params, x: jax.Array, stride: int = 1) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _resize(x: jax.Array, h: int, w: int) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


def init_dpt(key: jax.Array, cfg: ModelConfig) -> Params:
    D = cfg.embed_dim
    F = cfg.dpt_dim
    feats = cfg.dpt_features
    keys = iter(jax.random.split(key, 64))

    def conv(kh, kw, cin, cout):
        return {"kernel": _conv_init(next(keys), kh, kw, cin, cout), "bias": jnp.zeros((cout,))}

    params: dict[str, Any] = {
        # per-tap 1x1 projection from embed dim to stage feature dim
        "project": [conv(1, 1, D, f) for f in feats],
        # per-stage 3x3 conv into the shared fusion dim
        "stage_rn": [conv(3, 3, f, F) for f in feats],
        # residual conv units: two 3x3 convs per fusion step, 2 steps per stage
        "fusion": [
            {
                "rcu1": [conv(3, 3, F, F), conv(3, 3, F, F)],
                "rcu2": [conv(3, 3, F, F), conv(3, 3, F, F)],
                "out": conv(1, 1, F, F),
            }
            for _ in feats
        ],
        "head1": conv(3, 3, F, F // 2),
        "head2": conv(3, 3, F // 2, 32),
        # 8 channels: depth, conf, ray direction (3), ray moment (3) — the
        # depth-ray representation (pose recoverable from the ray map,
        # models/camera.py:pose_from_rays; reference exposes it as
        # use_ray_pose=True, main_align.py:89)
        "head_out": conv(1, 1, 32, 8),
    }
    return params


def _rcu(p: Params, x: jax.Array) -> jax.Array:
    h = conv2d(p[0], jax.nn.relu(x))
    h = conv2d(p[1], jax.nn.relu(h))
    return x + h


def apply_dpt(
    params: Params,
    taps: list[jax.Array],
    grid: tuple[int, int],
    out_hw: tuple[int, int],
    cfg: ModelConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """taps: 4 × ``[N, S, D]`` encoder activations (with prefix tokens).

    Returns ``(depth [N, H, W], conf [N, H, W], rays [N, H, W, 6])`` where
    rays = [unit direction | moment] (Plücker, camera chunk frame).
    """
    hp, wp = grid
    H, W = out_hw
    n_prefix = 1 + cfg.num_register_tokens

    # reassemble: strip prefix tokens, project, reshape to grid, rescale
    scales = (4.0, 2.0, 1.0, 0.5)
    stages = []
    for k, tap in enumerate(taps):
        t = tap[:, n_prefix:, :]
        N = t.shape[0]
        fmap = t.reshape(N, hp, wp, -1)
        fmap = conv2d(params["project"][k], fmap)
        sh, sw = max(int(hp * scales[k]), 1), max(int(wp * scales[k]), 1)
        fmap = _resize(fmap, sh, sw)
        stages.append(conv2d(params["stage_rn"][k], fmap))

    # fusion: deepest → shallowest, upsampling to each finer stage's grid
    y = _rcu(params["fusion"][3]["rcu1"], stages[3])
    y = conv2d(params["fusion"][3]["out"], y)
    for k in (2, 1, 0):
        y = _resize(y, stages[k].shape[1], stages[k].shape[2])
        x = _rcu(params["fusion"][k]["rcu1"], stages[k])
        y = _rcu(params["fusion"][k]["rcu2"], y + x)
        y = conv2d(params["fusion"][k]["out"], y)

    # output head at full image resolution
    y = conv2d(params["head1"], y)
    y = _resize(y, H, W)
    y = jax.nn.relu(conv2d(params["head2"], y))
    out = conv2d(params["head_out"], y).astype(jnp.float32)

    depth = jax.nn.softplus(out[..., 0])
    conf = 1.0 + jax.nn.softplus(out[..., 1])
    d = out[..., 2:5]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    m = out[..., 5:8]
    m = m - jnp.sum(m * d, axis=-1, keepdims=True) * d  # moment ⊥ direction
    rays = jnp.concatenate([d, m], axis=-1)
    return depth, conf, rays
