"""DPT-style dense prediction head: patch tokens → depth + confidence maps.

Standard DPT decode (project → reassemble at 4 scales → residual-conv fusion
→ output head), implemented NHWC with ``lax.conv_general_dilated`` so XLA
maps the convs onto the MXU.

Tap reassembly uses the published DPT/MiDaS **learned resize layers**
(stride-4 and stride-2 transposed convs for the shallow taps, identity,
stride-2 conv for the deepest) so released torch checkpoints import with
every tensor consumed (models/torch_import.py).  Because kernel == stride,
the transposed convs lower to one einsum + reshape — a pure MXU op with no
checkerboard overlap.  Fusion upsampling reproduces the published heads'
``interpolate(align_corners=True)`` exactly, as two dense matmuls.

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


def _ac_matrix(out_size: int, in_size: int) -> jax.Array:
    """Row-stochastic ``[out, in]`` align-corners bilinear weights.

    The published DPT heads upsample with ``interpolate(...,
    align_corners=True)``; expressing that as two small dense matmuls (rows,
    then columns) reproduces it exactly AND keeps the op on the MXU instead
    of a gather pipeline.  Shapes are static under jit, so the matrices are
    compile-time constants."""
    if in_size == 1 or out_size == 1:
        return jnp.ones((out_size, in_size)) / in_size
    pos = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2)
    frac = pos - lo
    rows = jnp.arange(out_size)
    W = jnp.zeros((out_size, in_size))
    W = W.at[rows, lo].add(1.0 - frac)
    W = W.at[rows, lo + 1].add(frac)
    return W


def _resize_ac(x: jax.Array, h: int, w: int) -> jax.Array:
    """Align-corners bilinear resize of ``[N, H, W, C]`` via two matmuls."""
    Wh = _ac_matrix(h, x.shape[1]).astype(x.dtype)
    Ww = _ac_matrix(w, x.shape[2]).astype(x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", Wh, x)
    return jnp.einsum("pw,nowc->nopc", Ww, y)


def _deconv_exact(p: Params, x: jax.Array, s: int) -> jax.Array:
    """ConvTranspose with kernel == stride == ``s`` (the DPT resize layers):
    each input pixel expands to an independent s×s output tile, so the op is
    exactly one matmul ``cin → cout·s·s`` plus a reshape — no overlap, no
    checkerboard, full MXU.  Matches torch ``ConvTranspose2d(k=s, s=s, p=0)``
    with our kernel stored HWIO ``[s, s, cin, cout]``."""
    N, h, w, cin = x.shape
    k = p["kernel"].astype(x.dtype)  # [s, s, cin, cout]
    cout = k.shape[-1]
    y = jnp.einsum("nhwc,abcd->nhawbd", x, k)  # [N, h, s, w, s, cout]
    y = y.reshape(N, h * s, w * s, cout)
    return y + p["bias"].astype(x.dtype)


def _conv_s2(p: Params, x: jax.Array) -> jax.Array:
    """3×3 stride-2 conv with torch's symmetric padding=1 (SAME would pad
    asymmetrically at even sizes and drift from the released head)."""
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


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
        # learned tap resampling (published DPT resize_layers): 4x / 2x
        # transposed convs, identity at tap 2, stride-2 3x3 conv at tap 3
        "resize": {
            "r0": conv(4, 4, feats[0], feats[0]),
            "r1": conv(2, 2, feats[1], feats[1]),
            "r3": conv(3, 3, feats[3], feats[3]),
        },
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

    # reassemble: strip prefix tokens, project, reshape to grid, resample.
    # Learned resize layers (init_dpt "resize") when present; older native
    # checkpoints without them fall back to bilinear at the same scales.
    scales = (4.0, 2.0, 1.0, 0.5)
    resize = params.get("resize") if isinstance(params, dict) else None
    stages = []
    for k, tap in enumerate(taps):
        t = tap[:, n_prefix:, :]
        N = t.shape[0]
        fmap = t.reshape(N, hp, wp, -1)
        fmap = conv2d(params["project"][k], fmap)
        if resize is not None:
            if k == 0:
                fmap = _deconv_exact(resize["r0"], fmap, 4)
            elif k == 1:
                fmap = _deconv_exact(resize["r1"], fmap, 2)
            elif k == 3:
                fmap = _conv_s2(resize["r3"], fmap)
        else:
            sh, sw = max(int(hp * scales[k]), 1), max(int(wp * scales[k]), 1)
            fmap = _resize(fmap, sh, sw)
        stages.append(conv2d(params["stage_rn"][k], fmap))

    # fusion: deepest → shallowest, exactly the published refinenet wiring
    # (MiDaS FeatureFusionBlock): the deepest stage has a single input so
    # only its resConfUnit2 runs (its resConfUnit1 weights exist in released
    # checkpoints but are never executed — mirrored here); each stage ends
    # with align-corners upsample to the next grid THEN its 1x1 out_conv.
    y = _rcu(params["fusion"][3]["rcu2"], stages[3])
    for k in (2, 1, 0):
        y = _resize_ac(y, stages[k].shape[1], stages[k].shape[2])
        y = conv2d(params["fusion"][k + 1]["out"], y)
        x = _rcu(params["fusion"][k]["rcu1"], stages[k])
        y = _rcu(params["fusion"][k]["rcu2"], y + x)
    # refinenet1's trailing 2x upsample (to 8x the patch grid) + out_conv
    y = _resize_ac(y, 2 * stages[0].shape[1], 2 * stages[0].shape[2])
    y = conv2d(params["fusion"][0]["out"], y)

    # output head at full image resolution.  These stay on XLA's conv: a
    # hand-written tap-panel Pallas kernel (ops/conv3x3.py) is a measured
    # negative at every head shape — XLA runs the standalone convs at
    # ~58 TF/s, 2.5x the round-3 in-model trace's 24 TF/s (ROADMAP r4)
    y = conv2d(params["head1"], y)
    y = _resize_ac(y, H, W)
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
