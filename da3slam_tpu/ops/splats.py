"""3DGS refinement: multi-view consistency optimization over a splat cloud.

The exporter (inout/export3d.py) initialises gaussians from depth maps —
good geometry where depth is right, floaters where it isn't.  This pass
optimizes the splats against ALL views jointly (the reference's
``main_3dgs.py`` was a 5-line stub; full rasterized 3DGS training is out of
scope, but multi-view consistency is where most of the visual win is):

  geometric   — each splat center projects into every view; its projected
                depth must match that view's depth map.  A splat in FRONT
                of the observed surface is a floater (penalised); a splat
                far BEHIND it is occluded in that view (masked out, not
                evidence either way).
  photometric — the splat's color must match what the visible views see at
                its projection (bilinear-sampled), robustly (Huber), so
                per-view exposure outliers don't drag colors.
  opacity     — splats visible-and-consistent in few views fade:
                multi-view support gates opacity, the optimization-era
                version of 3DGS pruning.

TPU shape discipline: everything is fixed-shape [V, G] — V views × G
splats, bilinear gathers into the depth/image maps, `lax.scan` over Adam
steps, one jit.  No rasterization, no sorting, no dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from da3slam_tpu.core.geometry import project_points


class RefineResult(NamedTuple):
    points: jax.Array  # [G, 3]
    colors: jax.Array  # [G, 3] float in [0, 1]
    opacity: jax.Array  # [G] in (0, 1)
    support: jax.Array  # [G] fraction of views that see the splat consistently
    losses: jax.Array  # [iters] total loss trace


def bilinear_sample(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample ``img [H, W]`` or ``[H, W, C]`` at continuous pixel coords
    ``uv [G, 2]`` (u = x/col, v = y/row), clamped to the border."""
    H, W = img.shape[0], img.shape[1]
    u = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    fu = u - u0
    fv = v - v0
    if img.ndim == 3:
        fu, fv = fu[:, None], fv[:, None]
    g00 = img[v0, u0]
    g01 = img[v0, u0 + 1]
    g10 = img[v0 + 1, u0]
    g11 = img[v0 + 1, u0 + 1]
    top = g00 * (1 - fu) + g01 * fu
    bot = g10 * (1 - fu) + g11 * fu
    return top * (1 - fv) + bot * fv


def _view_terms(pts, colors, depth_map, image, K, E, occl_margin, huber_delta):
    """Per-view residual terms for all splats: (geo, photo, visible)."""
    uv, z = project_points(pts[None], K[None], E[None])
    uv, z = uv[0], z[0]
    H, W = depth_map.shape
    inb = (
        (uv[:, 0] >= 0.0) & (uv[:, 0] <= W - 1.0)
        & (uv[:, 1] >= 0.0) & (uv[:, 1] <= H - 1.0)
        & (z > 1e-6)
    )
    d_obs = bilinear_sample(depth_map, uv)
    valid = inb & (d_obs > 1e-6)
    r = (z - d_obs) / jnp.maximum(d_obs, 1e-6)
    # r << 0: splat floats in front of the surface — inconsistent, penalise.
    # r >> 0: surface in front of the splat — the splat is occluded here;
    # no evidence about it, mask the view out.
    occluded = r > occl_margin
    visible = valid & ~occluded

    ah = jnp.abs(r)
    geo = jnp.where(ah <= huber_delta, 0.5 * r * r / huber_delta,
                    ah - 0.5 * huber_delta)
    # photometric term trains COLORS only: the projection is
    # stop-gradiented, else its position-gradient drags splats laterally
    # toward whatever pixels happen to match their (still-converging)
    # colors — measured to corrupt geometry faster than the depth term
    # fixes it
    c_obs = bilinear_sample(image, jax.lax.stop_gradient(uv))  # [G, 3]
    photo = jnp.sum(jnp.abs(colors - c_obs), axis=-1)
    w = visible.astype(jnp.float32)
    # support counts CONSISTENT views, not merely unoccluded ones — a
    # floater in front of the surface is perfectly visible everywhere and
    # would otherwise keep full support (and opacity) while being wrong
    cons = (visible & (ah <= occl_margin)).astype(jnp.float32)
    return geo * w, photo * w, w, cons


@functools.partial(
    jax.jit,
    static_argnames=("iters", "lr_points_rel", "lr_colors", "lr_opacity",
                     "occl_margin", "huber_delta", "photo_weight",
                     "support_weight"),
)
def refine_splats(
    points: jax.Array,  # [G, 3] world
    colors: jax.Array,  # [G, 3] float in [0, 1] (or uint8, converted)
    opacity: jax.Array,  # [G] in (0, 1)
    depth_maps: jax.Array,  # [V, H, W]
    images: jax.Array,  # [V, H, W, 3] float in [0, 1] (or uint8)
    K: jax.Array,  # [V, 3, 3]
    extrinsics: jax.Array,  # [V, 3, 4] w2c
    iters: int = 60,
    lr_points_rel: float = 3e-4,
    lr_colors: float = 2e-2,
    lr_opacity: float = 5e-2,
    occl_margin: float = 0.05,
    huber_delta: float = 0.02,
    photo_weight: float = 0.2,
    support_weight: float = 0.1,
) -> RefineResult:
    """Optimize splat positions / colors / opacity for multi-view
    consistency (module docstring).  Adam over a ``lax.scan``; one jit.

    Adam's effective step is ~lr per parameter per iteration regardless of
    gradient magnitude, so each group gets its own scale: positions step at
    ``lr_points_rel × median scene depth`` (world units), colors in their
    [0, 1] range, opacity in logit units."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if colors.dtype == jnp.uint8:
        colors = colors.astype(jnp.float32) / 255.0
    depth_maps = depth_maps.astype(jnp.float32)
    eps = 1e-6
    logit_op = jnp.log(jnp.clip(opacity, eps, 1 - eps) /
                       (1 - jnp.clip(opacity, eps, 1 - eps)))
    # positions move along their mean viewing ray direction implicitly via
    # the geometric gradient; full 3-DoF motion is allowed but the depth
    # residual dominates, so drift stays on-ray in practice
    params0 = {"points": points.astype(jnp.float32),
               "colors": colors, "logit_op": logit_op}

    terms = jax.vmap(_view_terms, in_axes=(None, None, 0, 0, 0, 0, None, None))

    def loss_fn(params):
        geo, photo, w, cons = terms(params["points"], params["colors"],
                                    depth_maps, images, K, extrinsics,
                                    occl_margin, huber_delta)
        nvis = jnp.maximum(w.sum(axis=0), 1.0)  # [G]
        op = jax.nn.sigmoid(params["logit_op"])
        geo_g = geo.sum(axis=0) / nvis
        photo_g = photo.sum(axis=0) / nvis
        support = cons.mean(axis=0)
        # Data terms are NOT opacity-weighted: multiplying them by op makes
        # "turn everything transparent" the global minimum (observed —
        # opacity collapsed to 0.25 while geometry stood still).  Opacity
        # instead tracks multi-view support: supported splats are pushed
        # opaque, unsupported ones transparent (the optimization-era form
        # of 3DGS pruning); support is stop-gradiented so opacity cannot
        # "fix" itself by moving the splat somewhere merely visible.
        sg = jax.lax.stop_gradient(support)
        op_target = op * (1.0 - sg) + (1.0 - op) * sg
        loss = jnp.mean(geo_g) + photo_weight * jnp.mean(photo_g) \
            + support_weight * jnp.mean(op_target)
        return loss, support

    import optax

    scene_scale = jnp.median(jnp.where(depth_maps > 1e-6, depth_maps, jnp.nan))
    scene_scale = jnp.nan_to_num(scene_scale, nan=1.0)
    tx = optax.multi_transform(
        {
            "points": optax.chain(
                optax.adam(1.0),
                optax.scale(lr_points_rel)  # × scene scale applied below
            ),
            "colors": optax.adam(lr_colors),
            "logit_op": optax.adam(lr_opacity),
        },
        {"points": "points", "colors": "colors", "logit_op": "logit_op"},
    )
    opt0 = tx.init(params0)

    def step(carry, _):
        params, opt = carry
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        # position steps are in world units: scale by the scene's depth
        # (traced, so applied here rather than inside the optax chain)
        updates = {**updates, "points": updates["points"] * scene_scale}
        params = optax.apply_updates(params, updates)
        return (params, opt), loss

    (params, _), losses = jax.lax.scan(step, (params0, opt0), None, length=iters)
    _, support = loss_fn(params)
    return RefineResult(
        points=params["points"],
        colors=jnp.clip(params["colors"], 0.0, 1.0),
        opacity=jax.nn.sigmoid(params["logit_op"]),
        support=support,
        losses=losses,
    )


def ssim(a: jax.Array, b: jax.Array, window: int = 11, sigma: float = 1.5,
         c1: float = 0.01**2, c2: float = 0.03**2) -> jax.Array:
    """Mean SSIM between ``[H, W, C]`` images in [0, 1] (separable gaussian
    window as two depthwise convs — fixed-shape, differentiable)."""
    r = window // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()

    C = a.shape[-1]

    def blur(img):  # [H, W, C] → gaussian-filtered, same shape
        z = img.transpose(2, 0, 1)[:, None]          # [C, 1, H, W]
        kh = jnp.tile(g[None, None, :, None], (C, 1, 1, 1))   # [C, 1, w, 1]
        kw = jnp.tile(g[None, None, None, :], (C, 1, 1, 1))
        dn = ("NCHW", "OIHW", "NCHW")
        z = jax.lax.conv_general_dilated(
            z.transpose(1, 0, 2, 3), kh, (1, 1), [(r, r), (0, 0)],
            dimension_numbers=dn, feature_group_count=C)
        z = jax.lax.conv_general_dilated(
            z, kw, (1, 1), [(0, 0), (r, r)],
            dimension_numbers=dn, feature_group_count=C)
        return z[0].transpose(1, 2, 0)

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a**2
    var_b = blur(b * b) - mu_b**2
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)


class TrainResult(NamedTuple):
    points: jax.Array    # [G, 3]
    scales: jax.Array    # [G, 3] per-axis radii (σ)
    quats: jax.Array     # [G, 4] (w,x,y,z), unit
    colors: jax.Array    # [G, 3] in [0, 1]
    opacity: jax.Array   # [G] in (0, 1)
    losses: jax.Array    # [iters] photometric loss trace


@functools.partial(
    jax.jit,
    static_argnames=("iters", "img_hw", "tile", "max_per_tile", "fan",
                     "lr_points_rel", "lr_scales", "lr_quats", "lr_colors",
                     "lr_opacity", "scale_reg", "ssim_weight",
                     "densify_every", "prune_opacity", "seed"),
)
def train_splats(
    points: jax.Array,     # [G, 3] world
    scales: jax.Array,     # [G] or [G, 3] radii (σ, world units)
    quats: jax.Array,      # [G, 4] (w,x,y,z)
    colors: jax.Array,     # [G, 3] float [0,1] or uint8
    opacity: jax.Array,    # [G] in (0, 1)
    images: jax.Array,     # [V, H, W, 3] float [0,1] or uint8
    K: jax.Array,          # [V, 3, 3]
    extrinsics: jax.Array,  # [V, 3, 4] w2c
    img_hw: tuple[int, int],
    iters: int = 100,
    tile: int = 16,
    max_per_tile: int = 256,
    fan: int = 5,
    lr_points_rel: float = 2e-4,
    lr_scales: float = 5e-3,
    lr_quats: float = 1e-3,
    lr_colors: float = 2.5e-2,
    lr_opacity: float = 5e-2,
    scale_reg: float = 0.01,
    ssim_weight: float = 0.2,
    densify_every: int = 0,
    prune_opacity: float = 0.02,
    seed: int = 0,
) -> TrainResult:
    """Appearance-grade 3DGS training: optimize every splat attribute
    against the rendered-vs-observed photometric loss through the
    differentiable tile rasterizer (ops/rasterize.py).

    ``refine_splats`` above is the geometric pass (projective depth
    consistency, no rendering); this is the photometric pass the
    reference's ``main_3dgs.py`` stub never grew.  Scan over Adam steps,
    inner scan over views with rematerialised renders (the [tiles, K, px]
    alpha tensors are recomputed in the backward instead of stored per
    view), one jit.  A soft scale regulariser keeps footprints inside the
    binner's ``fan`` truncation window.

    Loss = (1 − ssim_weight)·L1 + ssim_weight·(1 − SSIM)/2, the standard
    3DGS mix (ssim_weight=0 recovers pure L1).

    ``densify_every > 0`` enables FIXED-BUDGET densification: CUDA 3DGS
    grows/shrinks the splat array (prune + clone/split, dynamic shapes);
    here the budget G is constant and pruning/cloning is an in-place
    RESAMPLE — every ``densify_every`` steps, splats whose opacity fell
    below ``prune_opacity`` are overwritten with jittered, shrunk clones
    of the highest-position-gradient splats (the under-reconstructed
    regions densification exists to fix), and their Adam moments reset.
    Same mechanism, XLA-friendly shapes."""
    from da3slam_tpu.ops.rasterize import rasterize

    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if colors.dtype == jnp.uint8:
        colors = colors.astype(jnp.float32) / 255.0
    if scales.ndim == 1:
        scales = scales[:, None] * jnp.ones((1, 3), jnp.float32)
    eps = 1e-6
    opacity = jnp.clip(opacity, eps, 1 - eps)
    params0 = {
        "points": points.astype(jnp.float32),
        "log_scales": jnp.log(jnp.maximum(scales.astype(jnp.float32), 1e-8)),
        "quats": quats.astype(jnp.float32),
        "colors": colors.astype(jnp.float32),
        "logit_op": jnp.log(opacity / (1 - opacity)),
    }

    # footprint cap for the scale regulariser: a splat whose 3σ radius
    # exceeds ~fan/2 tiles starts getting truncated by the binner
    depth_med = jnp.median(jnp.linalg.norm(
        points - jnp.mean(points, axis=0), axis=-1))
    f_px = jnp.mean(K[:, 0, 0])
    max_sigma = jnp.maximum((fan / 2) * tile / 3.0 * depth_med / f_px, 1e-6)

    @functools.partial(jax.checkpoint, static_argnums=())
    def view_loss(params, view):
        img, k, e = view
        rgb, _, _ = rasterize(
            params["points"], jnp.exp(params["log_scales"]), params["quats"],
            jnp.clip(params["colors"], 0.0, 1.0),
            jax.nn.sigmoid(params["logit_op"]),
            k, e, img_hw, tile=tile, max_per_tile=max_per_tile, fan=fan,
        )
        l1 = jnp.mean(jnp.abs(rgb - img))
        if ssim_weight == 0.0:
            return l1
        return (1.0 - ssim_weight) * l1 + ssim_weight * 0.5 * (1.0 - ssim(rgb, img))

    def loss_fn(params):
        def body(acc, view):
            return acc + view_loss(params, view), None

        total, _ = jax.lax.scan(body, 0.0, (images, K, extrinsics))
        photo = total / images.shape[0]
        reg = jnp.mean(jax.nn.relu(
            params["log_scales"] - jnp.log(max_sigma)))
        return photo + scale_reg * reg, photo

    import optax

    scene_scale = jnp.maximum(depth_med, 1e-6)
    tx = optax.multi_transform(
        {
            "points": optax.chain(optax.adam(1.0), optax.scale(lr_points_rel)),
            "log_scales": optax.adam(lr_scales),
            "quats": optax.adam(lr_quats),
            "colors": optax.adam(lr_colors),
            "logit_op": optax.adam(lr_opacity),
        },
        {k: k for k in params0},
    )
    opt0 = tx.init(params0)
    G = points.shape[0]

    def resample(args):
        """Fixed-budget densify (docstring): overwrite pruned slots with
        shrunk, jittered clones of the top-gradient live splats, and zero
        the resampled slots' Adam moments (stale curvature is wrong for
        the new splat)."""
        params, opt, grad_ema, key = args
        dead = jax.nn.sigmoid(params["logit_op"]) < prune_opacity   # [G]
        score = jnp.where(dead, -jnp.inf, grad_ema)
        donors = jnp.argsort(-score)                       # [G] best-first
        # i-th dead slot clones the i-th best donor
        dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        src = donors[jnp.clip(dead_rank, 0, G - 1)]        # [G]
        jit_dir = jax.random.normal(key, (G, 3))
        sigma = jnp.exp(params["log_scales"][src])         # donor σ (axis-aligned
        # jitter — cheaper than rotating into the donor frame, same intent)

        def mix(dst, donor_val):
            d = dead.reshape((G,) + (1,) * (dst.ndim - 1))
            return jnp.where(d, donor_val, dst)

        new_params = {
            # clone lands one donor-σ away at 1/1.6 the donor's scale (the
            # 3DGS split ratio) with a resurrected opacity of ≥ 0.1
            "points": mix(params["points"], params["points"][src] + jit_dir * sigma),
            "log_scales": mix(params["log_scales"],
                              params["log_scales"][src] - jnp.log(1.6)),
            "quats": mix(params["quats"], params["quats"][src]),
            "colors": mix(params["colors"], params["colors"][src]),
            "logit_op": mix(params["logit_op"],
                            jnp.maximum(params["logit_op"][src],
                                        jnp.log(0.1 / 0.9))),
        }

        def zero_dead_moments(x):
            # multi_transform state leaves mirror param shapes (adam mu/nu
            # per group) plus scalar counts; only the [G, ...] ones are
            # per-splat moments
            if isinstance(x, jax.Array) and x.ndim >= 1 and x.shape[0] == G:
                return mix(x, jnp.zeros_like(x))
            return x

        new_opt = jax.tree_util.tree_map(zero_dead_moments, opt)
        return new_params, new_opt, jnp.where(dead, 0.0, grad_ema)

    def step(carry, i):
        params, opt, grad_ema, key = carry
        (_, photo), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        updates = {**updates, "points": updates["points"] * scene_scale}
        params = optax.apply_updates(params, updates)
        grad_ema = 0.9 * grad_ema + 0.1 * jnp.linalg.norm(grads["points"], axis=-1)
        if densify_every > 0:
            key, sub = jax.random.split(key)
            do = (i % densify_every) == (densify_every - 1)
            params, opt, grad_ema = jax.lax.cond(
                do, resample, lambda a: (a[0], a[1], a[2]),
                (params, opt, grad_ema, sub),
            )
        return (params, opt, grad_ema, key), photo

    carry0 = (params0, opt0, jnp.zeros((G,), jnp.float32),
              jax.random.PRNGKey(seed))
    (params, _, _, _), losses = jax.lax.scan(step, carry0, jnp.arange(iters))
    return TrainResult(
        points=params["points"],
        scales=jnp.exp(params["log_scales"]),
        quats=params["quats"] / jnp.maximum(
            jnp.linalg.norm(params["quats"], axis=-1, keepdims=True), 1e-12),
        colors=jnp.clip(params["colors"], 0.0, 1.0),
        opacity=jax.nn.sigmoid(params["logit_op"]),
        losses=losses,
    )
