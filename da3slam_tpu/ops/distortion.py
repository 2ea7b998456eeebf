"""Lens distortion models + iterative undistortion.

Functional equivalent of the vendored VGGT distortion module
(src/vggt/dependency/distortion.py:32-153): polynomial radial models (1-2
coefficients) and the 4-parameter OpenCV model (radial + tangential), with
Newton-iteration undistortion.  Batched over arbitrary leading dims; the
Newton solve uses exact autodiff Jacobians (2x2 closed-form solve) under
``lax.fori_loop`` instead of the reference's torch loop.

Coordinates are normalised image coordinates (pre-intrinsics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def apply_distortion(uv: jax.Array, params: jax.Array) -> jax.Array:
    """Distort normalised coords ``[..., 2]``.

    ``params``: 1 (k1), 2 (k1,k2) → radial; 4 (k1,k2,p1,p2) → OpenCV.
    """
    u, v = uv[..., 0], uv[..., 1]
    r2 = u * u + v * v
    n = params.shape[-1]
    k1 = params[..., 0]
    k2 = params[..., 1] if n >= 2 else jnp.zeros_like(k1)
    radial = 1.0 + r2 * (k1 + r2 * k2)
    if n >= 4:
        p1, p2 = params[..., 2], params[..., 3]
        du = 2.0 * p1 * u * v + p2 * (r2 + 2.0 * u * u)
        dv = p1 * (r2 + 2.0 * v * v) + 2.0 * p2 * u * v
    else:
        du = dv = 0.0
    return jnp.stack([u * radial + du, v * radial + dv], axis=-1)


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def undistort_points(
    uv_observed: jax.Array,
    params: jax.Array,
    max_iterations: int = 10,
) -> jax.Array:
    """Invert :func:`apply_distortion` by Newton iteration.

    Solves ``distort(x) = uv_observed`` per point with the exact 2x2
    Jacobian (autodiff), fixed iteration count (reference
    ``iterative_undistortion``, src/vggt/dependency/distortion.py:51-96).
    """
    flat = uv_observed.reshape(-1, 2)

    def per_point(x_obs):
        def f(x):
            return apply_distortion(x, params)

        def body(_, x):
            y, J = f(x), jax.jacfwd(f)(x)
            # closed-form 2x2 solve with determinant guard
            det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            r = y - x_obs
            dx = jnp.stack(
                [
                    (J[1, 1] * r[0] - J[0, 1] * r[1]) / det,
                    (-J[1, 0] * r[0] + J[0, 0] * r[1]) / det,
                ]
            )
            return x - dx

        return jax.lax.fori_loop(0, max_iterations, body, x_obs)

    out = jax.vmap(per_point)(flat)
    return out.reshape(uv_observed.shape)


def distort_pixels(
    pixels: jax.Array, K: jax.Array, params: jax.Array
) -> jax.Array:
    """Distort pixel coordinates: pixels → normalised → distort → pixels."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    norm = jnp.stack(
        [(pixels[..., 0] - cx) / fx, (pixels[..., 1] - cy) / fy], axis=-1
    )
    d = apply_distortion(norm, params)
    return jnp.stack([d[..., 0] * fx + cx, d[..., 1] * fy + cy], axis=-1)
