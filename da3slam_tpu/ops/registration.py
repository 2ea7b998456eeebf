"""Point-set registration: (weighted) Umeyama and Huber-IRLS Sim(3).

Functional equivalents of the reference's alignment math
(utils/align.py:14-218, align_geometry.py:59-140) re-designed for XLA:

* fixed shapes — confidence filtering is expressed as *weights*, never as
  boolean gathers (the reference sampled 5000 random surviving points,
  utils/align.py:158-166; here low-confidence points simply get weight 0,
  which is the same estimator without dynamic shapes)
* no Python loops — IRLS runs in ``lax.fori_loop``
* all inner math in float32; the 3x3 SVD is tiny and well conditioned.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from da3slam_tpu.core.transforms import Sim3, highest_precision


class RegistrationResult(NamedTuple):
    transform: Sim3
    rmse: jax.Array  # weighted RMS residual after alignment
    n_effective: jax.Array  # effective number of contributing points


@highest_precision
def weighted_umeyama(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array,
    with_scale: bool = True,
    eps: float = 1e-8,
) -> Sim3:
    """Closed-form weighted Sim(3)/SE(3): ``dst ≈ s R src + t``.

    Args:
      src, dst: ``[N, 3]`` corresponding points.
      weights:  ``[N]`` non-negative weights (zeros drop points).
      with_scale: solve for scale (Sim3) or fix ``s = 1`` (SE3/Kabsch).

    Same estimator as reference ``weighted_umeyama_alignment``
    (utils/align.py:14-40) including the det-reflection fix.
    """
    w = weights.astype(jnp.float32)
    w = w / (jnp.sum(w) + eps)

    mu_src = jnp.sum(src * w[:, None], axis=0)
    mu_dst = jnp.sum(dst * w[:, None], axis=0)
    X = src - mu_src
    Y = dst - mu_dst

    Sigma = (Y * w[:, None]).T @ X  # [3, 3]
    U, S, Vt = jnp.linalg.svd(Sigma)
    det = jnp.linalg.det(U @ Vt)
    d = jnp.array([1.0, 1.0, 0.0], Sigma.dtype) + jnp.array([0.0, 0.0, 1.0], Sigma.dtype) * jnp.sign(det)
    R = (U * d[None, :]) @ Vt

    if with_scale:
        var_src = jnp.sum(w * jnp.sum(X * X, axis=1))
        s = jnp.sum(S * d) / (var_src + eps)
    else:
        s = jnp.asarray(1.0, src.dtype)

    t = mu_dst - s * (R @ mu_src)
    return Sim3(s, R, t)


def umeyama(src: jax.Array, dst: jax.Array, with_scale: bool = True) -> Sim3:
    """Unweighted Umeyama (reference utils/align.py:224-276 semantics)."""
    return weighted_umeyama(src, dst, jnp.ones(src.shape[0], src.dtype), with_scale)


def huber_weights(residuals: jax.Array, delta: float = 1.0) -> jax.Array:
    """IRLS weights of the Huber loss: ``ρ'(r)/r`` = 1 if |r|<=δ else δ/|r|.

    (reference utils/align.py:94-109, vectorised)
    """
    abs_r = jnp.abs(residuals)
    return jnp.where(abs_r <= delta, 1.0, delta / jnp.maximum(abs_r, 1e-12))


@highest_precision
def irls_sim3(
    src: jax.Array,
    dst: jax.Array,
    conf: jax.Array | None = None,
    delta: float = 0.1,
    max_iters: int = 5,
    min_points: int = 100,
    with_scale: bool = True,
    tol: float | None = None,
) -> RegistrationResult:
    """Huber-IRLS Sim(3) alignment of corresponding points ``dst ≈ T(src)``.

    Fixed-shape equivalent of reference ``align_two_point_clouds_irls``
    (utils/align.py:111-218): per-iteration weights are
    ``conf_i * huber'(r_i)/r_i`` normalised by their max; confidence gating
    (threshold = 0.1 * min of the two medians in the reference) should be
    pre-folded into ``conf`` by the caller as hard zeros.  Falls back to the
    identity transform when fewer than ``min_points`` carry weight
    (reference utils/align.py:154-156).  Defaults mirror configs/config1.yaml
    IRLS block (delta 0.1, max_iters 5).

    ``tol`` enables the reference's convergence early-exit
    (utils/align.py:199-213: stop when ``|Δs| + ‖ΔR‖_F + ‖Δt‖ < tol`` after
    an update): the loop becomes a ``lax.while_loop`` that skips remaining
    iterations once converged — same fixed shapes, fewer passes on easy
    overlaps.  ``tol=None`` (default) keeps the fixed-count ``fori_loop``.
    """
    n = src.shape[0]
    c = jnp.ones(n, jnp.float32) if conf is None else conf.astype(jnp.float32)
    finite = jnp.all(jnp.isfinite(src), -1) & jnp.all(jnp.isfinite(dst), -1)
    c = jnp.where(finite, c, 0.0)
    src = jnp.where(finite[:, None], src, 0.0)
    dst = jnp.where(finite[:, None], dst, 0.0)

    def step(T: Sim3) -> Sim3:
        pred = T.s * (src @ T.R.T) + T.t
        r = jnp.linalg.norm(dst - pred, axis=-1)
        w = c * huber_weights(r, delta)
        w = w / (jnp.max(w) + 1e-8)
        return weighted_umeyama(src, dst, w, with_scale=with_scale)

    T0 = Sim3(jnp.asarray(1.0, jnp.float32), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    if tol is None:
        T = jax.lax.fori_loop(0, max_iters, lambda _, T: step(T), T0)
    else:
        def cond(carry):
            i, _, change = carry
            return (i < max_iters) & (change >= tol)

        def body(carry):
            i, T, _ = carry
            T_new = step(T)
            change = (
                jnp.abs(T_new.s - T.s)
                + jnp.linalg.norm(T_new.R - T.R)
                + jnp.linalg.norm(T_new.t - T.t)
            )
            return i + 1, T_new, change

        _, T, _ = jax.lax.while_loop(cond, body, (0, T0, jnp.asarray(jnp.inf)))

    pred = T.s * (src @ T.R.T) + T.t
    r2 = jnp.sum((dst - pred) ** 2, axis=-1)
    w_final = c / (jnp.sum(c) + 1e-8)
    rmse = jnp.sqrt(jnp.sum(w_final * r2))

    n_eff = jnp.sum(c > 0)
    enough = n_eff >= min_points
    T = Sim3(
        jnp.where(enough, T.s, 1.0),
        jnp.where(enough, T.R, jnp.eye(3, dtype=T.R.dtype)),
        jnp.where(enough, T.t, jnp.zeros(3, T.t.dtype)),
    )
    return RegistrationResult(T, jnp.where(enough, rmse, 0.0), n_eff)
