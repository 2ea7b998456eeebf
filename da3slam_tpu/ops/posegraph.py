"""Sim(3) pose-graph optimisation (Levenberg-Marquardt).

Native replacement for the reference's external ``Sim3LoopOptimizer``
(loop_utils, imported at da3_streaming.py:29-45 but not vendored; config
knobs at configs/config1.yaml:23-27: max_iterations 30, lambda_init 1e-6).

Nodes are chunk-to-world Sim(3) transforms; edges carry relative Sim(3)
measurements (sequential chunk alignments + loop closures).  The residual of
edge (i, j, M) with node transforms S_i, S_j (chunk→world) and measurement
M (chunk_j → chunk_i coords) is the 7-vector local chart

    r = [log s_e, so3_log(R_e), t_e]   where   E = S_i ∘ M ∘ S_j^{-1}
    (E = identity ⟺ the edge is satisfied)

Jacobians come from JAX autodiff.  Two solvers share one LM outer loop:

- ``dense`` — explicit ``jacfwd`` Jacobian + dense normal equations.  Right
  for the common case (tens of nodes — one per chunk): one small matmul and
  a tiny Cholesky-sized solve.
- ``cg`` — matrix-free LM-CG for long sequences.  Each edge touches exactly
  two nodes, so J is block-sparse; instead of materialising it, the damped
  Hessian product (JᵀJ + λI)v is computed as ``vjp(jvp(v))`` — two O(E)
  residual-shaped passes — and the step solved by conjugate gradients
  inside one jit (``lax.while_loop``).  Cost per LM iteration is
  O(E · cg_iters) instead of O((7K)³); memory is O(E + K).

``solver="auto"`` picks dense below ~100 nodes and CG above.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.core.transforms import (
    Sim3,
    highest_precision,
    sim3_compose,
    sim3_inverse,
    so3_exp,
    so3_log,
)


class PoseGraphEdges(NamedTuple):
    i: jax.Array  # [E] source node (earlier chunk)
    j: jax.Array  # [E] target node
    measurement: Sim3  # stacked [E]: chunk_j coords → chunk_i coords
    weight: jax.Array  # [E]


def _params_to_sim3(x: jax.Array) -> Sim3:
    """[K, 7] = [log s, rotvec, t] → stacked Sim3."""
    return Sim3(jnp.exp(x[:, 0]), so3_exp(x[:, 1:4]), x[:, 4:7])


def _sim3_to_params(T: Sim3) -> jax.Array:
    return jnp.concatenate(
        [jnp.log(T.s)[:, None], so3_log(T.R), T.t], axis=-1
    )


@highest_precision
def _edge_residuals(
    x: jax.Array, edges: PoseGraphEdges, huber_delta: float | None = None
) -> jax.Array:
    nodes = _params_to_sim3(x)
    Si = Sim3(nodes.s[edges.i], nodes.R[edges.i], nodes.t[edges.i])
    Sj = Sim3(nodes.s[edges.j], nodes.R[edges.j], nodes.t[edges.j])
    E = sim3_compose(sim3_compose(Si, edges.measurement), sim3_inverse(Sj))
    r = jnp.concatenate(
        [jnp.log(E.s)[:, None], so3_log(E.R), E.t], axis=-1
    )  # [E, 7]
    r = r * edges.weight[:, None]
    if huber_delta is not None:
        # robust kernel: edges whose residual norm exceeds delta grow
        # linearly, not quadratically, so one bad loop edge cannot dominate
        # the normal equations (a false loop otherwise corrupts the whole
        # trajectory — the reference's disabled loop stage had no kernel)
        # safe norm: plain jnp.linalg.norm has a 0/0 reverse-mode gradient
        # at exactly-satisfied edges (r = 0), which poisons the CG solver's
        # vjp with NaNs (forward-mode jacfwd happens to select it away)
        n = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-24)
        scale = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(n, 1e-12)))
        r = r * scale[:, None]
    return r.reshape(-1)


def _cg(Av, b, maxiter: int, tol2):
    """Conjugate gradients on Av x = b from x₀ = 0 (device-resident loop)."""

    def cond(state):
        _, _, _, rs, k = state
        return (k < maxiter) & (rs > tol2)

    def body(state):
        x, r, p, rs, k = state
        Ap = Av(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (x, r, p, rs_new, k + 1)

    state = (jnp.zeros_like(b), b, b, jnp.vdot(b, b), jnp.asarray(0))
    return jax.lax.while_loop(cond, body, state)[0]


def optimize_sim3_pose_graph(
    nodes_init: Sim3,
    edges: PoseGraphEdges,
    max_iterations: int = 30,
    lambda_init: float = 1e-6,
    fix_first: bool = True,
    huber_delta: float | None = 0.1,
    solver: str = "auto",
    cg_maxiter: int | None = None,
) -> Sim3:
    """LM optimisation; node 0 (the global anchor chunk) stays fixed.

    ``huber_delta`` bounds any single edge's influence (robust kernel in the
    residual); ``None`` restores plain least squares.  ``solver`` is
    "dense" | "cg" | "auto" (see module docstring); ``cg_maxiter`` caps the
    inner CG iterations (default: number of free parameters, capped at 250).
    """
    if solver not in ("auto", "dense", "cg"):
        raise ValueError(f"solver must be auto|dense|cg, got {solver!r}")
    x0 = np.asarray(_sim3_to_params(nodes_init))
    K = x0.shape[0]
    free = np.ones(K * 7, bool)
    if fix_first:
        free[:7] = False
    n_free = int(free.sum())
    use_cg = solver == "cg" or (solver == "auto" and n_free > 700)

    free_idx = jnp.asarray(np.where(free)[0])

    def residual_flat(x_free):
        x = jnp.asarray(x0).reshape(-1)
        x = x.at[free_idx].set(x_free)
        return _edge_residuals(x.reshape(K, 7), edges, huber_delta=huber_delta)

    res_fn = jax.jit(residual_flat)

    if use_cg:
        maxiter = cg_maxiter if cg_maxiter is not None else min(n_free, 250)

        @jax.jit
        def step_fn(x_free, lam):
            # linearise once at x_free; (JᵀJ + λI)v by jvp/vjp round trips
            r, jvp_fn = jax.linearize(residual_flat, x_free)
            vjp_fn = jax.linear_transpose(jvp_fn, x_free)
            (g,) = vjp_fn(r)

            def Av(v):
                (JtJv,) = vjp_fn(jvp_fn(v))
                return JtJv + lam * v

            # inexact-Newton forcing: solve to 1% of the gradient norm
            tol2 = 1e-4 * jnp.vdot(g, g)
            return _cg(Av, -g, maxiter, tol2)

        def trial_step(x_free, _cache, lam):
            return step_fn(x_free, jnp.asarray(lam, x_free.dtype)), _cache
    else:
        jac_fn = jax.jit(jax.jacfwd(residual_flat))

        def trial_step(x_free, cache, lam):
            if cache is None:
                J = jac_fn(x_free)
                r = res_fn(x_free)
                cache = (J.T @ J, J.T @ r)
            H, g = cache
            return jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), -g), cache

    x_free = jnp.asarray(x0.reshape(-1)[free])
    lam = lambda_init
    cost = float(jnp.sum(res_fn(x_free) ** 2))
    for _ in range(max_iterations):
        cache = None
        step_accepted = False
        for _try in range(8):
            delta, cache = trial_step(x_free, cache, lam)
            x_new = x_free + delta
            new_cost = float(jnp.sum(res_fn(x_new) ** 2))
            if new_cost < cost:
                x_free, cost = x_new, new_cost
                lam = max(lam * 0.5, 1e-12)
                step_accepted = True
                break
            lam *= 10.0
        if not step_accepted or float(jnp.linalg.norm(delta)) < 1e-10:
            break

    x = x0.reshape(-1).copy()
    x[free] = np.asarray(x_free)
    return _params_to_sim3(jnp.asarray(x.reshape(K, 7)))


def sequential_edges(sim3_list: list[Sim3]) -> PoseGraphEdges:
    """Edges from the odometry chain: entry k maps chunk k+1 → chunk k."""
    E = len(sim3_list)
    return PoseGraphEdges(
        i=jnp.arange(E),
        j=jnp.arange(1, E + 1),
        measurement=Sim3(
            jnp.stack([T.s for T in sim3_list]),
            jnp.stack([T.R for T in sim3_list]),
            jnp.stack([T.t for T in sim3_list]),
        ),
        weight=jnp.ones(E),
    )


def add_loop_edges(
    edges: PoseGraphEdges,
    loops: list[tuple[int, int, Sim3]],
    weight: float = 0.5,
) -> PoseGraphEdges:
    """Append loop edges (a, b, M) with M mapping chunk_b → chunk_a coords.

    Loop edges default to half the odometry weight: odometry measurements
    come from dense overlap registration of consecutive chunks and are far
    more reliable than appearance-triggered loop constraints.
    """
    if not loops:
        return edges
    li = jnp.asarray([a for a, _, _ in loops])
    lj = jnp.asarray([b for _, b, _ in loops])
    lm = Sim3(
        jnp.stack([T.s for _, _, T in loops]),
        jnp.stack([T.R for _, _, T in loops]),
        jnp.stack([T.t for _, _, T in loops]),
    )
    return PoseGraphEdges(
        i=jnp.concatenate([edges.i, li]),
        j=jnp.concatenate([edges.j, lj]),
        measurement=Sim3(
            jnp.concatenate([edges.measurement.s, lm.s]),
            jnp.concatenate([edges.measurement.R, lm.R]),
            jnp.concatenate([edges.measurement.t, lm.t]),
        ),
        weight=jnp.concatenate([edges.weight, jnp.full(len(loops), weight)]),
    )
