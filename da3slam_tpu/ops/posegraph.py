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

Jacobians come from JAX autodiff; the normal equations are dense (the graph
has tens of nodes — one per chunk), solved with LM damping.
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
        n = jnp.linalg.norm(r, axis=-1)
        scale = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(n, 1e-12)))
        r = r * scale[:, None]
    return r.reshape(-1)


def optimize_sim3_pose_graph(
    nodes_init: Sim3,
    edges: PoseGraphEdges,
    max_iterations: int = 30,
    lambda_init: float = 1e-6,
    fix_first: bool = True,
    huber_delta: float | None = 0.1,
) -> Sim3:
    """LM optimisation; node 0 (the global anchor chunk) stays fixed.

    ``huber_delta`` bounds any single edge's influence (robust kernel in the
    residual); ``None`` restores plain least squares.
    """
    x0 = np.asarray(_sim3_to_params(nodes_init))
    K = x0.shape[0]
    free = np.ones(K * 7, bool)
    if fix_first:
        free[:7] = False

    free_idx = jnp.asarray(np.where(free)[0])

    def residual_flat(x_free):
        x = jnp.asarray(x0).reshape(-1)
        x = x.at[free_idx].set(x_free)
        return _edge_residuals(x.reshape(K, 7), edges, huber_delta=huber_delta)

    res_fn = jax.jit(residual_flat)
    jac_fn = jax.jit(jax.jacfwd(residual_flat))

    x_free = jnp.asarray(x0.reshape(-1)[free])
    lam = lambda_init
    cost = float(jnp.sum(res_fn(x_free) ** 2))
    for _ in range(max_iterations):
        r = res_fn(x_free)
        J = jac_fn(x_free)
        H = J.T @ J
        g = J.T @ r
        step_accepted = False
        for _try in range(8):
            delta = jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), -g)
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
