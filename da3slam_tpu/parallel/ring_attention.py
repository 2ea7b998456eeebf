"""Ring attention: cross-view attention sharded over the view/sequence axis.

The SLAM chunk's cross-view attention is quadratic in (views × patches); on
a multi-chip mesh the natural sequence-parallel layout shards the *view*
axis (frames are the "sequence", SURVEY.md §5.7).  Each device keeps its
views' Q resident and rotates K/V shards around the ring with
``jax.lax.ppermute``, folding each incoming block into an online-softmax
accumulator — so the full [S, S] attention never exists on any chip and
bandwidth rides the ICI ring.

Use inside ``shard_map`` over the sequence axis; numerically identical to
dense attention (verified on virtual meshes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _block_update(q, k_blk, v_blk, m, l, acc, scale):
    """Fold one K/V block into the online-softmax state.

    q: [B, Sq, H, D]; k_blk/v_blk: [B, Sk, H, D]; m,l: [B, Sq, H, 1];
    acc: [B, Sq, H, D] (f32).
    """
    s = jnp.einsum(
        "bqhd,bkhd->bqhk", q, k_blk, preferred_element_type=jnp.float32
    ) * scale  # [B, Sq, H, Sk]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bqhk,bkhd->bqhd", p.astype(v_blk.dtype), v_blk,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str
) -> jax.Array:
    """Full (non-causal) attention with K/V rotating around ``axis_name``.

    Per-shard shapes ``[B, S_shard, H, D]``; the global sequence is the
    concatenation over the mesh axis.  Returns the local shard of the
    attention output.
    """
    n_dev = jax.lax.psum(1, axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)

    # derive the initial accumulator state from q so it carries the same
    # varying-manual-axes type as the loop body outputs (shard_map VMA rule:
    # scan carries must be device-varying if the body makes them so)
    zeros_like_q = q.astype(jnp.float32) * 0.0
    m0 = zeros_like_q[..., :1] - jnp.inf
    l0 = zeros_like_q[..., :1]
    acc0 = zeros_like_q

    def step(carry, _):
        k_blk, v_blk, m, l, acc = carry
        m, l, acc = _block_update(q, k_blk, v_blk, m, l, acc, scale)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    # n_dev - 1 rotate-and-update steps, then fold the final block without
    # rotating (the last ppermute's output would be discarded — a wasted
    # ICI hop per call that XLA cannot DCE inside the scan)
    (k_last, v_last, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), None, length=n_dev - 1
    )
    m, l, acc = _block_update(q, k_last, v_last, m, l, acc, scale)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def make_ring_cross_view_attention(mesh, axis_name: str = "dp"):
    """shard_map-wrapped ring attention: global ``[B, S, H, D]`` arrays
    sharded on S over ``axis_name``; drop-in replacement for dense
    cross-view attention on a mesh."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(None, axis_name, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def attn(q, k, v):
        return ring_attention(q, k, v, axis_name)

    return attn
