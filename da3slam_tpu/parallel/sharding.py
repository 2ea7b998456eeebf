"""Sharding rules for DA3 parameters and batches.

Tensor parallelism follows the Megatron pattern mapped onto XLA/GSPMD:
column-shard the first projection of each pair (qkv, mlp.w1), row-shard the
second (attn.proj, mlp.w2); XLA inserts the psum on the row-sharded matmul
output automatically.  Everything else (norms, embeddings, heads) is
replicated — they are tiny next to the block weights.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple[str, ...]) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path."""
    joined = "/".join(path)
    if "attn/qkv_w" in joined:
        return P(None, "tp")  # [D, 3D] column-parallel
    if "attn/proj_w" in joined:
        return P("tp", None)  # [D, D] row-parallel
    if "mlp/w1" in joined or "mlp/wg" in joined or "mlp/wv" in joined:
        return P(None, "tp")  # [D, hidden] column-parallel (SwiGLU shards
        # gate and value identically so silu(g)·v stays device-local)
    if "mlp/b1" in joined or "mlp/bg" in joined or "mlp/bv" in joined:
        return P("tp")
    if "mlp/w2" in joined or "mlp/w3" in joined:
        return P("tp", None)  # [hidden, D] row-parallel
    if "attn/qkv_b" in joined:
        return P("tp")
    return P()  # replicated


def _path_strings(path) -> tuple[str, ...]:
    out = []
    for entry in path:
        if hasattr(entry, "key"):
            out.append(str(entry.key))
        elif hasattr(entry, "idx"):
            out.append(str(entry.idx))
        else:
            out.append(str(entry))
    return tuple(out)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(_path_strings(path))),
        params,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches of chunk windows shard over dp on the leading axis."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
