"""Checkpoint save / load: safetensors ↔ parameter pytrees.

The reference loads either HuggingFace-style ``from_pretrained`` directories
or config-JSON + safetensors state dicts (solver.py:58, da3_streaming.py:168-172).
Here the native format is a flat safetensors file whose keys are
``/``-joined pytree paths (lists are indexed numerically), plus the model
``config.json`` alongside.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

from da3slam_tpu.models.config import ModelConfig


def flatten_params(params: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: dict[str, np.ndarray]) -> Any:
    """Rebuild the nested structure; integer-keyed levels become lists."""
    tree: dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def materialise(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [materialise(node[str(i)]) for i in range(len(node))]
        return {k: materialise(v) for k, v in node.items()}

    return materialise(tree)


def save_checkpoint(path: str | Path, params: Any, cfg: ModelConfig) -> None:
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    save_file(flat, str(path / "model.safetensors"))
    (path / "config.json").write_text(json.dumps(dataclasses.asdict(cfg), indent=2))


def load_checkpoint(path: str | Path) -> tuple[Any, ModelConfig]:
    from safetensors.numpy import load_file

    from da3slam_tpu.models.config import config_from_json

    path = Path(path)
    cfg = config_from_json(path / "config.json")
    flat = load_file(str(path / "model.safetensors"))
    params = unflatten_params(dict(flat))
    return jax.tree.map(jax.numpy.asarray, params), cfg
