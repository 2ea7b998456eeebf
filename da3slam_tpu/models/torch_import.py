"""PyTorch checkpoint import: DINOv2/DA3-style state dicts → our pytree.

The reference loads HuggingFace-style checkpoint directories into the
external torch model (solver.py:58, da3_streaming.py:168-172).  To let its
users bring those weights here, this module maps the standard DINOv2
backbone naming (``blocks.N.attn.qkv.weight`` …) onto the encoder pytree,
with the right transpositions (torch Linear stores ``[out, in]``; we store
``[in, out]``), and reports exactly what matched, what was missing, and
what was left over — head weights whose layout differs across DA3 releases
import where names match and fall back to initialisation otherwise.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Mapping

import numpy as np


@dataclasses.dataclass
class ImportReport:
    matched: list[str]
    missing: list[str]  # our params not found in the checkpoint
    unused: list[str]  # checkpoint tensors we did not consume

    def __str__(self) -> str:
        return (
            f"imported {len(self.matched)} tensors; "
            f"{len(self.missing)} ours unmatched; {len(self.unused)} theirs unused"
        )


def _strip_prefixes(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Remove common wrapper prefixes (model., module., backbone., encoder.)."""
    out = {}
    for k, v in sd.items():
        for prefix in ("model.", "module."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def _candidates(name: str) -> list[str]:
    """Checkpoint-name candidates for one of our encoder entries."""
    return [name, f"backbone.{name}", f"encoder.{name}", f"pretrained.{name}"]


def _take(sd: dict, names: list[str]):
    for n in names:
        if n in sd:
            return n, sd[n]
    return None, None


def import_torch_encoder(
    state_dict: Mapping[str, np.ndarray], params: Any, cfg
) -> tuple[Any, ImportReport]:
    """Overlay DINOv2-style encoder weights onto ``params`` (in place on a
    copied pytree).  Returns (new_params, report)."""
    import jax.numpy as jnp

    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})
    used: set[str] = set()
    matched: list[str] = []
    missing: list[str] = []

    enc = {**params["encoder"]}
    enc["patch_embed"] = dict(params["encoder"]["patch_embed"])
    enc["norm"] = dict(params["encoder"]["norm"])
    enc["blocks"] = [dict(b) for b in params["encoder"]["blocks"]]

    def assign(target: dict, key: str, ours_shape, ckpt_names, transform=None):
        name, val = _take(sd, ckpt_names)
        if val is None:
            missing.append(ckpt_names[0])
            return
        if transform is not None:
            val = transform(val)
        if tuple(val.shape) != tuple(ours_shape):
            missing.append(f"{ckpt_names[0]} (shape {val.shape} != {ours_shape})")
            return
        target[key] = jnp.asarray(val)
        used.add(name)
        matched.append(ckpt_names[0])

    # patch embed: torch conv [D, 3, P, P] → HWIO [P, P, 3, D]
    assign(
        enc["patch_embed"], "kernel", enc["patch_embed"]["kernel"].shape,
        _candidates("patch_embed.proj.weight"),
        lambda w: np.transpose(w, (2, 3, 1, 0)),
    )
    assign(enc["patch_embed"], "bias", enc["patch_embed"]["bias"].shape,
           _candidates("patch_embed.proj.bias"))

    # pos embed: torch [1, 1+G², D] (cls first) or [1, G², D] → [G, G, D]
    G = params["encoder"]["pos_embed"].shape[0]
    D = cfg.embed_dim

    def pos_transform(p):
        p = np.asarray(p)
        if p.ndim == 3:
            p = p[0]
        # strip a leading cls token if the count is one past a perfect square
        side = int(round(p.shape[0] ** 0.5))
        if side * side != p.shape[0]:
            side = int(round((p.shape[0] - 1) ** 0.5))
            if side * side == p.shape[0] - 1:
                p = p[1:]
        return p.reshape(side, side, -1)

    name, val = _take(sd, _candidates("pos_embed"))
    if val is not None:
        grid = pos_transform(val)
        if grid.shape[-1] == D:
            if grid.shape[0] != G:
                import jax

                grid = np.asarray(
                    jax.image.resize(jnp.asarray(grid), (G, G, D), "bilinear")
                )
            enc["pos_embed"] = jnp.asarray(grid)
            used.add(name)
            matched.append("pos_embed")
        else:
            missing.append("pos_embed (dim mismatch)")
    else:
        missing.append("pos_embed")

    # cls/camera + register tokens
    assign(enc, "camera_token", enc["camera_token"].shape,
           _candidates("cls_token") + _candidates("camera_token"))
    assign(enc, "register_tokens", enc["register_tokens"].shape,
           _candidates("register_tokens") + _candidates("reg_token"))

    # blocks
    T = lambda w: np.asarray(w).T  # noqa: E731
    for i, blk in enumerate(enc["blocks"]):
        base = f"blocks.{i}"
        for ours, theirs, tr in [
            (("ln1", "scale"), f"{base}.norm1.weight", None),
            (("ln1", "bias"), f"{base}.norm1.bias", None),
            (("attn", "qkv_w"), f"{base}.attn.qkv.weight", T),
            (("attn", "qkv_b"), f"{base}.attn.qkv.bias", None),
            (("attn", "proj_w"), f"{base}.attn.proj.weight", T),
            (("attn", "proj_b"), f"{base}.attn.proj.bias", None),
            (("ls1",), f"{base}.ls1.gamma", None),
            (("ln2", "scale"), f"{base}.norm2.weight", None),
            (("ln2", "bias"), f"{base}.norm2.bias", None),
            (("mlp", "w1"), f"{base}.mlp.fc1.weight", T),
            (("mlp", "b1"), f"{base}.mlp.fc1.bias", None),
            (("mlp", "w2"), f"{base}.mlp.fc2.weight", T),
            (("mlp", "b2"), f"{base}.mlp.fc2.bias", None),
            (("ls2",), f"{base}.ls2.gamma", None),
        ]:
            if len(ours) == 2:
                sub = dict(blk[ours[0]])
                assign(sub, ours[1], sub[ours[1]].shape, _candidates(theirs), tr)
                blk[ours[0]] = sub
            else:
                tmp = {"v": blk[ours[0]]}
                assign(tmp, "v", np.shape(blk[ours[0]]), _candidates(theirs), tr)
                blk[ours[0]] = tmp["v"]

    assign(enc["norm"], "scale", enc["norm"]["scale"].shape, _candidates("norm.weight"))
    assign(enc["norm"], "bias", enc["norm"]["bias"].shape, _candidates("norm.bias"))

    new_params = dict(params)
    new_params["encoder"] = enc
    unused = sorted(set(sd) - used)
    return new_params, ImportReport(matched, missing, unused)


def export_torch_style(params: Any) -> dict[str, np.ndarray]:
    """Inverse mapping (encoder only) — produces a DINOv2-style state dict.
    Used to validate the import mapping by round-trip, and to hand weights
    back to torch-based tooling."""
    enc = params["encoder"]
    sd: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": np.transpose(np.asarray(enc["patch_embed"]["kernel"]), (3, 2, 0, 1)),
        "patch_embed.proj.bias": np.asarray(enc["patch_embed"]["bias"]),
        "cls_token": np.asarray(enc["camera_token"]),
        "register_tokens": np.asarray(enc["register_tokens"]),
        "norm.weight": np.asarray(enc["norm"]["scale"]),
        "norm.bias": np.asarray(enc["norm"]["bias"]),
    }
    G = enc["pos_embed"].shape[0]
    D = enc["pos_embed"].shape[-1]
    pos = np.asarray(enc["pos_embed"]).reshape(1, G * G, D)
    sd["pos_embed"] = np.concatenate([np.zeros((1, 1, D), pos.dtype), pos], axis=1)
    for i, blk in enumerate(enc["blocks"]):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.asarray(blk["ln1"]["scale"])
        sd[f"{b}.norm1.bias"] = np.asarray(blk["ln1"]["bias"])
        sd[f"{b}.attn.qkv.weight"] = np.asarray(blk["attn"]["qkv_w"]).T
        sd[f"{b}.attn.qkv.bias"] = np.asarray(blk["attn"]["qkv_b"])
        sd[f"{b}.attn.proj.weight"] = np.asarray(blk["attn"]["proj_w"]).T
        sd[f"{b}.attn.proj.bias"] = np.asarray(blk["attn"]["proj_b"])
        sd[f"{b}.ls1.gamma"] = np.asarray(blk["ls1"])
        sd[f"{b}.norm2.weight"] = np.asarray(blk["ln2"]["scale"])
        sd[f"{b}.norm2.bias"] = np.asarray(blk["ln2"]["bias"])
        sd[f"{b}.mlp.fc1.weight"] = np.asarray(blk["mlp"]["w1"]).T
        sd[f"{b}.mlp.fc1.bias"] = np.asarray(blk["mlp"]["b1"])
        sd[f"{b}.mlp.fc2.weight"] = np.asarray(blk["mlp"]["w2"]).T
        sd[f"{b}.mlp.fc2.bias"] = np.asarray(blk["mlp"]["b2"])
        sd[f"{b}.ls2.gamma"] = np.asarray(blk["ls2"])
    return sd


def load_torch_checkpoint_file(path: str | Path) -> dict[str, np.ndarray]:
    """Read a torch checkpoint file (.safetensors or .bin/.pt) to numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}
