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
        ours_swiglu = "wg" in blk["mlp"]
        theirs_swiglu = any(
            c in sd for c in _candidates(f"{base}.mlp.w12.weight")
        )
        if ours_swiglu != theirs_swiglu and (
            theirs_swiglu
            or any(c in sd for c in _candidates(f"{base}.mlp.fc1.weight"))
        ):
            # flavour mismatch must be loud: silently leaving every FFN at
            # random init (80 missing + 80 unused notes) produces garbage
            # depth with no error.  Common cause: a checkpoint config.json
            # that omits mlp_type for a SwiGLU (giant-tier) checkpoint.
            raise ValueError(
                f"FFN flavour mismatch at {base}: config says "
                f"{'swiglu' if ours_swiglu else 'mlp'} but the checkpoint "
                f"has {'mlp.w12 (SwiGLU)' if theirs_swiglu else 'mlp.fc1 (plain MLP)'} "
                "— set mlp_type accordingly in the model config"
            )
        if ours_swiglu:
            # DINOv2-giant SwiGLUFFN naming (facebookresearch/dinov2
            # layers/swiglu_ffn.py): ``mlp.w12`` fuses gate+value as
            # [2h, D] with the GATE in the first h rows (x1 of
            # ``x12.chunk(2)`` feeds the silu); we store them split for
            # clean tensor-parallel sharding (see vit.init_encoder)
            h = np.shape(blk["mlp"]["wg"])[1]

            def check_fused(w, h=h, base=base):
                w = np.asarray(w)
                if w.shape[0] != 2 * h:
                    # slicing [:h] of a differently-sized fused tensor would
                    # pass assign's shape check with WRONG rows — refuse
                    raise ValueError(
                        f"{base}.mlp.w12 has fused width {w.shape[0]} but "
                        f"the config's SwiGLU hidden is {h} (expected "
                        f"{2 * h}); fix mlp_ratio/embed_dim in the config"
                    )
                return w

            mlp_rows = [
                (("mlp", "wg"), f"{base}.mlp.w12.weight",
                 lambda w: check_fused(w)[:h].T),
                (("mlp", "bg"), f"{base}.mlp.w12.bias",
                 lambda b, h=h: np.asarray(b)[:h]),
                (("mlp", "wv"), f"{base}.mlp.w12.weight",
                 lambda w: check_fused(w)[h:].T),
                (("mlp", "bv"), f"{base}.mlp.w12.bias",
                 lambda b, h=h: np.asarray(b)[h:]),
                (("mlp", "w3"), f"{base}.mlp.w3.weight", T),
                (("mlp", "b3"), f"{base}.mlp.w3.bias", None),
            ]
        else:
            mlp_rows = [
                (("mlp", "w1"), f"{base}.mlp.fc1.weight", T),
                (("mlp", "b1"), f"{base}.mlp.fc1.bias", None),
                (("mlp", "w2"), f"{base}.mlp.fc2.weight", T),
                (("mlp", "b2"), f"{base}.mlp.fc2.bias", None),
            ]
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
            *mlp_rows,
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

    # tensors with no role here (e.g. DINOv2's mask_token) are consumed so
    # they don't pollute the "unused" report
    for ignored in _IGNORED_CKPT_KEYS:
        for cand in _candidates(ignored):
            if cand in sd:
                used.add(cand)

    new_params = dict(params)
    new_params["encoder"] = enc
    unused = sorted(set(sd) - used)
    return new_params, ImportReport(matched, missing, unused)


def _copy_tree(t: Any) -> Any:
    if isinstance(t, dict):
        return {k: _copy_tree(v) for k, v in t.items()}
    if isinstance(t, list):
        return [_copy_tree(v) for v in t]
    return t


def _navigate(tree: Any, path: tuple) -> Any:
    node = tree
    for p in path:
        node = node[p]
    return node


def _dpt_name_map() -> list[tuple[tuple, str]]:
    """Our DPT pytree paths ↔ released DPT checkpoint naming.

    Mirrors the standard DPT/MiDaS layout the public DA3/VGGT releases use
    for their dense heads (``depth_head.projects.N`` 1x1 taps,
    ``scratch.layerN_rn`` stage convs, ``refinenetN.resConfUnitM.convK``
    residual units, ``output_conv1/2`` head).  Each entry maps one of our
    conv dicts ({kernel HWIO, bias}) to the torch base name whose
    ``.weight``/``.bias`` hold it in OIHW.
    """
    m: list[tuple[tuple, str]] = []
    for k in range(4):
        m.append((("project", k), f"depth_head.projects.{k}"))
        m.append((("stage_rn", k), f"depth_head.scratch.layer{k + 1}_rn"))
        for j in range(2):
            m.append(
                (("fusion", k, "rcu1", j),
                 f"depth_head.scratch.refinenet{k + 1}.resConfUnit1.conv{j + 1}")
            )
            m.append(
                (("fusion", k, "rcu2", j),
                 f"depth_head.scratch.refinenet{k + 1}.resConfUnit2.conv{j + 1}")
            )
        m.append((("fusion", k, "out"),
                  f"depth_head.scratch.refinenet{k + 1}.out_conv"))
    m.append((("head1",), "depth_head.scratch.output_conv1"))
    m.append((("head2",), "depth_head.scratch.output_conv2.0"))
    m.append((("head_out",), "depth_head.scratch.output_conv2.2"))
    return m


# learned tap-resampling layers (published ``depth_head.resize_layers``):
# taps 0/1 are ConvTranspose2d (torch weight [in, out, kh, kw]), tap 2 is
# Identity (no tensors), tap 3 is a stride-2 Conv2d (torch [out, in, kh, kw])
_DPT_RESIZE_MAP: list[tuple[str, str, bool]] = [
    # (ours_key under params["dpt"]["resize"], theirs_base, is_transposed_conv)
    ("r0", "depth_head.resize_layers.0", True),
    ("r1", "depth_head.resize_layers.1", True),
    ("r3", "depth_head.resize_layers.3", False),
]

# checkpoint tensors with no inference-time role here: consumed (so they
# don't show up as "unused" noise) but not mapped.  DINOv2 checkpoints
# always carry a mask_token (masked-image-modeling pretraining artifact).
_IGNORED_CKPT_KEYS = ("mask_token",)


# our camera-head linears ↔ torch camera-head naming (weight stored [out,in])
_CAMERA_NAME_MAP: list[tuple[str, str, str]] = [
    # (ours_w, ours_b, theirs_base)
    ("w1", "b1", "camera_head.mlp.fc1"),
    ("w2", "b2", "camera_head.mlp.fc2"),
    ("w_out", "b_out", "camera_head.out"),
]


def _head_candidates(name: str) -> list[str]:
    """Checkpoint-name candidates for a head tensor: released checkpoints
    differ in the head prefix across DA3 versions."""
    alts = [name]
    if name.startswith("depth_head."):
        rest = name[len("depth_head."):]
        alts += [f"head.{rest}", f"dpt.{rest}", f"dpt_head.{rest}"]
    if name.startswith("camera_head."):
        rest = name[len("camera_head."):]
        alts += [f"pose_head.{rest}", f"cam_head.{rest}"]
    return alts


def import_torch_heads(
    state_dict: Mapping[str, np.ndarray], params: Any
) -> tuple[Any, ImportReport]:
    """Overlay DPT depth-head + camera-head weights onto ``params``.

    Torch convs are OIHW → transposed to our HWIO; linears are [out, in] →
    transposed to [in, out].  Tensors absent from the checkpoint stay at
    their current (initialised) values and are listed in ``report.missing``.
    """
    import jax.numpy as jnp

    sd = _strip_prefixes({k: np.asarray(v) for k, v in state_dict.items()})
    used: set[str] = set()
    matched: list[str] = []
    missing: list[str] = []

    new_params = dict(params)
    new_params["dpt"] = _copy_tree(params["dpt"])
    new_params["camera"] = _copy_tree(params["camera"])

    def assign(target: dict, key: str, ckpt_names: list[str], transform=None):
        name, val = _take(sd, ckpt_names)
        if val is None:
            missing.append(ckpt_names[0])
            return
        if transform is not None:
            val = transform(val)
        if tuple(val.shape) != tuple(np.shape(target[key])):
            missing.append(
                f"{ckpt_names[0]} (shape {val.shape} != {np.shape(target[key])})"
            )
            return
        target[key] = jnp.asarray(val)
        used.add(name)
        matched.append(ckpt_names[0])

    conv_t = lambda w: np.transpose(np.asarray(w), (2, 3, 1, 0))  # noqa: E731
    deconv_t = lambda w: np.transpose(np.asarray(w), (2, 3, 0, 1))  # noqa: E731
    lin_t = lambda w: np.asarray(w).T  # noqa: E731

    for path, base in _dpt_name_map():
        conv = _navigate(new_params["dpt"], path)
        assign(conv, "kernel", _head_candidates(f"{base}.weight"), conv_t)
        assign(conv, "bias", _head_candidates(f"{base}.bias"))

    resize = new_params["dpt"].get("resize")
    if resize is not None:
        for ours, base, is_deconv in _DPT_RESIZE_MAP:
            assign(resize[ours], "kernel", _head_candidates(f"{base}.weight"),
                   deconv_t if is_deconv else conv_t)
            assign(resize[ours], "bias", _head_candidates(f"{base}.bias"))

    cam = new_params["camera"]
    for ours_w, ours_b, base in _CAMERA_NAME_MAP:
        assign(cam, ours_w, _head_candidates(f"{base}.weight"), lin_t)
        assign(cam, ours_b, _head_candidates(f"{base}.bias"))

    unused = sorted(set(sd) - used)
    return new_params, ImportReport(matched, missing, unused)


def import_torch_checkpoint(
    state_dict: Mapping[str, np.ndarray], params: Any, cfg
) -> tuple[Any, ImportReport]:
    """Full-checkpoint import: encoder + DPT head + camera head.

    The reference consumes complete released checkpoints
    (solver.py:58-61, da3_streaming.py:168-176); this maps every section,
    reporting per-tensor matches so silent-parity failures (SURVEY §7.3.1)
    are visible at load time."""
    params, enc_report = import_torch_encoder(state_dict, params, cfg)
    params, head_report = import_torch_heads(state_dict, params)
    # a tensor is truly unused only if neither pass consumed it
    unused = sorted(set(enc_report.unused) & set(head_report.unused))
    report = ImportReport(
        matched=enc_report.matched + head_report.matched,
        missing=enc_report.missing + head_report.missing,
        unused=unused,
    )
    return params, report


def export_torch_style(params: Any) -> dict[str, np.ndarray]:
    """Inverse mapping (encoder + heads) — produces a DA3/DINOv2-style state
    dict.  Used to validate the import mapping by round-trip, and to hand
    weights back to torch-based tooling."""
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
        if "wg" in blk["mlp"]:  # SwiGLU (giant tier): re-fuse gate|value
            w12 = np.concatenate(
                [np.asarray(blk["mlp"]["wg"]).T, np.asarray(blk["mlp"]["wv"]).T]
            )
            b12 = np.concatenate(
                [np.asarray(blk["mlp"]["bg"]), np.asarray(blk["mlp"]["bv"])]
            )
            sd[f"{b}.mlp.w12.weight"] = w12
            sd[f"{b}.mlp.w12.bias"] = b12
            sd[f"{b}.mlp.w3.weight"] = np.asarray(blk["mlp"]["w3"]).T
            sd[f"{b}.mlp.w3.bias"] = np.asarray(blk["mlp"]["b3"])
        else:
            sd[f"{b}.mlp.fc1.weight"] = np.asarray(blk["mlp"]["w1"]).T
            sd[f"{b}.mlp.fc1.bias"] = np.asarray(blk["mlp"]["b1"])
            sd[f"{b}.mlp.fc2.weight"] = np.asarray(blk["mlp"]["w2"]).T
            sd[f"{b}.mlp.fc2.bias"] = np.asarray(blk["mlp"]["b2"])
        sd[f"{b}.ls2.gamma"] = np.asarray(blk["ls2"])

    # heads: our HWIO convs → torch OIHW, our [in,out] linears → [out,in]
    if "dpt" in params:
        for path, base in _dpt_name_map():
            conv = _navigate(params["dpt"], path)
            sd[f"{base}.weight"] = np.transpose(np.asarray(conv["kernel"]), (3, 2, 0, 1))
            sd[f"{base}.bias"] = np.asarray(conv["bias"])
        resize = params["dpt"].get("resize")
        if resize is not None:
            for ours, base, is_deconv in _DPT_RESIZE_MAP:
                k = np.asarray(resize[ours]["kernel"])  # HWIO
                # ConvTranspose2d stores [in, out, kh, kw]; Conv2d [out, in, kh, kw]
                sd[f"{base}.weight"] = np.transpose(k, (2, 3, 0, 1) if is_deconv
                                                   else (3, 2, 0, 1))
                sd[f"{base}.bias"] = np.asarray(resize[ours]["bias"])
    if "camera" in params:
        cam = params["camera"]
        for ours_w, ours_b, base in _CAMERA_NAME_MAP:
            sd[f"{base}.weight"] = np.asarray(cam[ours_w]).T
            sd[f"{base}.bias"] = np.asarray(cam[ours_b])
    return sd


def split_nested_state_dict(
    sd: Mapping[str, np.ndarray],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray], tuple[str, str]] | None:
    """Detect and split a NESTED (two-submodel) DA3 checkpoint.

    The reference's first-listed production checkpoint is
    ``DA3NESTED-GIANT-LARGE-1.1`` (/root/reference/configs/config1.yaml:2):
    one state dict packaging TWO complete DA3 models — the any-view
    geometry model (giant) and the monocular metric-scale model (large)
    that recovers the metric factor the any-view output lacks.  As a torch
    module composition, each submodel prefixes its tensors with its
    attribute name; the layout pinned here (and in
    tests/fixtures/torch_schema_nested_giant.json) is ``model.`` for the
    any-view submodel and ``metric_model.`` for the metric one, with
    tolerant alternates.  Must be re-verified against a real checkpoint
    via ``cli/parity.py`` the day one mounts (ROADMAP.md "fidelity").

    Returns ``(anyview_sd, metric_sd, (anyview_prefix, metric_prefix))``
    with prefixes stripped, or ``None`` when the dict is not nested
    (fewer than two complete backbones found).
    """
    probe = "patch_embed.proj.weight"
    prefixes = sorted(
        {k[: -len(probe)] for k in sd if k.endswith(probe)}
    )
    if len(prefixes) < 2:
        return None

    def rank(prefix: str) -> tuple[int, int]:
        # the metric submodel is the one NAMED metric; when naming does not
        # decide, the any-view model is the larger backbone (giant 1536 >
        # large 1024)
        named_metric = "metric" in prefix.lower()
        D = int(np.asarray(sd[prefix + probe]).shape[0])
        return (0 if named_metric else 1, D)

    ordered = sorted(prefixes, key=rank, reverse=True)
    p_any, p_metric = ordered[0], ordered[-1]
    # keys bind to the LONGEST matching prefix, so an unprefixed any-view
    # backbone ("" prefix) plus a "metric_model." submodel split cleanly
    sd_any: dict[str, np.ndarray] = {}
    sd_metric: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        cands = [p for p in (p_any, p_metric) if k.startswith(p)]
        if not cands:
            continue
        p = max(cands, key=len)
        (sd_metric if p == p_metric else sd_any)[k[len(p):]] = v
    return sd_any, sd_metric, (p_any, p_metric)


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
