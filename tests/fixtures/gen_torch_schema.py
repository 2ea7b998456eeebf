#!/usr/bin/env python
"""Generate the published-convention torch state-dict schema manifests.

NON-CIRCULARITY: this file must never import ``da3slam_tpu`` — the key names
below are written down from the PUBLIC naming conventions the released
DA3-family checkpoints follow (reference loads them at solver.py:58-61 and
utils/da3_streaming.py:168-176), so the manifests can catch drift in
``models/torch_import.py``'s name map that a round-trip through our own
exporter never could:

  * backbone — the DINOv2 ViT state-dict schema (facebookresearch/dinov2,
    with register tokens): ``cls_token``, ``pos_embed`` (cls-first,
    [1, 1+37*37, D] for the 518/14 pretraining grid), ``mask_token``,
    ``register_tokens``, ``patch_embed.proj.*``, per block ``norm1 /
    attn.qkv / attn.proj / ls1.gamma / norm2 / mlp.fc1 / mlp.fc2 /
    ls2.gamma``, final ``norm``.  DA3's "plain transformer" design keeps
    this backbone unchanged (the cross-view attention alternates the token
    layout, not the weights).
  * depth head — the MiDaS/DPT head schema used by the Depth-Anything
    releases: ``depth_head.projects.N`` 1x1 taps,
    ``depth_head.resize_layers.{0,1,3}`` (4x/2x ConvTranspose2d, stride-2
    Conv2d; index 2 is Identity, no tensors),
    ``depth_head.scratch.layerN_rn`` (3x3, bias=False),
    ``depth_head.scratch.refinenetN.resConfUnit{1,2}.conv{1,2}`` (+bias),
    per-refinenet ``out_conv``, ``output_conv1``, ``output_conv2.{0,2}``.
  * camera head — best-effort reconstruction (``camera_head.mlp.fc1/fc2``,
    ``camera_head.out``); the released DA3 camera-head schema is not
    public-documented, so this section is marked "reconstructed" and must
    be re-verified with ``cli/parity.py`` the day a real checkpoint mounts.

Tensor SHAPES are parameterized by tier dims (embed dim, depth, head
channels) — shape errors are caught at import by shape checks; what this
manifest pins is the NAMES.

Run:  python tests/fixtures/gen_torch_schema.py   (rewrites the .json files)
"""

from __future__ import annotations

import json
from pathlib import Path

# (embed_dim, depth, mlp_hidden, n_registers, dpt_feats, dpt_dim, camera_dim,
#  head_out_channels)
TIERS = {
    "small": dict(D=384, depth=12, mlp=1536, regs=4,
                  feats=(96, 192, 384, 768), F=128, cam=256, out_ch=8),
    "base": dict(D=768, depth=12, mlp=3072, regs=4,
                 feats=(96, 192, 384, 768), F=256, cam=256, out_ch=8),
    "large": dict(D=1024, depth=24, mlp=4096, regs=4,
                  feats=(256, 512, 1024, 1024), F=256, cam=256, out_ch=8),
    # DINOv2-giant backbone (the DA3NESTED-GIANT-LARGE tier's encoder):
    # SwiGLUFFN — per block ``mlp.w12`` [2h, D] (gate rows first) and
    # ``mlp.w3`` [D, h], h = round8(2/3 * 4 * 1536) = 4096
    # (facebookresearch/dinov2 layers/swiglu_ffn.py)
    "giant": dict(D=1536, depth=40, mlp=4096, regs=4, mlp_type="swiglu",
                  feats=(384, 768, 1536, 1536), F=384, cam=256, out_ch=8),
}
PATCH = 14
PRETRAIN_GRID = 37  # 518 / 14: the DINOv2 pos-embed grid in released ckpts


def backbone_keys(
    D: int, depth: int, mlp: int, regs: int, mlp_type: str = "mlp"
) -> dict[str, list[int]]:
    keys: dict[str, list[int]] = {
        "cls_token": [1, 1, D],
        "mask_token": [1, D],
        "pos_embed": [1, 1 + PRETRAIN_GRID * PRETRAIN_GRID, D],
        "register_tokens": [1, regs, D],
        "patch_embed.proj.weight": [D, 3, PATCH, PATCH],
        "patch_embed.proj.bias": [D],
    }
    for i in range(depth):
        b = f"blocks.{i}"
        if mlp_type == "swiglu":
            ffn = {
                f"{b}.mlp.w12.weight": [2 * mlp, D],
                f"{b}.mlp.w12.bias": [2 * mlp],
                f"{b}.mlp.w3.weight": [D, mlp],
                f"{b}.mlp.w3.bias": [D],
            }
        else:
            ffn = {
                f"{b}.mlp.fc1.weight": [mlp, D], f"{b}.mlp.fc1.bias": [mlp],
                f"{b}.mlp.fc2.weight": [D, mlp], f"{b}.mlp.fc2.bias": [D],
            }
        keys.update({
            f"{b}.norm1.weight": [D], f"{b}.norm1.bias": [D],
            f"{b}.attn.qkv.weight": [3 * D, D], f"{b}.attn.qkv.bias": [3 * D],
            f"{b}.attn.proj.weight": [D, D], f"{b}.attn.proj.bias": [D],
            f"{b}.ls1.gamma": [D],
            f"{b}.norm2.weight": [D], f"{b}.norm2.bias": [D],
            **ffn,
            f"{b}.ls2.gamma": [D],
        })
    keys["norm.weight"] = [D]
    keys["norm.bias"] = [D]
    return keys


def dpt_keys(D: int, feats, F: int, out_ch: int) -> dict[str, list[int]]:
    keys: dict[str, list[int]] = {}
    for k, f in enumerate(feats):
        keys[f"depth_head.projects.{k}.weight"] = [f, D, 1, 1]
        keys[f"depth_head.projects.{k}.bias"] = [f]
    # resize layers: ConvTranspose2d stores [in, out, kh, kw]
    keys["depth_head.resize_layers.0.weight"] = [feats[0], feats[0], 4, 4]
    keys["depth_head.resize_layers.0.bias"] = [feats[0]]
    keys["depth_head.resize_layers.1.weight"] = [feats[1], feats[1], 2, 2]
    keys["depth_head.resize_layers.1.bias"] = [feats[1]]
    keys["depth_head.resize_layers.3.weight"] = [feats[3], feats[3], 3, 3]
    keys["depth_head.resize_layers.3.bias"] = [feats[3]]
    for k, f in enumerate(feats):
        keys[f"depth_head.scratch.layer{k + 1}_rn.weight"] = [F, f, 3, 3]
        # published scratch convs are bias=False: no bias key
        r = f"depth_head.scratch.refinenet{k + 1}"
        for unit in (1, 2):
            for conv in (1, 2):
                keys[f"{r}.resConfUnit{unit}.conv{conv}.weight"] = [F, F, 3, 3]
                keys[f"{r}.resConfUnit{unit}.conv{conv}.bias"] = [F]
        keys[f"{r}.out_conv.weight"] = [F, F, 1, 1]
        keys[f"{r}.out_conv.bias"] = [F]
    keys["depth_head.scratch.output_conv1.weight"] = [F // 2, F, 3, 3]
    keys["depth_head.scratch.output_conv1.bias"] = [F // 2]
    keys["depth_head.scratch.output_conv2.0.weight"] = [32, F // 2, 3, 3]
    keys["depth_head.scratch.output_conv2.0.bias"] = [32]
    keys["depth_head.scratch.output_conv2.2.weight"] = [out_ch, 32, 1, 1]
    keys["depth_head.scratch.output_conv2.2.bias"] = [out_ch]
    return keys


def camera_keys(D: int, cam: int) -> dict[str, list[int]]:
    return {
        "camera_head.mlp.fc1.weight": [cam, D], "camera_head.mlp.fc1.bias": [cam],
        "camera_head.mlp.fc2.weight": [cam, cam], "camera_head.mlp.fc2.bias": [cam],
        "camera_head.out.weight": [11, cam], "camera_head.out.bias": [11],
    }


def manifest(tier: str) -> dict:
    t = TIERS[tier]
    return {
        "_doc": "Published torch state-dict key schema (see gen_torch_schema.py). "
                "backbone+depth_head sections follow verbatim public conventions; "
                "camera_head is reconstructed pending a real checkpoint.",
        "tier": tier,
        "keys": {
            **backbone_keys(t["D"], t["depth"], t["mlp"], t["regs"],
                            t.get("mlp_type", "mlp")),
            **dpt_keys(t["D"], t["feats"], t["F"], t["out_ch"]),
            **camera_keys(t["D"], t["cam"]),
        },
        # our parameters that released checkpoints have no tensors for
        # (import must leave them at init and list them as missing,
        # nothing else)
        "expected_missing": [
            f"depth_head.scratch.layer{k}_rn.bias" for k in (1, 2, 3, 4)
        ],
        "reconstructed_sections": ["camera_head"],
    }


# The NESTED checkpoint (DA3NESTED-GIANT-LARGE-1.1, the reference's
# first-listed production tier, configs/config1.yaml:2) packages TWO
# complete DA3 models in one state dict: the any-view geometry model
# (giant) and the monocular metric-scale model (large).  As a torch module
# composition each submodel prefixes its tensors with its attribute name;
# the layout pinned here is ``model.`` (any-view) / ``metric_model.``
# (metric) — the natural nn.Module field naming — and is marked
# reconstructed: it must be re-verified with cli/parity.py against a real
# checkpoint the day one mounts.
NESTED_PREFIXES = {"anyview": "model.", "metric": "metric_model."}


def nested_manifest() -> dict:
    g, l = manifest("giant"), manifest("large")
    keys = {
        **{NESTED_PREFIXES["anyview"] + k: v for k, v in g["keys"].items()},
        **{NESTED_PREFIXES["metric"] + k: v for k, v in l["keys"].items()},
    }
    return {
        "_doc": "Published torch state-dict key schema for the NESTED "
                "giant+large checkpoint (see gen_torch_schema.py). Submodel "
                "sections follow the per-tier schemas under the pinned "
                "prefixes; the prefix layout itself is reconstructed pending "
                "a real checkpoint.",
        "tier": "nested_giant_large",
        "prefixes": NESTED_PREFIXES,
        "keys": keys,
        "expected_missing": (
            [NESTED_PREFIXES["anyview"] + k for k in g["expected_missing"]]
            + [NESTED_PREFIXES["metric"] + k for k in l["expected_missing"]]
        ),
        "reconstructed_sections": ["camera_head", "nested_prefix_layout"],
    }


if __name__ == "__main__":
    out_dir = Path(__file__).parent
    for tier in TIERS:
        p = out_dir / f"torch_schema_{tier}.json"
        p.write_text(json.dumps(manifest(tier), indent=1) + "\n")
        print(f"wrote {p}")
    p = out_dir / "torch_schema_nested_giant.json"
    p.write_text(json.dumps(nested_manifest(), indent=1) + "\n")
    print(f"wrote {p}")
