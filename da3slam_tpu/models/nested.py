"""DepthAnything3Nested — the NESTED (any-view + metric) model tier.

The reference's first-listed production checkpoint is
``DA3NESTED-GIANT-LARGE-1.1`` (/root/reference/configs/config1.yaml:2): one
checkpoint packaging TWO complete DA3 models —

- the **any-view geometry model** (giant): multi-view depth / confidence /
  pose, metric-AMBIGUOUS per chunk (the §2.5 contract the SLAM stack
  consumes), and
- the **monocular metric model** (large): single-view METRIC depth, used
  only on the reference view to recover the global scale factor the
  any-view output lacks.

Composition implemented here: run the any-view model over the chunk, run
the metric model on the reference view, estimate one robust scale
``s = median(metric_depth / anyview_depth[ref])`` over pixels confident in
BOTH branches, and return the any-view prediction with depth AND extrinsic
translations multiplied by ``s`` — so downstream consumers (SLAM,
export, eval) see a metric-scaled chunk with unchanged geometry.

Checkpoint layout: a single state dict whose torch submodules prefix their
tensors — ``model.`` (any-view) and ``metric_model.`` (metric), with
tolerant alternates (models/torch_import.py split_nested_state_dict); the
assumed layout is pinned non-circularly in
tests/fixtures/torch_schema_nested_giant.json and must be re-verified with
``cli/parity.py`` the day a real checkpoint mounts (ROADMAP.md).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.models.config import ModelConfig, resolve_nested_preset


def metric_scale_from_mono(
    any_depth_ref,
    any_conf_ref,
    metric_depth,
    metric_conf,
    eps: float = 1e-6,
):
    """Robust global scale: median of per-pixel ``metric / anyview`` depth
    ratios over pixels confident in both branches (top-half confidence in
    each, the same median gating the alignment scale estimator uses).
    Returns a scalar (device scalar for device inputs); falls back to 1.0
    when no pixel qualifies or the median is non-finite."""
    a = jnp.asarray(any_depth_ref, jnp.float32).reshape(-1)
    m = jnp.asarray(metric_depth, jnp.float32).reshape(-1)
    ca = jnp.asarray(any_conf_ref, jnp.float32).reshape(-1)
    cm = jnp.asarray(metric_conf, jnp.float32).reshape(-1)
    valid = (
        (a > eps) & (m > eps)
        & (ca >= jnp.median(ca)) & (cm >= jnp.median(cm))
        & jnp.isfinite(a) & jnp.isfinite(m)
    )
    ratio = jnp.where(valid, m / jnp.maximum(a, eps), jnp.nan)
    s = jnp.nanmedian(ratio)
    return jnp.where(jnp.isfinite(s) & (s > 0), s, 1.0)


class DepthAnything3Nested:
    """Two-submodel wrapper with the same inference API as
    :class:`~da3slam_tpu.models.da3.DepthAnything3` — drop-in anywhere the
    solver/streaming/CLI stack takes a model (``cfg``/``params`` expose the
    ANY-VIEW submodel, which is the one the SLAM compute path runs)."""

    def __init__(self, anyview, metric):
        self.anyview = anyview
        self.metric = metric

    # the SLAM stack's view of the model is the any-view submodel
    @property
    def cfg(self) -> ModelConfig:
        return self.anyview.cfg

    @property
    def params(self) -> Any:
        return self.anyview.params

    @property
    def dtype(self):
        return self.anyview.dtype

    # -- construction --------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path_or_preset: str, seed: int = 0):
        """Nested preset name (``nested-giant-large`` /
        ``DA3NESTED-GIANT-LARGE-1.1`` directory-style) → random-init pair;
        checkpoint directory with a nested state dict → split + import."""
        from da3slam_tpu.models.da3 import DepthAnything3
        from da3slam_tpu.models.torch_import import (
            load_torch_checkpoint_file,
            split_nested_state_dict,
        )

        p = Path(path_or_preset)
        sd = None
        if (p / "model.safetensors").exists():
            from safetensors.numpy import load_file

            sd = load_file(str(p / "model.safetensors"))
        else:
            for torch_file in ("pytorch_model.bin", "model.pt", "model.bin"):
                if (p / torch_file).exists():
                    sd = load_torch_checkpoint_file(p / torch_file)
                    break
        if sd is not None:
            split = split_nested_state_dict(sd)
            if split is None:
                raise ValueError(
                    f"{path_or_preset}: checkpoint is not nested (no two "
                    "complete backbones found) — load it with "
                    "DepthAnything3.from_pretrained instead"
                )
            return cls.from_split_state_dicts(*split[:2], ckpt_dir=p, seed=seed)
        pair = resolve_nested_preset(path_or_preset)
        if pair is None:
            raise KeyError(
                f"unknown nested preset {path_or_preset!r}; known: "
                "nested-giant-large, nested-tiny, or a checkpoint directory"
            )
        any_name, metric_name = pair
        return cls(
            DepthAnything3.from_pretrained(any_name, seed=seed),
            DepthAnything3.from_pretrained(metric_name, seed=seed + 1),
        )

    @classmethod
    def from_split_state_dicts(cls, sd_any, sd_metric, ckpt_dir=None, seed=0):
        """Build from the two already-split torch state dicts.  Per-submodel
        configs come from a nested ``config.json`` ({"model": {...},
        "metric_model": {...}}) when present, else are inferred from the
        tensors themselves (embed dim / depth / FFN flavour)."""
        from da3slam_tpu.models.da3 import DepthAnything3

        sub_cfg = {"model": None, "metric_model": None}
        if ckpt_dir is not None and (Path(ckpt_dir) / "config.json").exists():
            import json

            blob = json.loads((Path(ckpt_dir) / "config.json").read_text())
            for key in sub_cfg:
                if isinstance(blob.get(key), dict):
                    fields = {f.name for f in dataclasses.fields(ModelConfig)}
                    known = {
                        k: tuple(v) if isinstance(v, list) else v
                        for k, v in blob[key].items()
                        if k in fields
                    }
                    sub_cfg[key] = ModelConfig(**known)

        def build(sd, cfg, sub_seed):
            if cfg is None:
                cfg = _config_from_state_dict(sd)
            from da3slam_tpu.models.da3 import init_params
            from da3slam_tpu.models.torch_import import import_torch_checkpoint

            params = init_params(jax.random.PRNGKey(sub_seed), cfg)
            params, report = import_torch_checkpoint(sd, params, cfg)
            print(f"nested submodel import ({cfg.embed_dim}d x{cfg.depth}): "
                  f"{report}")
            return DepthAnything3(cfg, params)

        return cls(
            build(sd_any, sub_cfg["model"], seed),
            build(sd_metric, sub_cfg["metric_model"], seed + 1),
        )

    def quantize(self, scheme: str = "w8a8") -> "DepthAnything3Nested":
        return DepthAnything3Nested(
            self.anyview.quantize(scheme), self.metric.quantize(scheme)
        )

    # torch-API shims, same as DepthAnything3
    def to(self, device=None):  # noqa: D401
        return self

    def eval(self):
        return self

    # -- forward --------------------------------------------------------------
    def inference(
        self,
        image: Sequence[str] | Sequence[np.ndarray] | np.ndarray,
        ref_view_strategy: str = "first",
        **kwargs,
    ):
        """Any-view inference over the chunk + metric-scale recovery from
        the monocular branch on the reference view.  The returned
        prediction's ``depth`` and extrinsic translations are multiplied by
        the recovered scale (``metric_scale`` records it); when the caller
        conditions on input extrinsics (``extrinsics=``) the input poses
        define the scale already, so the metric rescale is skipped."""
        from da3slam_tpu.models import camera
        from da3slam_tpu.models.da3 import _load_images

        pred = self.anyview.inference(
            image, ref_view_strategy=ref_view_strategy, **kwargs
        )
        if kwargs.get("extrinsics") is not None:
            return pred

        # the metric branch sees the RAW reference view (it does its own
        # resize); slice device-staged batches where they live
        if isinstance(image, jax.Array):
            n = image.shape[0] if image.ndim == 4 else 1
            ref_idx = camera.ref_view_index(n, ref_view_strategy)
            ref_raw = image[ref_idx][None] if image.ndim == 4 else image[None]
        else:
            raw = _load_images(image)
            ref_idx = camera.ref_view_index(raw.shape[0], ref_view_strategy)
            ref_raw = raw[ref_idx][None]
        mkwargs = {
            k: v for k, v in kwargs.items()
            if k in ("process_res", "process_res_method", "keep_on_device")
        }
        mono = self.metric.inference(ref_raw, **mkwargs)

        s = metric_scale_from_mono(
            pred.depth[ref_idx], pred.conf[ref_idx], mono.depth[0], mono.conf[0]
        )
        ext = jnp.asarray(pred.extrinsics)
        ext = ext.at[:, :, 3].multiply(s)
        depth = jnp.asarray(pred.depth) * s
        if kwargs.get("keep_on_device", False):
            return dataclasses.replace(
                pred, depth=depth, extrinsics=ext, metric_scale=s
            )
        return dataclasses.replace(
            pred,
            depth=np.asarray(depth, np.float32),
            extrinsics=np.asarray(ext, np.float32),
            metric_scale=float(s),
        )


def _config_from_state_dict(sd) -> ModelConfig:
    """Infer a submodel's ModelConfig from its tensors: embed dim + depth +
    FFN flavour identify the released tier (presets carry the right head
    dims); unknown combinations fail loudly rather than guessing."""
    from da3slam_tpu.models.config import PRESETS

    D = int(np.asarray(sd["patch_embed.proj.weight"]).shape[0])
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    swiglu = any(".mlp.w12." in k and k.startswith("blocks.") for k in sd)
    for name, cfg in PRESETS.items():
        if (
            cfg.embed_dim == D
            and cfg.depth == depth
            and (cfg.mlp_type == "swiglu") == swiglu
        ):
            return cfg
    raise ValueError(
        f"no preset matches nested submodel (embed_dim={D}, depth={depth}, "
        f"{'swiglu' if swiglu else 'mlp'}) — add a preset or a nested "
        "config.json with per-submodel sections"
    )


def export_torch_style_nested(nested: DepthAnything3Nested) -> dict[str, np.ndarray]:
    """Inverse mapping for the nested pair: each submodel exports through
    ``export_torch_style`` under its pinned prefix — used for the
    roundtrip validation of the split + import path."""
    from da3slam_tpu.models.torch_import import export_torch_style

    sd = {}
    for prefix, sub in (("model.", nested.anyview),
                        ("metric_model.", nested.metric)):
        for k, v in export_torch_style(sub.params).items():
            sd[prefix + k] = v
    return sd
