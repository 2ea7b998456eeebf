"""The DA3 multi-view depth transformer, TPU-native.

The reference treats the network as an external black box
(``depth_anything_3`` pip package, SURVEY.md §2.5); here it is implemented
natively: a DINOv2-style plain ViT with alternating intra-view / cross-view
self-attention, a DPT dense head emitting depth + confidence, and a camera
head emitting per-view pose + intrinsics.  The public API mirrors the
behavioral contract observed at the reference call sites
(``DepthAnything3.from_pretrained(...)`` / ``.inference(...)``,
solver.py:58-176).
"""

from da3slam_tpu.models.config import (  # noqa: F401
    ModelConfig,
    NESTED_PRESETS,
    PRESETS,
    get_preset,
    resolve_nested_preset,
)
from da3slam_tpu.models.da3 import DepthAnything3, Prediction  # noqa: F401
from da3slam_tpu.models.nested import DepthAnything3Nested  # noqa: F401
