"""Frame-ingest preprocessing (reference L1: video2frame / crop / brightness).

Host side (``da3slam_tpu.preprocess.host``): video decode + file I/O CLIs.
Device side (``da3slam_tpu.preprocess.device``): the whole per-frame pixel
pipeline — ratio-square crop, LAB-space brightness normalisation (CLAHE-style
tile equalisation, highlight attenuation, shadow boost, adaptive gamma,
unsharp blend), resize and ImageNet normalisation — as one fused, batched,
jitted program feeding HBM-resident chunks (BASELINE config 2).
"""

from da3slam_tpu.preprocess.device import (  # noqa: F401
    preprocess_batch,
    adjust_brightness,
    crop_square,
    rgb_to_lab,
    lab_to_rgb,
    clahe,
)
