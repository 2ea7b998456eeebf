"""Sky segmentation for outdoor demo scenes (reference
utils/vggt+viser.py:256-303, which ran an ONNX skyseg model to zero the
confidence of sky pixels).

Implemented as a dependency-free heuristic (the ONNX runtime is not part of
this framework's environment): sky pixels are bright, blue-dominant or
low-saturation, in the upper image region, grown with a column-wise
top-down flood.  An ONNX model path can be passed to use a learned model
when onnxruntime is available.
"""

from __future__ import annotations

import numpy as np


def sky_mask_heuristic(image: np.ndarray, horizon: float = 0.6) -> np.ndarray:
    """``[H, W, 3]`` uint8 RGB → bool mask (True = sky)."""
    img = np.asarray(image, np.float32) / 255.0
    H, W, _ = img.shape
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = img.max(-1)
    sat = (img.max(-1) - img.min(-1)) / np.maximum(img.max(-1), 1e-6)

    blueish = (b >= r - 0.02) & (b >= g - 0.02) & (v > 0.45)
    washed = (v > 0.75) & (sat < 0.25)  # overcast / near-white sky
    cand = blueish | washed

    # column-wise top-down flood: sky is connected to the top edge
    mask = np.zeros((H, W), bool)
    limit = int(H * horizon)
    running = cand[0].copy()
    mask[0] = running
    for y in range(1, limit):
        running = running & cand[y]
        # allow re-seeding from wide sky rows near the top
        if y < H // 8:
            running |= cand[y] & (cand[y].mean() > 0.5)
        mask[y] = running
    return mask


def apply_sky_segmentation(
    conf: np.ndarray, images: np.ndarray, onnx_model_path: str | None = None
) -> np.ndarray:
    """Zero the confidence of sky pixels (the reference's demo behavior).

    ``conf``: ``[N, H, W]``; ``images``: ``[N, H, W, 3]`` uint8.
    """
    conf = np.asarray(conf).copy()
    masks = None
    if onnx_model_path is not None:
        try:
            import onnxruntime as ort  # optional

            sess = ort.InferenceSession(onnx_model_path)
            inp = sess.get_inputs()[0]
            x = np.asarray(images, np.float32).transpose(0, 3, 1, 2) / 255.0
            out = sess.run(None, {inp.name: x})[0]
            masks = out.squeeze(1) > 0.5
        except Exception as e:
            print(f"onnx skyseg unavailable ({e}); using heuristic")
    if masks is None:
        masks = np.stack([sky_mask_heuristic(im) for im in images])
    conf[masks] = 0.0
    return conf
