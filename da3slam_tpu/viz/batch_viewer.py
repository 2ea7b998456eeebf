"""One-shot scene viewer: visualise a whole Prediction at once.

The reference carried a separate VGGT-style batch viser wrapper + a
DA3-prediction→viser adapter (utils/viser_server.py:17-292) alongside the
incremental viewer; here the adapter feeds the same SLAMViewer, so there is
exactly one viewer implementation (the consolidation SURVEY.md §2.3 calls
for).
"""

from __future__ import annotations

import numpy as np


def prediction_to_viewer_dict(prediction, extrinsics_global=None) -> dict:
    """DA3 Prediction → the flat dict layout the viser wrappers consume
    (reference ``da3_prediction_to_viser_dict``, utils/viser_server.py:233)."""
    ext = extrinsics_global if extrinsics_global is not None else prediction.extrinsics
    return {
        "images": np.asarray(prediction.processed_images),
        "depth": np.asarray(prediction.depth),
        "conf": np.asarray(prediction.conf),
        "extrinsics": np.asarray(ext, np.float32),
        "intrinsics": np.asarray(prediction.intrinsics),
    }


def show_prediction(
    prediction,
    extrinsics_global=None,
    port: int = 8080,
    point_stride: int = 4,
    block: bool = True,
    mask_sky: bool = False,
    sky_onnx_path: str | None = None,
):
    """Spin up a viewer and load every frame of a prediction.

    ``mask_sky`` zeroes the confidence of sky pixels before display (the
    reference demo's behavior, utils/vggt+viser.py:256-303 — there via an
    ONNX model, here a top-connected flood heuristic with an optional ONNX
    path).  Returns the viewer (or None when viser is unavailable —
    headless degradation like the solver's).
    """
    try:
        from da3slam_tpu.viz.viewer import SLAMViewer
    except ImportError as e:
        print(f"viser unavailable ({e}); cannot open the viewer")
        return None

    scene = prediction_to_viewer_dict(prediction, extrinsics_global)
    if mask_sky:
        from da3slam_tpu.viz.sky import apply_sky_segmentation

        scene["conf"] = apply_sky_segmentation(
            scene["conf"], scene["images"], onnx_model_path=sky_onnx_path
        )
    viewer = SLAMViewer(port=port, point_stride=point_stride)
    for i in range(scene["depth"].shape[0]):
        viewer.add_frame(
            image=scene["images"][i],
            depth=scene["depth"][i],
            conf=scene["conf"][i],
            extrinsic=scene["extrinsics"][i],
            intrinsic=scene["intrinsics"][i],
        )
    if block:
        viewer.keep_alive()
    return viewer
