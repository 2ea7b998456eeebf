"""Parity harness: our model vs. reference golden outputs (mini_npz).

The BASELINE requires ATE and depth-map parity with the PyTorch reference.
The reference exports golden predictions via
``model.inference(..., export_format="mini_npz")``
(/root/reference/utils/da3_camara.py:27-28); this module compares our
forward pass against such files so parity is a one-command check
(``python -m da3slam_tpu.cli.parity``) the moment real weights + goldens
are dropped in.

Golden layout expected under a parity directory:

    <parity_dir>/checkpoint/     torch DA3 checkpoint (config.json +
                                 model.safetensors or pytorch_model.bin)
    <parity_dir>/golden/*.npz    mini_npz exports with keys
                                 processed_images [N,H,W,3] u8 (or images),
                                 depth [N,H,W], conf [N,H,W],
                                 extrinsics [N,3,4], intrinsics [N,3,3]

Depth is compared scale-invariantly (the model's output is metric-ambiguous
per chunk, SURVEY.md §2.5): a single median-ratio scale is factored out
before the absolute-relative error.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


# Parity thresholds: same-weights parity should be within numerics noise;
# these bounds allow bf16 matmul accumulation differences at 504² while
# failing loudly on any structural mismatch.
DEFAULT_THRESHOLDS = {
    "depth_absrel": 0.02,  # scale-normalised |d - d_gt| / d_gt, mean
    "conf_corr": 0.98,  # Pearson correlation of confidence maps
    "rot_deg": 1.0,  # per-frame geodesic rotation error, max
    "trans_rel": 0.05,  # translation error / trajectory extent, max
    "focal_rel": 0.02,  # |f - f_gt| / f_gt, max
}


def load_mini_npz(path: str | Path) -> dict[str, np.ndarray]:
    """Read a reference mini_npz export, normalising key aliases."""
    z = np.load(str(path))
    aliases = {
        "processed_images": ["processed_images", "images", "image"],
        "depth": ["depth", "depths"],
        "conf": ["conf", "confidence", "conf_map"],
        "extrinsics": ["extrinsics", "extrinsic", "poses_w2c"],
        "intrinsics": ["intrinsics", "intrinsic", "K"],
    }
    out: dict[str, np.ndarray] = {}
    for ours, names in aliases.items():
        for n in names:
            if n in z:
                out[ours] = np.asarray(z[n])
                break
    missing = {"processed_images", "depth"} - set(out)
    if missing:
        raise ValueError(f"{path}: golden npz missing required keys {missing}")
    if out["depth"].ndim == 4:  # [N,H,W,1] squeeze (da3_streaming.py:275)
        out["depth"] = out["depth"][..., 0]
    return out


def depth_parity(depth: np.ndarray, depth_gt: np.ndarray) -> dict[str, float]:
    """Scale-invariant depth agreement (median ratio factored out)."""
    valid = (depth_gt > 1e-6) & np.isfinite(depth_gt) & np.isfinite(depth)
    d, g = depth[valid], depth_gt[valid]
    s = float(np.median(g / np.maximum(d, 1e-12)))
    absrel = float(np.mean(np.abs(d * s - g) / g))
    rmse_log = float(np.sqrt(np.mean((np.log(np.maximum(d * s, 1e-12)) - np.log(g)) ** 2)))
    return {"depth_scale": s, "depth_absrel": absrel, "depth_rmse_log": rmse_log}


def pose_parity(ext: np.ndarray, ext_gt: np.ndarray) -> dict[str, float]:
    """Per-frame w2c agreement after anchoring both chunks at frame 0."""

    def anchor(E):
        M = np.tile(np.eye(4), (len(E), 1, 1))
        M[:, :3] = E
        M0_inv = np.linalg.inv(M[0])
        return np.einsum("nij,jk->nik", M, M0_inv)

    A, B = anchor(np.asarray(ext, np.float64)), anchor(np.asarray(ext_gt, np.float64))
    R_err = np.einsum("nij,nkj->nik", A[:, :3, :3], B[:, :3, :3])  # A R_gtᵀ
    cos = (np.trace(R_err, axis1=1, axis2=2) - 1) / 2
    rot_deg = float(np.max(np.degrees(np.arccos(np.clip(cos, -1, 1)))))
    extent = float(np.max(np.linalg.norm(B[:, :3, 3], axis=-1)))
    trans = float(np.max(np.linalg.norm(A[:, :3, 3] - B[:, :3, 3], axis=-1)))
    return {"rot_deg": rot_deg, "trans_rel": trans / max(extent, 1e-9)}


def compare_prediction(pred: Any, golden: dict[str, np.ndarray]) -> dict[str, float]:
    """All parity metrics of one prediction vs. one golden file."""
    m = depth_parity(np.asarray(pred.depth), golden["depth"])
    if "conf" in golden:
        c, g = np.asarray(pred.conf).ravel(), golden["conf"].ravel()
        # the streaming path subtracts 1.0 from conf (da3_streaming.py:276);
        # correlation is offset-invariant so both conventions compare equal
        m["conf_corr"] = float(np.corrcoef(c, g)[0, 1])
    if "extrinsics" in golden and len(golden["extrinsics"]) > 1:
        m.update(pose_parity(np.asarray(pred.extrinsics), golden["extrinsics"]))
    if "intrinsics" in golden:
        f = np.asarray(pred.intrinsics)[:, [0, 1], [0, 1]]
        fg = golden["intrinsics"][:, [0, 1], [0, 1]]
        m["focal_rel"] = float(np.max(np.abs(f - fg) / np.maximum(fg, 1e-9)))
    return m


def check_thresholds(
    metrics: dict[str, float], thresholds: dict[str, float] | None = None
) -> list[str]:
    """Return the list of violated threshold descriptions (empty = parity)."""
    th = dict(DEFAULT_THRESHOLDS, **(thresholds or {}))
    failures = []
    for key, bound in th.items():
        if key not in metrics:
            continue
        ok = metrics[key] >= bound if key == "conf_corr" else metrics[key] <= bound
        if not ok:
            cmp = "<" if key == "conf_corr" else ">"
            failures.append(f"{key}={metrics[key]:.5f} {cmp} bound {bound}")
    return failures


def run_parity(
    checkpoint: str | Path,
    golden_paths: list[str | Path],
    thresholds: dict[str, float] | None = None,
) -> tuple[list[dict[str, float]], bool]:
    """Load the checkpoint, replay every golden's input images through our
    model, and compare.  Returns (per-file metrics, all_passed)."""
    from da3slam_tpu.models import DepthAnything3

    model = DepthAnything3.from_pretrained(str(checkpoint))
    results = []
    all_ok = True
    for gp in golden_paths:
        golden = load_mini_npz(gp)
        imgs = list(golden["processed_images"])
        # goldens store MODEL-resolution images; match process_res to them so
        # the resize is the identity and no second resampling is compared
        res = max(imgs[0].shape[0], imgs[0].shape[1])
        pred = model.inference(
            image=imgs, process_res=res, process_res_method="upper_bound_resize"
        )
        metrics = compare_prediction(pred, golden)
        failures = check_thresholds(metrics, thresholds)
        metrics["passed"] = float(not failures)
        results.append(metrics)
        status = "PASS" if not failures else "FAIL: " + "; ".join(failures)
        print(f"[parity] {Path(gp).name}: {status}")
        for k, v in metrics.items():
            print(f"    {k}: {v:.6f}")
        all_ok &= not failures
    return results, all_ok


def find_parity_dir() -> Path | None:
    """Locate the parity data directory (env override or repo default)."""
    import os

    for cand in (os.environ.get("DA3_PARITY_DIR"), "/root/repo/parity_data"):
        if cand and Path(cand).is_dir():
            return Path(cand)
    return None
