"""Loop-closure detection + loop Sim(3) constraint estimation.

Native replacement for the reference's external ``LoopDetector`` /
``get_loop_sim3_from_loop_predict`` machinery (da3_streaming.py:366-521,
disabled in the reference because ``loop_utils`` was not vendored).

Detection: lightweight appearance retrieval — per-frame descriptors are
L2-normalised downsampled grayscale thumbnails; candidate pairs need
cosine similarity above ``threshold`` and temporal separation above
``min_gap``; non-maximum suppression keeps the best pair per neighborhood.

Constraint: the reference's joint-re-inference trick — run the model once
over [chunk_a frames, chunk_b frames] so cross-view attention places both
in one consistent frame, then register each chunk's stored geometry to the
joint prediction (confidence-weighted IRLS, pixelwise correspondence) and
compose:  T(b→a) = T_a^{-1} ∘ T_b.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from da3slam_tpu.core.geometry import backproject_depth
from da3slam_tpu.core.transforms import Sim3, sim3_compose, sim3_inverse
from da3slam_tpu.ops.registration import irls_sim3


class LoopPair(NamedTuple):
    frame_a: int
    frame_b: int
    similarity: float


class LoopConstraint(NamedTuple):
    """A loop Sim(3) measurement plus the quality evidence needed to gate it
    before it may touch the pose graph (one false loop edge otherwise
    corrupts the whole trajectory)."""

    transform: Sim3  # chunk_b coords → chunk_a coords
    rmse: float  # worst weighted registration RMS of the two chunk fits
    n_effective: int  # smallest effective point count of the two fits
    reciprocal_err: float  # ‖T_fwd ∘ T_bwd − I‖ chart norm, worst of the two


def gate_loop_constraint(
    lc: LoopConstraint,
    max_rmse: float = 0.05,
    min_n_effective: int = 200,
    max_reciprocal_err: float = 0.1,
) -> bool:
    """True iff the loop constraint is trustworthy enough for the graph.

    Three independent failure signals: a high residual means the geometry
    never registered; a low effective count means the fit rode on a sliver
    of confident pixels; a high forward/backward inconsistency means the
    IRLS landed in different basins for the two directions — each is a
    symptom of a *visual* match without a *geometric* one (the exact
    false-positive mode of appearance retrieval on self-similar scenes).
    """
    return (
        np.isfinite(lc.rmse)
        and lc.rmse <= max_rmse
        and lc.n_effective >= min_n_effective
        and lc.reciprocal_err <= max_reciprocal_err
    )


def frame_descriptor(image: np.ndarray, size: int = 16) -> np.ndarray:
    """L2-normalised grayscale thumbnail descriptor."""
    img = np.asarray(image, np.float32)
    if img.ndim == 3:
        img = img.mean(-1)
    H, W = img.shape
    ys = (np.arange(size) * H // size).clip(0, H - 1)
    xs = (np.arange(size) * W // size).clip(0, W - 1)
    thumb = img[np.ix_(ys, xs)].reshape(-1)
    thumb = thumb - thumb.mean()
    n = np.linalg.norm(thumb)
    return thumb / n if n > 0 else thumb


class LoopDetector:
    """Appearance retrieval over the whole sequence.

    Two descriptor sources, chosen per frame by the caller:
      - a learned descriptor (``desc=``): the model's L2-normalised
        mean-pooled encoder patch tokens (``Prediction.frame_desc``) — free,
        lighting-robust, and the native replacement for the reference's
        external image-retrieval ``LoopDetector`` (da3_streaming.py:193-199);
      - the grayscale-thumbnail fallback for model-less runs.

    Retrieval is a dense cosine matrix, evaluated in row blocks on the
    accelerator for long sequences (the matmul is tiny by TPU standards —
    10k frames × 384 dims is 77 GFLOP — so there is no need for an
    approximate vocabulary tree; blocking merely bounds the [T, T] memory).
    """

    def __init__(self, threshold: float = 0.92, min_gap: int = 30,
                 max_loops: int = 10, block_rows: int = 4096):
        self.threshold = threshold
        self.min_gap = min_gap
        self.max_loops = max_loops
        self.block_rows = block_rows
        self._descs: list[np.ndarray] = []
        self._kind: str | None = None

    @property
    def kind(self) -> str | None:
        """Descriptor source enrolled so far: "learned" | "thumbnail" | None.

        Callers with mixed sources (e.g. resuming over spills written before
        descriptors were saved) should check this and down-convert to the
        enrolled kind rather than mixing (mixing raises)."""
        return self._kind

    @property
    def dim(self) -> int | None:
        """Descriptor dimensionality enrolled so far (None before the first
        frame).  Public so callers synthesising placeholder descriptors
        (e.g. resume paths) need not poke at internals."""
        return self._descs[0].shape[0] if self._descs else None

    def add_frame(self, image: np.ndarray | None, desc: np.ndarray | None = None) -> None:
        if desc is not None:
            d = np.asarray(desc, np.float32).reshape(-1)
            n = np.linalg.norm(d)
            d = d / n if n > 0 else d
            kind = "learned"
        else:
            d = frame_descriptor(image)
            kind = "thumbnail"
        if self._kind is None:
            self._kind = kind
        elif self._kind != kind:
            raise ValueError(
                f"mixed descriptor kinds: detector holds {self._kind!r}, "
                f"got {kind!r} — pass desc= for every frame or for none"
            )
        self._descs.append(d)

    def _candidates(self, D: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (i, j, sim) with j - i ≥ min_gap and sim > threshold,
        computed in row blocks (device matmul, [block, T] panels)."""
        T = D.shape[0]
        Dj = jnp.asarray(D)
        rows, cols, sims = [], [], []
        for r0 in range(0, T, self.block_rows):
            r1 = min(r0 + self.block_rows, T)
            panel = np.asarray(Dj[r0:r1] @ Dj.T)  # [r, T]
            jj = np.arange(T)[None, :]
            ii = np.arange(r0, r1)[:, None]
            hit = (jj - ii >= self.min_gap) & (panel > self.threshold)
            r, c = np.nonzero(hit)
            rows.append(r + r0)
            cols.append(c)
            sims.append(panel[r, c])
        r = np.concatenate(rows)
        c = np.concatenate(cols)
        return np.stack([r, c], -1), np.concatenate(sims)

    def detect(self) -> list[LoopPair]:
        if len(self._descs) < self.min_gap + 2:
            return []
        D = np.stack(self._descs)  # [T, d]
        if self._kind == "learned":
            # batch-center: raw pooled encoder tokens share a large common
            # component on self-similar footage (every colonoscopy frame
            # looks alike), which pushes ALL cosines toward 1 and saturates
            # the threshold.  Removing the corpus mean leaves the
            # frame-distinctive part, putting cosines on the same footing
            # as the (per-image mean-subtracted) thumbnail descriptors.
            # Zero rows (descriptor-less placeholder frames) stay zero —
            # centering them would alias them all to -mean and make them
            # mutually similar.
            nonzero = np.linalg.norm(D, axis=1) > 0
            if not nonzero.any():
                return []
            D = np.where(
                nonzero[:, None], D - D[nonzero].mean(axis=0, keepdims=True), 0.0
            )
            n = np.linalg.norm(D, axis=1, keepdims=True)
            D = D / np.maximum(n, 1e-12)
        cand, sim = self._candidates(D)
        if cand.shape[0] == 0:
            return []
        # greedy NMS: best-similarity pairs first, suppress neighbours
        order = np.argsort(-sim)
        chosen: list[LoopPair] = []
        for k in order:
            a, b = int(cand[k, 0]), int(cand[k, 1])
            if any(abs(a - p.frame_a) < self.min_gap // 2 and
                   abs(b - p.frame_b) < self.min_gap // 2 for p in chosen):
                continue
            chosen.append(LoopPair(a, b, float(sim[k])))
            if len(chosen) >= self.max_loops:
                break
        return chosen


def _chart_norm(T: Sim3) -> float:
    """Distance of a Sim(3) from identity in the [log s, so3_log, t] chart."""
    from da3slam_tpu.core.transforms import so3_log

    return float(
        jnp.abs(jnp.log(T.s))
        + jnp.linalg.norm(so3_log(T.R))
        + jnp.linalg.norm(T.t)
    )


def loop_sim3_from_joint_prediction(
    chunk_a: dict,
    chunk_b: dict,
    joint_prediction,
    irls_delta: float = 0.1,
    irls_iters: int = 10,
    irls_tol: float | None = None,
) -> LoopConstraint:
    """Register two stored chunks through one joint model prediction.

    ``chunk_a``/``chunk_b``: dicts with depth [N,H,W], conf, extrinsics,
    intrinsics (as spilled to disk by the streaming pass).
    ``joint_prediction``: model output over chunk_a's frames followed by
    chunk_b's frames.

    Returns a :class:`LoopConstraint` whose transform maps chunk_b
    chunk-coords → chunk_a chunk-coords, with the registration-quality
    evidence (rmse, effective points, forward/backward reciprocal
    consistency) callers must gate on before adding the edge.
    """
    na = chunk_a["depth"].shape[0]

    def register(chunk, joint_slice):
        pts_chunk = backproject_depth(
            jnp.asarray(chunk["depth"]),
            jnp.asarray(chunk["intrinsics"]),
            jnp.asarray(chunk["extrinsics"]),
        ).reshape(-1, 3)
        pts_joint = backproject_depth(
            jnp.asarray(joint_slice["depth"]),
            jnp.asarray(joint_slice["intrinsics"]),
            jnp.asarray(joint_slice["extrinsics"]),
        ).reshape(-1, 3)
        conf = jnp.sqrt(
            jnp.maximum(jnp.asarray(chunk["conf"]).reshape(-1), 0)
            * jnp.maximum(jnp.asarray(joint_slice["conf"]).reshape(-1), 0)
        )
        med = jnp.median(conf)
        conf = jnp.where(conf > 0.1 * med, conf, 0.0)
        fwd = irls_sim3(pts_chunk, pts_joint, conf=conf,
                        delta=irls_delta, max_iters=irls_iters, tol=irls_tol)
        # reciprocal consistency: the reverse registration must invert the
        # forward one; disagreement means the fit is not geometrically stable
        bwd = irls_sim3(pts_joint, pts_chunk, conf=conf,
                        delta=irls_delta, max_iters=irls_iters, tol=irls_tol)
        recip = _chart_norm(sim3_compose(fwd.transform, bwd.transform))
        return fwd.transform, float(fwd.rmse), int(fwd.n_effective), recip

    j = joint_prediction
    slice_a = {
        "depth": j.depth[:na], "conf": j.conf[:na],
        "extrinsics": j.extrinsics[:na], "intrinsics": j.intrinsics[:na],
    }
    slice_b = {
        "depth": j.depth[na:], "conf": j.conf[na:],
        "extrinsics": j.extrinsics[na:], "intrinsics": j.intrinsics[na:],
    }
    T_a, rmse_a, na_eff, rec_a = register(chunk_a, slice_a)  # a → joint
    T_b, rmse_b, nb_eff, rec_b = register(chunk_b, slice_b)  # b → joint
    return LoopConstraint(
        transform=sim3_compose(sim3_inverse(T_a), T_b),
        rmse=max(rmse_a, rmse_b),
        n_effective=min(na_eff, nb_eff),
        reciprocal_err=max(rec_a, rec_b),
    )
