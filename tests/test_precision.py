"""Long-chain precision: f32 carry drift over 500+ chunks (SURVEY §7.3.6).

The SLAM solver's only cross-chunk state is the f32 ``[3, 4]`` carry
(``prev_overlap_aligned_3x4``): every chunk composes one more rotation onto
it.  Without projection back to SO(3), the orthonormality error of the carry
compounds multiplicatively (the reference instead re-normalised rotation by
the Sim3 scale, utils/da3_streaming.py:772); ``align_chunk_single_overlap``
projects the anchor pose each chunk (slam/alignment.py).  These tests
quantify f32-vs-f64 drift over a 520-chunk chain (3641 frames) and pin the
projected path's bound.  The f64 reference chain runs in NumPy (tests keep
jax in default f32).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from da3slam_tpu.core.transforms import orthonormalize_rotation
from da3slam_tpu.slam.alignment import chain_extrinsics

N_CHUNKS = 520
FRAMES_PER_CHUNK = 8  # overlap 1 → 7 new frames per chunk


def _np_compose(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """float64 mirror of core.transforms.se3_compose (result = A @ B)."""
    R = A[..., :3, :3] @ B[..., :3, :3]
    t = np.einsum("...ij,...j->...i", A[..., :3, :3], B[..., :3, 3]) + A[..., :3, 3]
    return np.concatenate([R, t[..., None]], axis=-1)


def _np_inverse(E: np.ndarray) -> np.ndarray:
    Rt = np.swapaxes(E[..., :3, :3], -1, -2)
    t = -np.einsum("...ij,...j->...i", Rt, E[..., :3, 3])
    return np.concatenate([Rt, t[..., None]], axis=-1)


def _rotvec_to_matrix(v: np.ndarray) -> np.ndarray:
    ang = np.linalg.norm(v)
    if ang < 1e-12:
        return np.eye(3)
    ax = v / ang
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def _rotation_walk_trajectory(n_frames: int, seed: int = 3) -> np.ndarray:
    """w2c trajectory with substantial per-frame rotation (a rotation random
    walk, ~1 deg/frame) — far more SO(3) stress than the smooth orbit in
    utils/synthetic.py, which barely rotates."""
    rng = np.random.default_rng(seed)
    R = np.eye(3)
    center = np.zeros(3)
    poses = []
    for _ in range(n_frames):
        R = _rotvec_to_matrix(rng.normal(scale=0.02, size=3)) @ R
        center = center + rng.normal(scale=0.01, size=3)
        t = -R @ center
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    return np.stack(poses)  # float64


def _chunk_locals(gt_w2c: np.ndarray, step: int, n: int) -> list[np.ndarray]:
    """Chunk-local extrinsics: each chunk's poses premultiplied (on the world
    side) by a random per-chunk SE(3) — the exact local-world ambiguity the
    single-overlap chain must absorb telescopically."""
    rng = np.random.default_rng(7)
    chunks = []
    n_chunks = (len(gt_w2c) - 1) // step
    for k in range(n_chunks):
        E = gt_w2c[k * step : k * step + n]  # [n, 3, 4] float64
        A_R = _rotvec_to_matrix(rng.normal(scale=0.5, size=3))
        A_t = rng.normal(scale=0.5, size=3)
        Ainv = np.concatenate([A_R.T, (-A_R.T @ A_t)[:, None]], axis=1)
        chunks.append(_np_compose(E, Ainv[None]))  # E ∘ A⁻¹
    return chunks


def _np_chain(chunks: list[np.ndarray], first_global: np.ndarray) -> np.ndarray:
    """float64 reference: chain each chunk onto the carry, overlap 1."""
    carry = first_global.copy()
    out = []
    for k, E_local in enumerate(chunks):
        rel = _np_compose(E_local, _np_inverse(E_local[0])[None])
        Eg = _np_compose(rel, carry[None])
        carry = Eg[-1]
        out.append(Eg[1:] if k else Eg)
    return np.concatenate(out)


def _jax_chain(chunks, first_global, reortho: bool) -> tuple[np.ndarray, float]:
    """The solver's f32 carry loop through the jitted chain; returns
    (all-frame global w2c, worst carry orthonormality error)."""
    chain = jax.jit(chain_extrinsics)
    reproject = jax.jit(
        lambda E: jnp.concatenate(
            [orthonormalize_rotation(E[..., :3]), E[..., 3:]], axis=-1
        )
    )
    carry = jnp.asarray(first_global, jnp.float32)
    out = []
    worst_ortho = 0.0
    for k, E_local in enumerate(chunks):
        Eg = chain(jnp.asarray(E_local, jnp.float32), carry, 0)
        if reortho:
            Eg = reproject(Eg)
        carry = Eg[-1]
        R = np.asarray(carry[..., :3], np.float64)
        worst_ortho = max(worst_ortho, float(np.abs(R.T @ R - np.eye(3)).max()))
        E_np = np.asarray(Eg, np.float64)
        out.append(E_np[1:] if k else E_np)
    return np.concatenate(out), worst_ortho


def _positions(w2c: np.ndarray) -> np.ndarray:
    return -np.einsum("nji,nj->ni", w2c[..., :3], w2c[..., 3])


@pytest.fixture(scope="module")
def chain_world():
    step = FRAMES_PER_CHUNK - 1
    gt = _rotation_walk_trajectory(N_CHUNKS * step + 1)
    chunks = _chunk_locals(gt, step, FRAMES_PER_CHUNK)
    # chunk 0's local world IS the run's global frame (solver.py:206-211)
    return gt, chunks, chunks[0][0]


class TestLongChainDrift:
    def test_f64_chain_recovers_gt_shape(self, chain_world):
        """The f64 chain is exact: per-chunk world ambiguity cancels
        telescopically, leaving the GT trajectory up to one global SE(3)
        gauge — so pairwise camera-center distances match GT to 1e-9."""
        gt, chunks, first = chain_world
        est = _np_chain(chunks, first)
        assert len(est) == len(gt)
        idx = np.linspace(0, len(est) - 1, 40).astype(int)
        p_est, p_gt = _positions(est)[idx], _positions(gt)[idx]
        d_est = np.linalg.norm(p_est[:, None] - p_est[None], axis=-1)
        d_gt = np.linalg.norm(p_gt[:, None] - p_gt[None], axis=-1)
        assert np.abs(d_est - d_gt).max() < 1e-9

    def test_f32_carry_drift_vs_f64(self, chain_world):
        """Quantify the drift the f32 carry adds over 520 chunks, with and
        without the per-chunk SO(3) projection, against the f64 chain."""
        gt, chunks, first = chain_world
        ref = _np_chain(chunks, first)
        raw, raw_ortho = _jax_chain(chunks, first, reortho=False)
        fix, fix_ortho = _jax_chain(chunks, first, reortho=True)

        p_ref = _positions(ref)
        ate_raw = float(np.sqrt(((_positions(raw) - p_ref) ** 2).sum(-1).mean()))
        ate_fix = float(np.sqrt(((_positions(fix) - p_ref) ** 2).sum(-1).mean()))
        print(
            f"\n520-chunk f32 drift vs f64: raw ATE {ate_raw:.2e} "
            f"(orthonormality {raw_ortho:.2e}) | "
            f"reortho ATE {ate_fix:.2e} ({fix_ortho:.2e})"
        )

        # the projected carry NEVER leaves SO(3) beyond a few f32 ulps
        # (measured: raw ~1.9e-6 / projected ~1.4e-6 at 520 chunks — f32
        # compose drift is benign at this scale, and projection pins it)
        assert fix_ortho < 5e-6
        # trajectory error stays bounded: < 1 mm RMS on a multi-unit-extent
        # trajectory after 520 chunks / 3641 frames
        assert ate_fix < 1e-3
        # and projection never costs accuracy relative to the raw carry
        assert ate_fix < ate_raw * 1.5 + 1e-6

    def test_aligner_projects_anchor(self):
        """The real jitted aligner (slam/alignment.py) re-orthonormalises the
        carry: feed a deliberately de-orthonormalised previous pose and check
        the output anchor is back on SO(3)."""
        from da3slam_tpu.slam.alignment import (
            AlignmentConfig,
            align_chunk_single_overlap,
        )

        H = W = 32
        n = 4
        rng = np.random.default_rng(0)
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
        depth = 2.0 + rng.random((H, W)).astype(np.float32) * 0.1
        cur_E = np.stack(
            [np.concatenate([np.eye(3), np.zeros((3, 1))], 1)] * n
        ).astype(np.float32)
        # previous-pose rotation perturbed off SO(3) by ~1e-3
        R_bad = np.eye(3, dtype=np.float32) + rng.normal(
            scale=1e-3, size=(3, 3)
        ).astype(np.float32)
        prev_global = np.concatenate([R_bad, np.zeros((3, 1), np.float32)], 1)

        out = jax.jit(
            lambda **kw: align_chunk_single_overlap(config=AlignmentConfig(), **kw)
        )(
            prev_depth=depth,
            prev_conf=np.ones((H, W), np.float32),
            prev_K=K,
            cur_depth=np.stack([depth] * n),
            cur_conf=np.ones((n, H, W), np.float32),
            cur_K=np.stack([K] * n),
            cur_extrinsics=cur_E,
            prev_overlap_global=prev_global,
        )
        R = np.asarray(out.extrinsics_global[0, :, :3], np.float64)
        assert np.abs(R.T @ R - np.eye(3)).max() < 1e-5
