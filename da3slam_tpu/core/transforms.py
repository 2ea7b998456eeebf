"""SE(3) / Sim(3) transform algebra as batched, jit-friendly JAX functions.

Conventions (matching the reference pipeline's contract):
  * extrinsics are world-to-camera (w2c) ``[..., 3, 4]`` in OpenCV convention
    (reference: solver.py:174, src/vggt/utils/geometry.py:58)
  * a Sim(3) is the triple ``(s, R, t)`` acting as ``p' = s * R @ p + t``
    (reference semantics: utils/geometry.py:43-119)

Everything here is shape-polymorphic over leading batch dims and safe to use
inside ``jit`` / ``vmap`` / ``scan``.  No data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def highest_precision(fn):
    """Trace ``fn`` with full-f32 matmul precision.

    TPU f32 matmuls default to bf16 inputs — harmless inside the network,
    catastrophic for pose math: rotation chains and registration solves
    accumulate 1e-2-level errors into garbage trajectories.  Every
    geometry/registration entry point wears this decorator; the model
    forward deliberately does not (bf16 is the point there).
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


class Sim3(NamedTuple):
    """Similarity transform p' = s * R @ p + t (a pytree; batch dims allowed)."""

    s: jax.Array  # [...]
    R: jax.Array  # [..., 3, 3]
    t: jax.Array  # [..., 3]


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_to_4x4(E: jax.Array) -> jax.Array:
    """Promote ``[..., 3, 4]`` w2c to homogeneous ``[..., 4, 4]``."""
    batch = E.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), dtype=E.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([E, bottom], axis=-2)


def se3_from_4x4(E: jax.Array) -> jax.Array:
    """Truncate homogeneous ``[..., 4, 4]`` to ``[..., 3, 4]``."""
    return E[..., :3, :4]


def se3_inverse(E: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform.

    Accepts ``[..., 3, 4]`` or ``[..., 4, 4]``; returns the same shape.
    Avoids a general linear solve (reference used ``np.linalg.inv`` on 4x4,
    e.g. utils/align_geometry_single.py:231).
    """
    R = E[..., :3, :3]
    t = E[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    if E.shape[-2] == 4:
        out = se3_to_4x4(out)
    return out


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """Compose two ``[..., 3, 4]`` rigid transforms: result = A @ B (as 4x4s)."""
    Ra, ta = A[..., :3, :3], A[..., :3, 3]
    Rb, tb = B[..., :3, :3], B[..., :3, 3]
    R = jnp.einsum("...ij,...jk->...ik", Ra, Rb)
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


def orthonormalize_rotation(R: jax.Array) -> jax.Array:
    """Project a near-rotation matrix back onto SO(3) via SVD.

    Used to control drift in long extrinsic chains (the reference instead
    re-normalised rotation by the Sim3 scale, utils/da3_streaming.py:772).
    """
    U, _, Vt = jnp.linalg.svd(R, full_matrices=False)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.ones(R.shape[:-2] + (3,), R.dtype).at[..., 2].set(det)
    return jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def sim3_identity(dtype=jnp.float32) -> Sim3:
    return Sim3(jnp.asarray(1.0, dtype), jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype))


def sim3_apply(T: Sim3, points: jax.Array) -> jax.Array:
    """Apply ``p' = s * R p + t``.

    ``points`` is ``[..., N, 3]``; for an unbatched Sim3 any leading shape is
    fine (e.g. ``[H, W, 3]`` point maps), for a batched Sim3 the leading batch
    dims must match (``[K, N, 3]`` with ``Sim3[K]``).
    Matches reference ``apply_sim3_transform`` (utils/geometry.py:43-70).
    """
    rotated = points @ jnp.swapaxes(T.R, -1, -2)
    s = jnp.asarray(T.s)[..., None, None]
    t = jnp.asarray(T.t)[..., None, :]
    return s * rotated + t


def sim3_compose(A: Sim3, B: Sim3) -> Sim3:
    """T = A ∘ B so that ``T(p) = A(B(p))``.

    Derivation (reference documents the same algebra at
    utils/geometry.py:73-119):
      A(B(p)) = sA RA (sB RB p + tB) + tA
              = (sA sB) (RA RB) p + (sA RA tB + tA)
    """
    s = A.s * B.s
    R = jnp.einsum("...ij,...jk->...ik", A.R, B.R)
    t = A.s[..., None] * jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t
    return Sim3(s, R, t)


def sim3_inverse(T: Sim3) -> Sim3:
    """Inverse: p = (1/s) R^T (p' - t)."""
    s_inv = 1.0 / T.s
    Rt = jnp.swapaxes(T.R, -1, -2)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, T.t)
    return Sim3(s_inv, Rt, t_inv)


def sim3_accumulate(transforms: Sim3) -> Sim3:
    """Prefix-compose a sequence of chunk-to-previous-chunk Sim(3)s.

    Input is a *stacked* Sim3 with leading axis K (transform k maps chunk-k
    coordinates into chunk-(k-1) coordinates).  Returns stacked Sim3 with
    leading axis K+1 where entry k maps chunk-k coordinates into chunk-0
    coordinates; entry 0 is the identity.  Mirrors reference
    ``accumulate_sim3_transforms`` (utils/geometry.py:73-119) but as an
    associative scan rather than a Python loop.
    """
    dtype = transforms.R.dtype

    def combine(a: Sim3, b: Sim3) -> Sim3:
        return sim3_compose(a, b)

    acc = jax.lax.associative_scan(combine, transforms)
    ident = Sim3(
        jnp.ones((1,), dtype), jnp.eye(3, dtype=dtype)[None], jnp.zeros((1, 3), dtype)
    )
    return Sim3(
        jnp.concatenate([ident.s, acc.s]),
        jnp.concatenate([ident.R, acc.R]),
        jnp.concatenate([ident.t, acc.t]),
    )


def sim3_to_matrix(T: Sim3) -> jax.Array:
    """``[..., 4, 4]`` matrix with upper-left ``s*R`` (the streaming path's S,
    utils/da3_streaming.py:753-756)."""
    batch = T.R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), T.R.dtype)
    M = M.at[..., :3, :3].set(T.s[..., None, None] * T.R)
    M = M.at[..., :3, 3].set(T.t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def sim3_transform_w2c(E: jax.Array, T: Sim3) -> jax.Array:
    """Re-express a w2c extrinsic under a Sim(3) change of world frame.

    ``T`` maps current-chunk world coords to reference-chunk world coords
    (p_ref = s R p_cur + t).  Returns w2c_ref such that camera coordinates are
    preserved up to the scale factor — the same derivation as the reference's
    ``transform_camara_extrinsics`` (utils/geometry.py:121-160):

      w2c_ref = w2c_cur @ [ (1/s) R^T | -(1/s) R^T t ]
    """
    Tinv = sim3_inverse(T)
    M = jnp.concatenate(
        [Tinv.s[..., None, None] * Tinv.R, Tinv.t[..., None]], axis=-1
    )  # [...,3,4] affine p_ref -> p_cur (with scale folded in)
    E44 = se3_to_4x4(E) if E.shape[-2] == 3 else E
    M44 = se3_to_4x4(M)
    out = jnp.einsum("...ij,...jk->...ik", E44, M44)
    return out[..., :3, :4]


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rotation vector ``[..., 3]`` → rotation matrix (Rodrigues), jit-safe
    with a Taylor fallback near zero."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    small = theta < 1e-6
    theta_safe = jnp.where(small, 1.0, theta)
    k = omega / theta_safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], -1),
            jnp.stack([kz, zeros, -kx], -1),
            jnp.stack([-ky, kx, zeros], -1),
        ],
        axis=-2,
    )
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    R_full = eye + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
    # first-order fallback for tiny angles (exact enough, avoids 0/0)
    Ox = jnp.stack(
        [
            jnp.stack([zeros, -omega[..., 2], omega[..., 1]], -1),
            jnp.stack([omega[..., 2], zeros, -omega[..., 0]], -1),
            jnp.stack([-omega[..., 1], omega[..., 0], zeros], -1),
        ],
        axis=-2,
    )
    R_small = eye + Ox
    return jnp.where(small[..., None], R_small, R_full)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix → rotation vector ``[..., 3]`` (inverse of so3_exp)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1) / 2, -1.0, 1.0)
    # θ ≲ 4.5e-4: identity neighbourhood (threshold must be representable
    # in f32 — 1-1e-12 would round to 1.0 and never fire)
    small = cos_theta > 1.0 - 1e-7
    # double-where: arccos' reverse-mode gradient is -1/√(1-x²) = -inf at
    # x = 1; even though the `small` branch discards θ there, reverse-mode
    # multiplies the discarded branch's cotangent (0 · inf = NaN).  Feed
    # arccos a safe input where its output is unused.
    theta = jnp.arccos(jnp.where(small, 0.0, cos_theta))
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # sin(theta) ≈ theta near zero → factor ≈ 1/2
    factor = jnp.where(
        small, 0.5, theta / jnp.maximum(2 * jnp.sin(theta), 1e-12)
    )
    return factor[..., None] * vee


# ---------------------------------------------------------------------------
# Rotation parameterisations
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-norm-insensitive quaternion (w, x, y, z) ``[..., 4]`` → ``[..., 3, 3]``."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """``[..., 3, 3]`` → quaternion (w, x, y, z), branch-free for jit.

    Uses the four standard Shepperd candidates and selects the best-conditioned
    one with ``argmax`` instead of Python branching.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = jnp.stack([
        safe_sqrt(1 + tr) / 2,
        (m21 - m12) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
        (m02 - m20) / (2 * safe_sqrt(1 + m11 - m00 - m22)),
        (m10 - m01) / (2 * safe_sqrt(1 + m22 - m00 - m11)),
    ], -1)
    qx = jnp.stack([
        (m21 - m12) / (2 * safe_sqrt(1 + tr)),
        safe_sqrt(1 + m00 - m11 - m22) / 2,
        (m01 + m10) / (2 * safe_sqrt(1 + m11 - m00 - m22)),
        (m02 + m20) / (2 * safe_sqrt(1 + m22 - m00 - m11)),
    ], -1)
    qy = jnp.stack([
        (m02 - m20) / (2 * safe_sqrt(1 + tr)),
        (m01 + m10) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
        safe_sqrt(1 + m11 - m00 - m22) / 2,
        (m12 + m21) / (2 * safe_sqrt(1 + m22 - m00 - m11)),
    ], -1)
    qz = jnp.stack([
        (m10 - m01) / (2 * safe_sqrt(1 + tr)),
        (m02 + m20) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
        (m12 + m21) / (2 * safe_sqrt(1 + m11 - m00 - m22)),
        safe_sqrt(1 + m22 - m00 - m11) / 2,
    ], -1)

    scores = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 + m11 - m00 - m22, 1 + m22 - m00 - m11], -1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(comps), 4(candidates)]
    q = jnp.take_along_axis(q, idx[..., None, None], axis=-1)[..., 0]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def slerp_rotations(Ra: jax.Array, Rb: jax.Array, t: float | jax.Array) -> jax.Array:
    """Spherical interpolation between rotation matrices ``[..., 3, 3]``
    (shortest arc, via quaternions; t=0 → Ra, t=1 → Rb)."""
    qa = rotmat_to_quat(jnp.asarray(Ra))
    qb = rotmat_to_quat(jnp.asarray(Rb))
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(dot < 0, -qb, qb)  # shortest arc
    dot = jnp.abs(dot).clip(max=1.0)
    theta = jnp.arccos(dot)
    sin_t = jnp.sin(theta)
    # fall back to lerp when nearly parallel (sin underflow)
    wa = jnp.where(sin_t > 1e-6, jnp.sin((1 - t) * theta) / sin_t, 1 - t)
    wb = jnp.where(sin_t > 1e-6, jnp.sin(t * theta) / sin_t, t)
    q = wa * qa + wb * qb
    return quat_to_rotmat(q)
