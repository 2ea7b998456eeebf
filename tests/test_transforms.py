import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da3slam_tpu.core import (
    se3_to_4x4,
    se3_inverse,
    se3_compose,
    sim3_apply,
    sim3_compose,
    sim3_inverse,
    sim3_accumulate,
    sim3_identity,
    sim3_to_matrix,
    sim3_transform_w2c,
    quat_to_rotmat,
    rotmat_to_quat,
    orthonormalize_rotation,
)
from da3slam_tpu.core.transforms import Sim3


def random_rotation(rng):
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    return np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))


def random_se3(rng):
    R = random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    return jnp.asarray(np.concatenate([R, t[:, None]], axis=1), jnp.float32)


def random_sim3(rng):
    return Sim3(
        jnp.asarray(np.exp(rng.normal() * 0.3), jnp.float32),
        jnp.asarray(random_rotation(rng)),
        jnp.asarray(rng.normal(size=3), jnp.float32),
    )


class TestSE3:
    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(0)
        E = random_se3(rng)
        I = se3_compose(E, se3_inverse(E))
        np.testing.assert_allclose(np.asarray(I), np.eye(4)[:3], atol=1e-5)

    def test_inverse_matches_linalg(self):
        rng = np.random.default_rng(1)
        E = random_se3(rng)
        expected = np.linalg.inv(np.asarray(se3_to_4x4(E), np.float64))[:3]
        np.testing.assert_allclose(np.asarray(se3_inverse(E)), expected, atol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(2)
        Es = jnp.stack([random_se3(rng) for _ in range(5)])
        inv = se3_inverse(Es)
        for i in range(5):
            np.testing.assert_allclose(
                np.asarray(inv[i]), np.asarray(se3_inverse(Es[i])), atol=1e-6
            )

    def test_compose_matches_matmul(self):
        rng = np.random.default_rng(3)
        A, B = random_se3(rng), random_se3(rng)
        expected = (np.asarray(se3_to_4x4(A)) @ np.asarray(se3_to_4x4(B)))[:3]
        np.testing.assert_allclose(np.asarray(se3_compose(A, B)), expected, atol=1e-5)


class TestSim3:
    def test_compose_is_application_order(self):
        rng = np.random.default_rng(4)
        A, B = random_sim3(rng), random_sim3(rng)
        p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        via_compose = sim3_apply(sim3_compose(A, B), p)
        via_sequential = sim3_apply(A, sim3_apply(B, p))
        np.testing.assert_allclose(np.asarray(via_compose), np.asarray(via_sequential), atol=1e-4)

    def test_inverse(self):
        rng = np.random.default_rng(5)
        T = random_sim3(rng)
        p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        back = sim3_apply(sim3_inverse(T), sim3_apply(T, p))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)

    def test_accumulate_matches_reference_semantics(self):
        """Entry k of the accumulation maps chunk-k coords to chunk-0 coords,
        entry 0 is identity — the contract of the reference's
        accumulate_sim3_transforms (utils/geometry.py:73-119)."""
        rng = np.random.default_rng(6)
        Ts = [random_sim3(rng) for _ in range(4)]
        stacked = Sim3(
            jnp.stack([T.s for T in Ts]),
            jnp.stack([T.R for T in Ts]),
            jnp.stack([T.t for T in Ts]),
        )
        acc = sim3_accumulate(stacked)
        assert acc.s.shape[0] == 5
        np.testing.assert_allclose(np.asarray(acc.R[0]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(float(acc.s[0]), 1.0, atol=1e-6)
        # manual chain: acc[k] = T1 ∘ T2 ∘ ... ∘ Tk
        cur = sim3_identity()
        for k, T in enumerate(Ts, start=1):
            cur = sim3_compose(cur, T)
            np.testing.assert_allclose(float(acc.s[k]), float(cur.s), rtol=1e-4)
            np.testing.assert_allclose(np.asarray(acc.R[k]), np.asarray(cur.R), atol=1e-4)
            np.testing.assert_allclose(np.asarray(acc.t[k]), np.asarray(cur.t), atol=1e-3)

    def test_to_matrix_apply_equivalence(self):
        rng = np.random.default_rng(7)
        T = random_sim3(rng)
        p = rng.normal(size=(5, 3)).astype(np.float32)
        M = np.asarray(sim3_to_matrix(T))
        ph = np.concatenate([p, np.ones((5, 1), np.float32)], axis=1)
        expected = (ph @ M.T)[:, :3]
        np.testing.assert_allclose(np.asarray(sim3_apply(T, jnp.asarray(p))), expected, atol=1e-4)

    def test_transform_w2c_preserves_camera_coords(self):
        """A world point and its Sim3-moved copy must land at the same camera
        coords (up to scale s) under the transformed extrinsic — the invariant
        behind reference utils/geometry.py:121-160."""
        rng = np.random.default_rng(8)
        E = random_se3(rng)
        T = random_sim3(rng)
        p_cur = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
        p_ref = sim3_apply(T, p_cur)
        E_ref = sim3_transform_w2c(E, T)

        R, t = E[:3, :3], E[:3, 3]
        cam_before = p_cur @ R.T + t
        Rr, tr = E_ref[:3, :3], E_ref[:3, 3]
        cam_after = p_ref @ Rr.T + tr
        np.testing.assert_allclose(np.asarray(cam_after), np.asarray(cam_before), atol=1e-4)


class TestRotations:
    def test_quat_roundtrip(self):
        rng = np.random.default_rng(9)
        for _ in range(20):
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = quat_to_rotmat(jnp.asarray(q, jnp.float32))
            q2 = rotmat_to_quat(R)
            np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)

    def test_quat_to_rotmat_is_rotation(self):
        rng = np.random.default_rng(10)
        R = random_rotation(rng)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_orthonormalize(self):
        rng = np.random.default_rng(11)
        R = random_rotation(rng) + rng.normal(size=(3, 3)) * 0.01
        Ro = np.asarray(orthonormalize_rotation(jnp.asarray(R, jnp.float32)))
        np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(Ro), 1.0, atol=1e-5)

    def test_rotmat_to_quat_batched_jit(self):
        rng = np.random.default_rng(12)
        Rs = jnp.stack([jnp.asarray(random_rotation(rng)) for _ in range(8)])
        qs = jax.jit(rotmat_to_quat)(Rs)
        back = quat_to_rotmat(qs)
        np.testing.assert_allclose(np.asarray(back), np.asarray(Rs), atol=1e-4)


class TestSlerpRotations:
    def test_endpoints_and_midpoint(self):
        import numpy as np
        import jax.numpy as jnp

        from da3slam_tpu.core.transforms import slerp_rotations

        # 90-deg z rotation: midpoint must be the 45-deg rotation
        c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
        Ra = np.eye(3)
        Rb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        np.testing.assert_allclose(
            np.asarray(slerp_rotations(Ra, Rb, 0.0)), Ra, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(slerp_rotations(Ra, Rb, 1.0)), Rb, atol=1e-6)
        mid = np.asarray(slerp_rotations(Ra, Rb, 0.5))
        c4, s4 = np.cos(np.pi / 4), np.sin(np.pi / 4)
        np.testing.assert_allclose(
            mid, [[c4, -s4, 0], [s4, c4, 0], [0, 0, 1]], atol=1e-6)

    def test_identical_rotations_stable(self):
        import numpy as np

        from da3slam_tpu.core.transforms import slerp_rotations

        R = np.eye(3)
        out = np.asarray(slerp_rotations(R, R, 0.3))
        np.testing.assert_allclose(out, R, atol=1e-6)
