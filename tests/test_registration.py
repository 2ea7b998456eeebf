import jax
import jax.numpy as jnp
import numpy as np

from da3slam_tpu.core import backproject_depth, quat_to_rotmat, sim3_apply
from da3slam_tpu.core.transforms import Sim3
from da3slam_tpu.ops import (
    weighted_umeyama,
    umeyama,
    huber_weights,
    irls_sim3,
    icp_point_to_point,
)


def random_sim3(rng, scale_spread=0.3, t_spread=1.0):
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    return Sim3(
        jnp.asarray(np.exp(rng.normal() * scale_spread), jnp.float32),
        quat_to_rotmat(jnp.asarray(q, jnp.float32)),
        jnp.asarray(rng.normal(size=3) * t_spread, jnp.float32),
    )


def assert_sim3_close(T, T_ref, s_tol=1e-3, R_tol=1e-3, t_tol=1e-2):
    np.testing.assert_allclose(float(T.s), float(T_ref.s), rtol=s_tol)
    np.testing.assert_allclose(np.asarray(T.R), np.asarray(T_ref.R), atol=R_tol)
    np.testing.assert_allclose(np.asarray(T.t), np.asarray(T_ref.t), atol=t_tol)


class TestUmeyama:
    def test_recovers_exact_sim3(self):
        rng = np.random.default_rng(0)
        T = random_sim3(rng)
        src = jnp.asarray(rng.normal(size=(200, 3)), jnp.float32)
        dst = sim3_apply(T, src)
        assert_sim3_close(umeyama(src, dst), T)

    def test_recovers_exact_se3_without_scale(self):
        rng = np.random.default_rng(1)
        T = random_sim3(rng, scale_spread=0.0)
        src = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        dst = sim3_apply(T, src)
        got = umeyama(src, dst, with_scale=False)
        assert float(got.s) == 1.0
        assert_sim3_close(got, T)

    def test_zero_weight_points_ignored(self):
        rng = np.random.default_rng(2)
        T = random_sim3(rng)
        src = jnp.asarray(rng.normal(size=(150, 3)), jnp.float32)
        dst = np.asarray(sim3_apply(T, src)).copy()
        dst[:50] += rng.normal(size=(50, 3)) * 100  # corrupted
        w = np.ones(150, np.float32)
        w[:50] = 0.0
        got = weighted_umeyama(src, jnp.asarray(dst), jnp.asarray(w))
        assert_sim3_close(got, T)

    def test_reflection_handling(self):
        """Degenerate planar clouds must still produce det(R)=+1."""
        rng = np.random.default_rng(3)
        src = rng.normal(size=(80, 3)).astype(np.float32)
        src[:, 2] = 0.0  # planar
        T = random_sim3(rng)
        dst = sim3_apply(T, jnp.asarray(src))
        got = umeyama(jnp.asarray(src), dst)
        np.testing.assert_allclose(np.linalg.det(np.asarray(got.R)), 1.0, atol=1e-4)

    def test_jit_compatible(self):
        rng = np.random.default_rng(4)
        src = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        T = random_sim3(rng)
        dst = sim3_apply(T, src)
        got = jax.jit(umeyama)(src, dst)
        assert_sim3_close(got, T)


class TestHuber:
    def test_weights(self):
        r = jnp.asarray([0.0, 0.5, 1.0, 2.0, 10.0])
        w = np.asarray(huber_weights(r, delta=1.0))
        np.testing.assert_allclose(w, [1.0, 1.0, 1.0, 0.5, 0.1], atol=1e-6)


class TestIRLS:
    def test_robust_to_outliers(self):
        rng = np.random.default_rng(5)
        T = random_sim3(rng, t_spread=0.5)
        src = rng.normal(size=(500, 3)).astype(np.float32)
        dst = np.asarray(sim3_apply(T, jnp.asarray(src))).copy()
        # 20% gross outliers, no confidence hint
        idx = rng.choice(500, 100, replace=False)
        dst[idx] += rng.normal(size=(100, 3)) * 5.0
        res = irls_sim3(jnp.asarray(src), jnp.asarray(dst), max_iters=10, delta=0.1)
        assert_sim3_close(res.transform, T, s_tol=0.02, R_tol=0.02, t_tol=0.05)

    def test_confidence_weighting(self):
        rng = np.random.default_rng(6)
        T = random_sim3(rng)
        src = rng.normal(size=(300, 3)).astype(np.float32)
        dst = np.asarray(sim3_apply(T, jnp.asarray(src))).copy()
        conf = np.ones(300, np.float32)
        dst[:100] += 50.0
        conf[:100] = 0.0  # hard-gated by caller (the reference's conf threshold)
        res = irls_sim3(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(conf))
        assert_sim3_close(res.transform, T, s_tol=0.01, R_tol=0.01, t_tol=0.02)
        assert float(res.rmse) < 1e-3

    def test_min_points_fallback_to_identity(self):
        rng = np.random.default_rng(7)
        src = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)  # 50 < 100
        dst = src * 2.0
        res = irls_sim3(src, dst, min_points=100)
        assert float(res.transform.s) == 1.0
        np.testing.assert_allclose(np.asarray(res.transform.R), np.eye(3))
        np.testing.assert_allclose(np.asarray(res.transform.t), np.zeros(3))

    def test_tol_early_exit_matches_reference_semantics(self):
        """configs/config1.yaml's IRLS `tol` is honored: the while_loop path
        stops once |Δs| + ‖ΔR‖ + ‖Δt‖ < tol (reference utils/align.py:199-213)
        — a huge tol stops after the first update (= max_iters=1), a tiny
        tol runs all iterations (= the fixed fori_loop path)."""
        rng = np.random.default_rng(11)
        T = random_sim3(rng, t_spread=0.5)
        src = rng.normal(size=(400, 3)).astype(np.float32)
        dst = np.asarray(sim3_apply(T, jnp.asarray(src))).copy()
        idx = rng.choice(400, 80, replace=False)
        dst[idx] += rng.normal(size=(80, 3)) * 5.0
        src, dst = jnp.asarray(src), jnp.asarray(dst)

        one_iter = irls_sim3(src, dst, max_iters=1, delta=0.1)
        huge_tol = irls_sim3(src, dst, max_iters=10, delta=0.1, tol=1e9)
        # tol checked AFTER the update: the first iteration always runs
        np.testing.assert_allclose(
            np.asarray(huge_tol.transform.t), np.asarray(one_iter.transform.t),
            atol=1e-6,
        )

        fixed = irls_sim3(src, dst, max_iters=10, delta=0.1)
        tiny_tol = irls_sim3(src, dst, max_iters=10, delta=0.1, tol=1e-30)
        np.testing.assert_allclose(
            np.asarray(tiny_tol.transform.t), np.asarray(fixed.transform.t),
            atol=1e-6,
        )
        # and the converged result still recovers the transform under jit
        jitted = jax.jit(
            lambda s, d: irls_sim3(s, d, max_iters=10, delta=0.1, tol=1e-9)
        )(src, dst)
        assert_sim3_close(jitted.transform, T, s_tol=0.02, R_tol=0.02, t_tol=0.05)

    def test_nonfinite_points_dropped(self):
        rng = np.random.default_rng(8)
        T = random_sim3(rng)
        src = rng.normal(size=(300, 3)).astype(np.float32)
        dst = np.asarray(sim3_apply(T, jnp.asarray(src))).copy()
        src[:20] = np.nan
        res = irls_sim3(jnp.asarray(src), jnp.asarray(dst))
        assert np.isfinite(float(res.rmse))
        assert_sim3_close(res.transform, T, s_tol=0.01, R_tol=0.01, t_tol=0.02)


def smooth_depth(H, W, rng):
    """A smooth synthetic depth surface (sum of low-frequency sinusoids)."""
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    d = 2.0 + 0.3 * np.sin(2 * np.pi * u / W) + 0.2 * np.cos(2 * np.pi * v / H)
    return jnp.asarray(d, jnp.float32)


class TestProjectiveICP:
    def setup_method(self):
        self.H, self.W = 48, 64
        self.K = jnp.asarray(
            [[60.0, 0, self.W / 2], [0, 60.0, self.H / 2], [0, 0, 1]], jnp.float32
        )

    def test_identity_on_identical_clouds(self):
        rng = np.random.default_rng(9)
        depth = smooth_depth(self.H, self.W, rng)
        tgt_map = backproject_depth(depth, self.K)
        src = tgt_map.reshape(-1, 3)
        res = icp_point_to_point(src, tgt_map, self.K, max_iterations=5)
        np.testing.assert_allclose(np.asarray(res.transform.R), np.eye(3), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.transform.t), np.zeros(3), atol=1e-4)
        assert float(res.fitness) > 0.99
        assert float(res.inlier_rmse) < 1e-3

    def test_recovers_small_se3(self):
        rng = np.random.default_rng(10)
        depth = smooth_depth(self.H, self.W, rng)
        tgt_map = backproject_depth(depth, self.K)
        # ground truth: src = T_inv(tgt); ICP must recover T with tgt ≈ T(src)
        q = np.array([60.0, 0.3, -0.2, 0.25])
        R = quat_to_rotmat(jnp.asarray(q / np.linalg.norm(q), jnp.float32))
        t = jnp.asarray([0.02, -0.015, 0.03], jnp.float32)
        T = Sim3(jnp.asarray(1.0, jnp.float32), R, t)
        src = np.asarray(sim3_apply(
            Sim3(1.0 / T.s, T.R.T, -(T.R.T @ T.t) / T.s), tgt_map.reshape(-1, 3)
        ))
        res = icp_point_to_point(
            jnp.asarray(src), tgt_map, self.K, threshold=0.1, max_iterations=10
        )
        np.testing.assert_allclose(np.asarray(res.transform.R), np.asarray(R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.transform.t), np.asarray(t), atol=1e-4)
        assert float(res.fitness) > 0.99
        assert float(res.inlier_rmse) < 1e-4

    def test_recovers_sim3_with_scale(self):
        rng = np.random.default_rng(11)
        depth = smooth_depth(self.H, self.W, rng)
        tgt_map = backproject_depth(depth, self.K)
        T = Sim3(
            jnp.asarray(1.05, jnp.float32),
            jnp.eye(3, dtype=jnp.float32),
            jnp.asarray([0.01, 0.02, -0.01], jnp.float32),
        )
        src = np.asarray(tgt_map.reshape(-1, 3)).copy()
        src = (src - np.asarray(T.t)) / 1.05  # T(src) = tgt
        res = icp_point_to_point(
            jnp.asarray(src, jnp.float32), tgt_map, self.K,
            threshold=0.1, max_iterations=15, with_scale=True,
        )
        np.testing.assert_allclose(float(res.transform.s), 1.05, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.transform.t), np.asarray(T.t), atol=1e-4)

    def test_invalid_source_points_ignored(self):
        rng = np.random.default_rng(12)
        depth = smooth_depth(self.H, self.W, rng)
        tgt_map = backproject_depth(depth, self.K)
        src = np.asarray(tgt_map.reshape(-1, 3)).copy()
        src[:200] = np.nan  # must not poison the solve (ref filters NaN)
        res = icp_point_to_point(jnp.asarray(src), tgt_map, self.K, max_iterations=5)
        np.testing.assert_allclose(np.asarray(res.transform.R), np.eye(3), atol=1e-4)
        assert np.isfinite(float(res.inlier_rmse))

    def test_jit(self):
        rng = np.random.default_rng(13)
        depth = smooth_depth(self.H, self.W, rng)
        tgt_map = backproject_depth(depth, self.K)
        f = jax.jit(lambda s, m: icp_point_to_point(s, m, self.K, max_iterations=10))
        res = f(tgt_map.reshape(-1, 3), tgt_map)
        assert float(res.fitness) > 0.99
