"""Differentiable tile rasterizer (ops/rasterize.py) + photometric splat
training (ops/splats.train_splats).

The load-bearing oracle: the tiled/binned path must match ``rasterize_dense``
(every splat vs every pixel, one global sort, identical footprint/alpha
cutoffs) to float tolerance on random scenes — that checks projection,
binning, per-tile depth ordering, rank packing, and compositing at once.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from da3slam_tpu.ops.rasterize import (
    bin_splats,
    project_gaussians,
    quat_to_rotmat,
    rasterize,
    rasterize_dense,
)

HW = (64, 96)


def make_scene(rng, G=40, spread=0.6):
    """Random splats in front of an identity camera."""
    means = np.stack(
        [
            rng.uniform(-spread, spread, G),
            rng.uniform(-spread * 0.6, spread * 0.6, G),
            rng.uniform(2.0, 4.0, G),
        ],
        axis=-1,
    )
    scales = rng.uniform(0.02, 0.08, (G, 3))
    quats = rng.normal(size=(G, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0.1, 0.9, (G, 3))
    opacity = rng.uniform(0.3, 0.9, G)
    K = np.array([[80.0, 0, HW[1] / 2], [0, 80.0, HW[0] / 2], [0, 0, 1.0]])
    E = np.eye(4)[:3]
    to = lambda x: jnp.asarray(x, jnp.float32)
    return tuple(map(to, (means, scales, quats, colors, opacity, K, E)))


class TestProjection:
    def test_center_splat_projects_to_principal_point(self):
        K = jnp.asarray([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1]])
        E = jnp.eye(4)[:3]
        proj = project_gaussians(
            jnp.asarray([[0.0, 0.0, 2.0]]), jnp.full((1, 3), 0.05),
            jnp.asarray([[1.0, 0, 0, 0]]), K, E, HW,
        )
        np.testing.assert_allclose(np.asarray(proj.mean2d[0]), [48.0, 32.0], atol=1e-5)
        assert float(proj.depth[0]) == pytest.approx(2.0)
        # isotropic: conic ≈ (1/σ_px², 0, 1/σ_px²) with σ_px = f·σ/z + dilation
        var = (100.0 * 0.05 / 2.0) ** 2 + 0.3
        np.testing.assert_allclose(
            np.asarray(proj.conic[0]), [1 / var, 0.0, 1 / var], rtol=1e-4, atol=1e-6
        )
        assert float(proj.radius[0]) == np.ceil(3 * np.sqrt(var))

    def test_behind_camera_culled(self):
        K = jnp.asarray([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1]])
        proj = project_gaussians(
            jnp.asarray([[0.0, 0.0, -1.0]]), jnp.full((1, 3), 0.05),
            jnp.asarray([[1.0, 0, 0, 0]]), K, jnp.eye(4)[:3], HW,
        )
        assert float(proj.radius[0]) == 0.0

    def test_quat_rotmat_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(16, 4))
        R = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
        eye = np.einsum("gij,gkj->gik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


class TestBinning:
    def test_table_is_depth_sorted_and_complete(self):
        rng = np.random.default_rng(1)
        means, scales, quats, colors, opacity, K, E = make_scene(rng, G=30)
        proj = project_gaussians(means, scales, quats, K, E, HW)
        table, overflow = bin_splats(proj, HW, tile=16, max_per_tile=64, fan=7)
        table = np.asarray(table)
        depth = np.asarray(proj.depth)
        assert int(np.asarray(overflow).sum()) == 0
        for t in range(table.shape[0]):
            idx = table[t][table[t] >= 0]
            assert (np.diff(depth[idx]) >= 0).all(), f"tile {t} not front-to-back"

    def test_overflow_counted(self):
        # 50 coincident splats at a mid-tile point (u=40, v=24 — the image
        # center would straddle a 4-tile corner), K=8: 42 dropped triples
        G = 50
        means = jnp.tile(jnp.asarray([[-0.16, -0.16, 2.0]]), (G, 1))
        proj = project_gaussians(
            means, jnp.full((G, 3), 0.01),
            jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (G, 1)),
            jnp.asarray([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1]]),
            jnp.eye(4)[:3], HW,
        )
        table, overflow = bin_splats(proj, HW, tile=16, max_per_tile=8, fan=3)
        assert int((jnp.asarray(table) >= 0).sum()) == 8
        assert int(np.asarray(overflow).sum()) == G - 8


class TestRasterizeMatchesDense:
    @pytest.mark.parametrize("seed", [2, 3])
    def test_random_scene(self, seed):
        rng = np.random.default_rng(seed)
        scene = make_scene(rng, G=40)
        rgb_t, a_t, aux = rasterize(*scene, HW, tile=16, max_per_tile=64, fan=9)
        rgb_d, a_d = rasterize_dense(*scene, HW)
        assert int(np.asarray(aux["overflow"]).sum()) == 0
        np.testing.assert_allclose(np.asarray(rgb_t), np.asarray(rgb_d), atol=2e-5)
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_d), atol=2e-5)

    def test_background_composites(self):
        rng = np.random.default_rng(4)
        scene = make_scene(rng, G=5)
        bg = jnp.asarray([0.2, 0.4, 0.6])
        rgb, alpha, _ = rasterize(*scene, HW, bg=bg)
        # empty corners show pure background
        empty = np.asarray(alpha) < 1e-6
        assert empty.any()
        np.testing.assert_allclose(
            np.asarray(rgb)[empty], np.broadcast_to(np.asarray(bg), (empty.sum(), 3)),
            atol=1e-6,
        )


class TestOcclusion:
    def test_front_splat_wins(self):
        K = jnp.asarray([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1]])
        E = jnp.eye(4)[:3]
        means = jnp.asarray([[0.0, 0.0, 4.0], [0.0, 0.0, 2.0]])  # far blue, near red
        scales = jnp.full((2, 3), 0.15)
        quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        colors = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        opacity = jnp.asarray([0.95, 0.95])
        rgb, _, _ = rasterize(means, scales, quats, colors, opacity, K, E, HW)
        center = np.asarray(rgb)[32, 48]
        assert center[0] > 0.9 and center[2] < 0.06, center


class TestGradients:
    def test_photometric_grads_finite_and_meaningful(self):
        rng = np.random.default_rng(5)
        means, scales, quats, colors, opacity, K, E = make_scene(rng, G=12)
        target = jnp.zeros((*HW, 3), jnp.float32)

        def loss(means, scales, quats, colors, opacity):
            rgb, _, _ = rasterize(means, scales, quats, colors, opacity, K, E, HW)
            return jnp.mean((rgb - target) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, colors, opacity
        )
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
        # colors of visible splats must feel pressure toward the target
        assert float(jnp.abs(grads[3]).max()) > 1e-6
        assert float(jnp.abs(grads[0]).max()) > 1e-8  # position grads flow

    def test_mean_grad_matches_finite_difference(self):
        K = jnp.asarray([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1]])
        E = jnp.eye(4)[:3]
        scales = jnp.full((1, 3), 0.1)
        quats = jnp.asarray([[1.0, 0, 0, 0]])
        colors = jnp.asarray([[1.0, 1.0, 1.0]])
        opacity = jnp.asarray([0.8])

        def loss(mx):
            means = jnp.stack([mx, jnp.zeros(()), jnp.asarray(2.0)])[None]
            rgb, _, _ = rasterize(means, scales, quats, colors, opacity, K, E, HW)
            # asymmetric target puts pressure along x
            return jnp.mean(rgb[:, :48] ** 2) + jnp.mean((rgb[:, 48:] - 1.0) ** 2)

        g = float(jax.grad(loss)(jnp.asarray(0.01)))
        eps = 1e-3
        fd = (float(loss(jnp.asarray(0.01 + eps))) - float(loss(jnp.asarray(0.01 - eps)))) / (2 * eps)
        assert g == pytest.approx(fd, rel=0.05, abs=1e-5)


class TestTrainSplats:
    def test_loss_decreases_on_toy_scene(self):
        from da3slam_tpu.ops.splats import train_splats

        rng = np.random.default_rng(6)
        means, scales, quats, colors, opacity, K, E = make_scene(rng, G=25)
        # targets: renders of a perturbed GT scene from 2 views
        E2 = jnp.asarray(
            [[1, 0, 0, 0.05], [0, 1, 0, 0.0], [0, 0, 1, 0.02]], jnp.float32
        )
        gt_colors = jnp.asarray(np.random.default_rng(7).uniform(0.1, 0.9, colors.shape), jnp.float32)
        views = []
        for e in (E, E2):
            img, _, _ = rasterize(means, scales, quats, gt_colors, opacity, K, e, HW)
            views.append(img)
        images = jnp.stack(views)
        Ks = jnp.stack([K, K])
        Es = jnp.stack([E, E2])

        res = train_splats(
            means, scales, quats, colors, opacity, images, Ks, Es, HW,
            iters=30, max_per_tile=64, fan=9,
        )
        losses = np.asarray(res.losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.6 * losses[0], losses
        assert np.isfinite(np.asarray(res.points)).all()
        # quats come back unit-normalised
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(res.quats), axis=-1), 1.0, atol=1e-5
        )

    def test_ssim_loss_mix(self):
        from da3slam_tpu.ops.splats import ssim

        rng = np.random.default_rng(8)
        a = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)), jnp.float32)
        assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
        noisy = jnp.clip(a + jnp.asarray(rng.normal(0, 0.2, a.shape), jnp.float32), 0, 1)
        assert float(ssim(a, noisy)) < 0.9
        # differentiable
        g = jax.grad(lambda x: ssim(x, a))(noisy)
        assert np.isfinite(np.asarray(g)).all()

    def test_densify_resamples_dead_splats(self):
        from da3slam_tpu.ops.splats import train_splats

        rng = np.random.default_rng(9)
        means, scales, quats, colors, opacity, K, E = make_scene(rng, G=30)
        # kill a third of the splats: sub-threshold opacity
        opacity = np.array(opacity)  # writable copy
        opacity[:10] = 1e-3
        opacity = jnp.asarray(opacity)
        img, _, _ = rasterize(means, scales, quats, colors, opacity, K, E, HW)
        res = train_splats(
            means, scales, quats, colors, opacity, img[None], K[None], E[None],
            HW, iters=8, max_per_tile=64, fan=9, densify_every=4,
            ssim_weight=0.0,
        )
        assert np.isfinite(np.asarray(res.points)).all()
        # the dead slots were resampled: opacity resurrected above the
        # prune threshold and positions moved to donor neighbourhoods
        op = np.asarray(res.opacity)[:10]
        assert (op > 0.02).all(), op
        moved = np.linalg.norm(np.asarray(res.points[:10] - means[:10]), axis=-1)
        assert moved.max() > 1e-3


class TestRenderCLI:
    def test_ply_roundtrip_and_render(self, tmp_path):
        """export_3dgs_ply → read_3dgs_ply → cli/render.py along an
        interpolated trajectory: activations survive the roundtrip and the
        rendered PNGs show the scene."""
        from da3slam_tpu.inout.export3d import export_3dgs_ply, read_3dgs_ply

        rng = np.random.default_rng(10)
        means, scales, quats, colors, opacity, K, E = make_scene(rng, G=30)
        ply = tmp_path / "scene.ply"
        export_3dgs_ply(ply, np.asarray(means), np.asarray(colors),
                        np.asarray(scales), np.asarray(opacity),
                        rotations=np.asarray(quats))
        gs = read_3dgs_ply(ply)
        np.testing.assert_allclose(gs["points"], np.asarray(means), atol=1e-5)
        np.testing.assert_allclose(gs["scales"], np.asarray(scales), rtol=1e-4)
        np.testing.assert_allclose(gs["opacity"], np.asarray(opacity), atol=1e-4)
        np.testing.assert_allclose(gs["colors"], np.asarray(colors), atol=1e-2)
        # quats stored sign-canonicalised; compare up to sign
        q0, q1 = gs["rotations"], np.asarray(quats)
        flip = np.sign(np.sum(q0 * q1, axis=-1, keepdims=True))
        np.testing.assert_allclose(q0 * flip, q1, atol=1e-4)

        # two c2w poses: identity and a small x-shift
        poses = np.stack([np.eye(4), np.eye(4)])
        poses[1, 0, 3] = 0.1
        pose_file = tmp_path / "camera_poses.txt"
        with open(pose_file, "w") as f:
            for T in poses:
                f.write(" ".join(f"{v:.8f}" for v in T.reshape(-1)) + "\n")
        intr = tmp_path / "intrinsic.txt"
        intr.write_text(f"{K[0, 0]} {K[1, 1]} {K[0, 2]} {K[1, 2]}\n")

        from da3slam_tpu.cli.render import main

        out = tmp_path / "frames"
        main([
            "--splats", str(ply), "--poses", str(pose_file),
            "--intrinsics", str(intr), "--output_dir", str(out),
            "--height", str(HW[0]), "--width", str(HW[1]),
            "--interp", "1", "--max_per_tile", "64",
        ])
        from PIL import Image

        files = sorted(out.glob("*.png"))
        assert len(files) == 3  # 2 poses + 1 interpolated
        img0 = np.asarray(Image.open(files[0]))
        assert img0.shape == (*HW, 3)
        assert img0.max() > 30  # splats actually rendered

        # frame 0 must match a direct rasterize of the same scene
        ref, _, _ = rasterize(
            jnp.asarray(gs["points"]), jnp.asarray(gs["scales"]),
            jnp.asarray(gs["rotations"]), jnp.asarray(gs["colors"]),
            jnp.asarray(gs["opacity"]), K, E, HW, max_per_tile=64,
        )
        ref8 = np.asarray(jnp.clip(ref, 0, 1) * 255).astype(np.uint8)
        assert np.mean(np.abs(ref8.astype(int) - img0.astype(int))) < 2.0
