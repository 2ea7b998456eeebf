"""TSDF fusion (ops/tsdf.py) + marching-tetrahedra meshing (inout/mesh.py)."""

import numpy as np
import pytest

from da3slam_tpu.inout.mesh import (
    marching_tetrahedra,
    read_mesh_ply,
    tsdf_to_mesh,
    write_mesh_ply,
)
from da3slam_tpu.ops.tsdf import (
    fuse_frames,
    grid_from_bounds,
    integrate,
    integrate_frames,
    make_grid,
)


def sphere_sdf(n=40, R=None):
    R = n / 3 if R is None else R
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1).astype(np.float32)
    c = np.array([n / 2] * 3, np.float32)
    return np.linalg.norm(g - c, axis=-1) - R, c, R


class TestMarchingTetrahedra:
    def test_sphere_surface_accuracy(self):
        sdf, c, R = sphere_sdf(40)
        verts, faces = marching_tetrahedra(sdf)
        assert len(verts) > 500 and len(faces) > 1000
        r = np.linalg.norm(verts - c, axis=-1)
        assert np.abs(r - R).max() < 0.3  # sub-voxel everywhere
        assert np.abs(r - R).mean() < 0.05

    def test_watertight_and_oriented(self):
        """Outward winding + closed surface: the signed volume of the
        triangle fan must equal the sphere volume."""
        sdf, c, R = sphere_sdf(40)
        verts, faces = marching_tetrahedra(sdf)
        v = verts[faces] - c  # divergence theorem about the center
        vol = np.sum(np.einsum("ij,ij->i", v[:, 0], np.cross(v[:, 1], v[:, 2]))) / 6.0
        assert 0.95 < vol / (4 / 3 * np.pi * R**3) < 1.05

    def test_origin_and_voxel_scaling(self):
        sdf, c, R = sphere_sdf(32)
        verts, _ = marching_tetrahedra(sdf, origin=(1.0, 2.0, 3.0), voxel=0.5)
        r = np.linalg.norm(verts - (c * 0.5 + [1, 2, 3]), axis=-1)
        np.testing.assert_allclose(r, R * 0.5, atol=0.2)

    def test_mask_suppresses_unobserved(self):
        sdf, c, R = sphere_sdf(32)
        mask = np.zeros(sdf.shape, bool)
        mask[: sdf.shape[0] // 2] = True  # only half the volume observed
        verts, _ = marching_tetrahedra(sdf, mask=mask)
        assert len(verts) > 0
        assert verts[:, 0].max() <= sdf.shape[0] // 2  # nothing in masked half

    def test_empty_when_no_crossing(self):
        verts, faces = marching_tetrahedra(np.ones((8, 8, 8), np.float32))
        assert len(verts) == 0 and len(faces) == 0

    def test_mesh_ply_roundtrip(self, tmp_path):
        sdf, _, _ = sphere_sdf(24)
        verts, faces = marching_tetrahedra(sdf)
        write_mesh_ply(tmp_path / "m.ply", verts, faces,
                       colors=np.full((len(verts), 3), 128, np.uint8))
        v2, f2 = read_mesh_ply(tmp_path / "m.ply")
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)


class TestTSDFIntegrate:
    def _plane_frame(self, d=2.0, hw=(32, 40)):
        H, W = hw
        depth = np.full((H, W), d, np.float32)
        conf = np.ones((H, W), np.float32)
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)[:3]
        return depth, conf, K, E

    def test_zero_crossing_at_plane(self):
        depth, conf, K, E = self._plane_frame(d=2.0)
        # grid straddling the plane along +z, in front of the camera center
        grid = make_grid((-0.2, -0.2, 1.5), (8, 8, 24), voxel=0.05)
        grid = integrate(grid, depth, conf, K, E)
        s = np.asarray(grid.sdf)
        w = np.asarray(grid.weight)
        zs = np.asarray(grid.origin)[2] + np.arange(24) * 0.05
        col = s[4, 4, :]  # central column marches along +z
        assert (w[4, 4, :] > 0).any()
        # sign change brackets z = 2.0
        before = col[zs < 1.9]
        after_idx = (zs > 2.05) & (zs < 2.0 + 3 * 0.05)  # within truncation
        assert (before > 0).all()
        assert (col[after_idx] < 0).all()

    def test_occluded_voxels_not_updated(self):
        depth, conf, K, E = self._plane_frame(d=2.0)
        grid = make_grid((-0.1, -0.1, 2.5), (4, 4, 8), voxel=0.1)  # far behind
        grid = integrate(grid, depth, conf, K, E)
        # all voxels are > trunc behind the surface: untouched free-space init
        np.testing.assert_array_equal(np.asarray(grid.weight), 0.0)
        np.testing.assert_array_equal(np.asarray(grid.sdf), 1.0)

    def test_weight_accumulates_and_caps(self):
        depth, conf, K, E = self._plane_frame()
        grid = make_grid((-0.2, -0.2, 1.5), (8, 8, 16), voxel=0.05)
        stack = lambda a, n: np.repeat(a[None], n, axis=0)  # noqa: E731
        fused = integrate_frames(
            grid, stack(depth, 5), stack(conf, 5), stack(K, 5), stack(E, 5),
            max_weight=3.0,
        )
        w = np.asarray(fused.weight)
        assert w.max() <= 3.0 + 1e-6
        assert w.max() == pytest.approx(3.0)

    def test_fuse_pipeline_output_dedups_window_overlap(self):
        """With window_idx given, duplicated overlap slots contribute zero
        weight: fusing [C=2, N=3] windows sharing one frame must equal
        fusing the 5 unique frames once each."""
        from types import SimpleNamespace

        from da3slam_tpu.ops.tsdf import fuse_frames, fuse_pipeline_output

        depth, conf, K, E = self._plane_frame(d=2.0)
        # identical depths (so the bounds estimate is composition-invariant
        # and both fusions share one grid); per-frame confs make the fused
        # weights sensitive to the duplicated slot
        depths = np.repeat(depth[None], 5, 0)
        confs = np.stack([conf * (1.0 + 0.1 * i) for i in range(5)]) + 1.0
        Ks = np.repeat(K[None], 5, 0)
        Es = np.repeat(E[None], 5, 0)
        window_idx = np.array([[0, 1, 2], [2, 3, 4]])  # frame 2 duplicated

        out = SimpleNamespace(
            depth=depths[window_idx.reshape(-1)].reshape(2, 3, *depth.shape),
            conf=confs[window_idx.reshape(-1)].reshape(2, 3, *conf.shape),
            intrinsics=Ks[window_idx.reshape(-1)].reshape(2, 3, 3, 3),
            extrinsics_global=Es[window_idx.reshape(-1)].reshape(2, 3, 3, 4),
        )
        fused = fuse_pipeline_output(out, resolution=24, window_idx=window_idx)
        oracle = fuse_frames(depths, confs, Ks, Es, resolution=24)
        np.testing.assert_allclose(
            np.asarray(fused.sdf), np.asarray(oracle.sdf), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused.weight), np.asarray(oracle.weight), atol=1e-5
        )
        # without window_idx the duplicate frame double-weights its surface
        doubled = fuse_pipeline_output(out, resolution=24)
        assert not np.allclose(
            np.asarray(doubled.weight), np.asarray(oracle.weight), atol=1e-5
        )

    def test_fuse_frames_and_mesh_recovers_plane(self):
        """Multi-view fusion of an analytic plane → mesh on that plane."""
        hw = (32, 40)
        K = np.array([[40.0, 0, 20], [0, 40.0, 16], [0, 0, 1]], np.float32)
        frames = []
        for dx in (-0.1, 0.0, 0.1):
            E = np.eye(4, dtype=np.float32)[:3]
            E[0, 3] = dx  # w2c translation: camera at -dx
            H, W = hw
            v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            depth = np.full(hw, 2.0, np.float32)  # plane z=2 in WORLD; with
            # pure x-translation the w2c depth of the plane stays 2.0
            frames.append((depth, E))
        depth = np.stack([f[0] for f in frames])
        E = np.stack([f[1] for f in frames])
        conf = np.full(depth.shape, 2.0, np.float32)
        Ks = np.repeat(K[None], 3, axis=0)
        grid = fuse_frames(depth, conf, Ks, E, resolution=48, conf_floor=1.0)
        verts, faces = tsdf_to_mesh(grid)
        assert len(verts) > 100
        np.testing.assert_allclose(verts[:, 2], 2.0, atol=0.1)

    def test_corner_room_world(self):
        """TSDF of the synthetic corner-room ground truth meshes onto the
        room's walls (the same oracle the SLAM e2e tests use)."""
        from da3slam_tpu.utils.synthetic import (
            default_intrinsics, make_trajectory, render_depth,
        )

        hw = (40, 48)
        K = default_intrinsics(hw)
        poses = make_trajectory(6)
        depth = np.stack([render_depth(E, K, hw) for E in poses])
        conf = np.full(depth.shape, 2.0, np.float32)
        Ks = np.repeat(K[None], 6, axis=0).astype(np.float32)
        grid = fuse_frames(depth, conf, Ks, poses.astype(np.float32),
                           resolution=64)
        verts, faces = tsdf_to_mesh(grid)
        assert len(verts) > 500
        # every mesh vertex lies near one of the room planes
        from da3slam_tpu.utils.synthetic import PLANES

        dists = np.min(
            np.stack([np.abs(verts @ np.asarray(n) - c) for n, c in PLANES]),
            axis=0,
        )
        voxel = float(grid.voxel)
        assert np.quantile(dists, 0.95) < 1.5 * voxel


class TestSparseFusion:
    """Block-sparse band-only fusion (ops/tsdf.py integrate_frames_sparse):
    the dense ``integrate(band_only=True)`` sequence is the exact oracle."""

    def _frames(self, n=4, hw=(32, 40)):
        from da3slam_tpu.utils.synthetic import (
            default_intrinsics, make_trajectory, render_depth,
        )

        K = default_intrinsics(hw)
        poses = make_trajectory(n)
        depth = np.stack([render_depth(E, K, hw) for E in poses])
        rng = np.random.default_rng(7)
        conf = 1.0 + rng.random(depth.shape).astype(np.float32)
        Ks = np.repeat(K[None], n, axis=0).astype(np.float32)
        return depth, conf, Ks, poses.astype(np.float32)

    def _dense_band_oracle(self, grid, depth, conf, Ks, E):
        from da3slam_tpu.ops.tsdf import integrate

        for i in range(len(depth)):
            grid = integrate(grid, depth[i], conf[i], Ks[i], E[i],
                             band_only=True)
        return grid

    def test_matches_band_only_dense(self):
        """Bit-level agreement with the sequential dense band-only oracle,
        for both the trivial and the frame-batched step layout (batching
        shares one gather dispatch but must keep per-frame semantics)."""
        from da3slam_tpu.ops.tsdf import integrate_frames_sparse, make_grid

        depth, conf, Ks, E = self._frames()
        grid = make_grid((-0.9, -0.9, 0.4), (20, 20, 24), voxel=0.14)
        oracle = self._dense_band_oracle(grid, depth, conf, Ks, E)
        for batch in (1, 4):
            fused, counts = integrate_frames_sparse(
                grid, depth, conf, Ks, E, batch=batch)
            np.testing.assert_allclose(
                np.asarray(fused.sdf), np.asarray(oracle.sdf), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(fused.weight), np.asarray(oracle.weight),
                atol=1e-5)
            assert counts.shape == (len(depth),) and (counts > 0).all()

    def test_rounding_margin_at_tile_boundary(self):
        """Regression (round-4 review): the activity footprint must include
        the 0.5-px nearest-pixel rounding margin.  Voxels whose continuous
        projection stays inside one 16-px depth tile but whose round()ed
        sample pixel crosses into the next tile were silently dropped —
        here the left tile reads far depth (inactive by the band test)
        while the rounded pixel reads the near surface."""
        from da3slam_tpu.ops.tsdf import integrate, integrate_frames_sparse

        H = W = 64
        depth = np.full((H, W), 10.0, np.float32)
        depth[:, 32:] = 2.0  # discontinuity exactly at the tile boundary
        conf = np.ones((H, W), np.float32)
        K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)[:3]

        # bs=4 block whose centers project to u ∈ [31.5, 32): continuous u
        # stays in the left tile, round(u) = 32 samples the right one
        grid = make_grid((-0.014, -0.256, 1.9955), (4, 4, 4), voxel=0.003)
        oracle = integrate(grid, depth, conf, K, E, band_only=True)
        n_dense = int((np.asarray(oracle.weight) > 0).sum())
        assert n_dense > 0, "repro setup must place voxels in the band"

        fused, counts = integrate_frames_sparse(
            grid, depth[None], conf[None], K[None], E[None])
        assert int(counts[0]) > 0
        np.testing.assert_allclose(np.asarray(fused.sdf),
                                   np.asarray(oracle.sdf), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fused.weight),
                                   np.asarray(oracle.weight), atol=1e-6)

    def test_empty_frame_stack_is_noop(self):
        """Regression (round-4 review): a zero-frame stack must return the
        grid unchanged (auto-size budget used to crash on counts.max())."""
        from da3slam_tpu.ops.tsdf import integrate_frames_sparse

        grid = make_grid((0, 0, 0), (8, 8, 8), voxel=0.1)
        fused, counts = integrate_frames_sparse(
            grid,
            np.zeros((0, 16, 16), np.float32),
            np.zeros((0, 16, 16), np.float32),
            np.zeros((0, 3, 3), np.float32),
            np.zeros((0, 3, 4), np.float32),
        )
        assert counts.shape == (0,)
        np.testing.assert_array_equal(np.asarray(fused.sdf), np.asarray(grid.sdf))
        np.testing.assert_array_equal(np.asarray(fused.weight),
                                      np.asarray(grid.weight))

    def test_band_only_skips_far_free_space(self):
        """Voxels far in front of the surface stay untouched (w=0, sdf=+1)
        while dense would have written free-space weight there."""
        from da3slam_tpu.ops.tsdf import (
            integrate, integrate_frames_sparse, make_grid,
        )

        H, W = 24, 32
        depth = np.full((H, W), 3.0, np.float32)
        conf = np.ones((H, W), np.float32)
        K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)[:3]
        # grid well in FRONT of the plane (z in [0.5, 1.6]): all free space
        grid = make_grid((-0.3, -0.3, 0.5), (8, 8, 10), voxel=0.11)
        sp, counts = integrate_frames_sparse(
            grid, depth[None], conf[None], K[None], E[None])
        np.testing.assert_array_equal(np.asarray(sp.weight), 0.0)
        np.testing.assert_array_equal(np.asarray(sp.sdf), 1.0)
        dense = integrate(grid, depth, conf, K, E)  # NOT band-only
        assert (np.asarray(dense.weight) > 0).any()

    def test_budget_overflow_warns(self):
        """An explicit too-small block budget drops observations and
        fuse_frames warns; auto sizing (default) never does."""
        import warnings

        from da3slam_tpu.ops.tsdf import fuse_frames

        depth, conf, Ks, E = self._frames()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            fuse_frames(depth, conf, Ks, E, resolution=24, sparse=True,
                        active_blocks=2)
        assert any("exceed the budget" in str(w.message) for w in rec)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            fuse_frames(depth, conf, Ks, E, resolution=24, sparse=True)
        assert not rec

    def test_colored_matches_dense(self):
        """Color accumulators agree with the dense band-only oracle."""
        from da3slam_tpu.ops.tsdf import (
            integrate, integrate_frames_sparse, make_grid,
        )
        from da3slam_tpu.utils.synthetic import (
            default_intrinsics, make_trajectory, render_depth, render_rgb,
        )

        hw = (32, 40)
        K = default_intrinsics(hw)
        poses = make_trajectory(3).astype(np.float32)
        depth = np.stack([render_depth(E, K, hw) for E in poses])
        imgs = np.stack([render_rgb(E, K, hw) for E in poses]).astype(
            np.float32)
        conf = np.ones(depth.shape, np.float32)
        Ks = np.repeat(K[None], 3, axis=0).astype(np.float32)
        grid = make_grid((-0.9, -0.9, 0.4), (16, 16, 20), voxel=0.17,
                         with_color=True)
        oracle = grid
        for i in range(3):
            oracle = integrate(oracle, depth[i], conf[i], Ks[i], poses[i],
                               band_only=True, image=imgs[i])
        fused, _ = integrate_frames_sparse(
            grid, depth, conf, Ks, poses, images=imgs)
        np.testing.assert_allclose(
            np.asarray(fused.color), np.asarray(oracle.color), atol=1e-3)

    def test_box_orbit_mesh_on_walls(self):
        """Sparse fusion of an orbit inside the closed box world meshes
        onto the box walls (the full-3D-extent scene the bench fuses)."""
        from da3slam_tpu.ops.tsdf import fuse_frames
        from da3slam_tpu.utils.synthetic import (
            BOX_PLANES, default_intrinsics, make_orbit_trajectory,
            render_depth,
        )

        hw = (32, 40)
        K = default_intrinsics(hw)
        poses = make_orbit_trajectory(8)
        depth = np.stack(
            [render_depth(E, K, hw, planes=BOX_PLANES) for E in poses])
        conf = np.full(depth.shape, 2.0, np.float32)
        Ks = np.repeat(K[None], 8, axis=0).astype(np.float32)
        grid = fuse_frames(depth, conf, Ks, poses.astype(np.float32),
                           resolution=40, sparse=True)
        verts, faces = tsdf_to_mesh(grid)
        assert len(verts) > 300
        dists = np.min(
            np.stack([np.abs(verts @ np.asarray(n) - c)
                      for n, c in BOX_PLANES]),
            axis=0,
        )
        assert np.quantile(dists, 0.95) < 1.5 * float(grid.voxel)


class TestSparseCarving:
    """Free-space carving for the block-sparse path (VERDICT r4 #8):
    ``carve=True`` recovers the dense ``band_only=False`` semantics on
    every selected block, so spurious early surfaces that later frames
    contradict get erased instead of persisting forever."""

    def test_carve_erases_spurious_blob(self):
        """A wrong near surface seen once, then contradicted by many far
        observations: band-only keeps the blob's zero crossing (its voxels
        are out-of-band for every later frame); carve erases it."""
        from da3slam_tpu.ops.tsdf import integrate_frames_sparse, make_grid

        H, W, n = 32, 32, 6
        K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)[:3]
        far = np.full((H, W), 3.0, np.float32)
        blob = far.copy()
        blob[12:20, 12:20] = 1.0  # spurious near surface, one frame only
        depth = np.stack([blob] + [far] * (n - 1))
        conf = np.ones(depth.shape, np.float32)
        Ks = np.repeat(K[None], n, axis=0)
        Es = np.repeat(E[None], n, axis=0)
        # grid brackets the blob depth (z in [0.8, 1.3]), well in front of
        # the true surface at 3.0
        grid = make_grid((-0.25, -0.25, 0.8), (10, 10, 10), voxel=0.05)

        band, _ = integrate_frames_sparse(grid, depth, conf, Ks, Es, batch=1)
        carved, _ = integrate_frames_sparse(grid, depth, conf, Ks, Es,
                                            batch=1, carve=True)
        band_sdf = np.asarray(band.sdf)[np.asarray(band.weight) > 0]
        assert band_sdf.min() < -0.5, "setup must write a blob crossing"
        carved_sdf = np.asarray(carved.sdf)
        carved_w = np.asarray(carved.weight)
        # the blob's behind-surface voxels were occluded in frame 1
        # (sdf_obs < -1) and stay untouched; every voxel the blob DID
        # write gets n-1 free-space +1 observations → no zero crossing
        assert carved_sdf[carved_w > 0].min() > 0.25
        # …and the free-space votes dominate the weight
        assert carved_w.max() > np.asarray(band.weight).max()

    def test_carve_matches_full_dense_on_static_scene(self):
        """Static plane, repeated views: every block's activity status is
        constant across frames, so carve matches the dense
        ``band_only=False`` oracle exactly — sdf everywhere, weight on
        every block the sparse path touched (never-touched blocks skip
        only the value-neutral free-space weight prior)."""
        from da3slam_tpu.ops.tsdf import (
            integrate, integrate_frames_sparse, make_grid,
        )

        H, W, n = 24, 32, 3
        K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)[:3]
        depth = np.full((n, H, W), 2.0, np.float32)
        rng = np.random.default_rng(3)
        conf = 1.0 + rng.random(depth.shape).astype(np.float32)
        Ks = np.repeat(K[None], n, axis=0)
        Es = np.repeat(E[None], n, axis=0)
        # grid spans free space AND the band around z=2.0
        grid = make_grid((-0.4, -0.4, 0.9), (12, 12, 20), voxel=0.07)

        oracle = grid
        for i in range(n):
            oracle = integrate(oracle, depth[i], conf[i], Ks[i], Es[i])
        for batch in (1, 3):
            fused, counts = integrate_frames_sparse(
                grid, depth, conf, Ks, Es, batch=batch, carve=True)
            w = np.asarray(fused.weight)
            np.testing.assert_allclose(np.asarray(fused.sdf),
                                       np.asarray(oracle.sdf), atol=1e-5)
            np.testing.assert_allclose(
                w[w > 0], np.asarray(oracle.weight)[w > 0], atol=1e-5)
            # untouched voxels: pristine free space on both sides
            np.testing.assert_array_equal(np.asarray(fused.sdf)[w == 0], 1.0)
            assert (counts > 0).all()

    def test_carve_defaults_off_and_band_unchanged(self):
        """carve=False (the default) keeps the exact band-only semantics —
        the blob scene's crossing persists."""
        from da3slam_tpu.ops.tsdf import fuse_frames

        H, W, n = 24, 24, 4
        K = np.array([[30.0, 0, 12], [0, 30.0, 12], [0, 0, 1]], np.float32)
        far = np.full((H, W), 3.0, np.float32)
        blob = far.copy()
        # large blob: must survive estimate_bounds' 1% point quantile so
        # the auto-sized grid actually contains it
        blob[4:20, 4:20] = 1.2
        depth = np.stack([blob] + [far] * (n - 1))
        conf = np.ones(depth.shape, np.float32)
        Ks = np.repeat(K[None], n, axis=0)
        Es = np.repeat(np.eye(4, dtype=np.float32)[:3][None], n, axis=0)
        g_band = fuse_frames(depth, conf, Ks, Es, resolution=32, sparse=True,
                             conf_floor=0.0, batch=1)
        g_carve = fuse_frames(depth, conf, Ks, Es, resolution=32, sparse=True,
                              conf_floor=0.0, carve=True, batch=1)
        sb = np.asarray(g_band.sdf)[np.asarray(g_band.weight) > 0]
        sc = np.asarray(g_carve.sdf)[np.asarray(g_carve.weight) > 0]
        assert sb.min() < 0.0 and sc.min() > sb.min()


class TestGridFromBounds:
    def test_longest_axis_resolution(self):
        g = grid_from_bounds((0, 0, 0), (2.0, 1.0, 0.5), resolution=100)
        assert g.sdf.shape[0] == 100
        assert g.sdf.shape[1] == 50
        assert abs(float(g.voxel) - 0.02) < 1e-6


class TestMainMeshCLI:
    def test_end_to_end(self, tmp_path, monkeypatch):
        """Full CLI flow against the contract-fake model on the synthetic
        corner-room world (random-init weights produce no coherent surface
        for a TSDF by construction): mesh lands on the room planes."""
        import da3slam_tpu.models as models
        from da3slam_tpu.cli.main_mesh import main
        from da3slam_tpu.inout.mesh import read_mesh_ply
        from da3slam_tpu.utils.synthetic import (
            PLANES, SyntheticDA3, make_synthetic_image_dir, make_trajectory,
        )

        poses = make_trajectory(9)
        fake = SyntheticDA3(poses, chunk_scales=[1.3, 0.8, 1.1])
        monkeypatch.setattr(
            models.DepthAnything3, "from_pretrained",
            classmethod(lambda cls, *a, **k: fake),
        )
        d = make_synthetic_image_dir(tmp_path, 9)
        out = tmp_path / "mesh.ply"
        main([
            "--image_dir", str(d), "--model", "tiny", "--chunk_size", "4",
            "--resolution", "64", "--conf_floor", "1.0", "--output", str(out),
        ])
        verts, faces = read_mesh_ply(out)
        assert len(verts) > 200 and len(faces) > 200
        assert np.isfinite(verts).all()
        assert faces.max() < len(verts)
        # the chunk-scale ambiguity is resolved by the aligner; the fused
        # mesh must sit on the (chunk-0-scaled) room planes
        s0 = 1.3
        dists = np.min(
            np.stack([np.abs(verts @ np.asarray(n) - c * s0) for n, c in PLANES]),
            axis=0,
        )
        assert np.quantile(dists, 0.9) < 0.15


class TestColorFusion:
    def test_colored_plane(self):
        """Color accumulates only near the surface with its own weight sum
        (a voxel seen in free space first must not bias toward black)."""
        hw = (32, 40)
        H, W = hw
        K = np.array([[40.0, 0, 20], [0, 40.0, 16], [0, 0, 1]], np.float32)
        E = np.eye(4, dtype=np.float32)[:3]
        depth = np.full(hw, 2.0, np.float32)
        conf = np.full(hw, 2.0, np.float32)
        # left half red, right half green
        img = np.zeros((*hw, 3), np.float32)
        img[:, : W // 2, 0] = 200.0
        img[:, W // 2 :, 1] = 200.0

        from da3slam_tpu.ops.tsdf import vertex_colors

        grid = fuse_frames(
            depth[None], conf[None], K[None], E[None],
            resolution=48, images=img[None],
        )
        verts, faces = tsdf_to_mesh(grid)
        assert len(verts) > 50
        cols = vertex_colors(grid, verts)
        # vertices left of the camera axis are red-ish, right are green-ish
        left = verts[:, 0] < -0.05
        right = verts[:, 0] > 0.05
        assert (cols[left, 0] > 120).mean() > 0.9
        assert (cols[right, 1] > 120).mean() > 0.9

    def test_mesh_cli_color_flag(self, tmp_path, monkeypatch):
        import da3slam_tpu.models as models
        from da3slam_tpu.cli.main_mesh import main
        from da3slam_tpu.inout.mesh import read_mesh_ply
        from da3slam_tpu.utils.synthetic import (
            SyntheticDA3, make_synthetic_image_dir, make_trajectory,
        )

        poses = make_trajectory(5)
        fake = SyntheticDA3(poses, textured=True)
        monkeypatch.setattr(
            models.DepthAnything3, "from_pretrained",
            classmethod(lambda cls, *a, **k: fake),
        )
        d = make_synthetic_image_dir(tmp_path, 5)
        out = tmp_path / "mesh.ply"
        main([
            "--image_dir", str(d), "--chunk_size", "5",
            "--resolution", "48", "--output", str(out), "--color",
        ])
        verts, faces, cols = read_mesh_ply(out, with_colors=True)
        assert cols is not None and cols.shape == (len(verts), 3)
        assert cols.std() > 1.0  # textured world → non-constant colors


class TestVertexNormals:
    def test_sphere_normals_radial(self, tmp_path):
        """SDF-gradient normals of a sphere point radially outward; they
        roundtrip through the mesh PLY together with colors."""
        from da3slam_tpu.inout.mesh import tsdf_vertex_normals
        from da3slam_tpu.ops.tsdf import make_grid

        sdf, c, R = sphere_sdf(40)
        verts, faces = marching_tetrahedra(sdf)
        grid = make_grid((0, 0, 0), sdf.shape, voxel=1.0)._replace(
            sdf=__import__("jax.numpy", fromlist=["asarray"]).asarray(sdf)
        )
        normals = tsdf_vertex_normals(grid, verts)
        np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0,
                                   atol=1e-5)
        radial = (verts - c) / np.linalg.norm(verts - c, axis=-1, keepdims=True)
        cosang = np.sum(normals * radial, axis=-1)
        assert np.quantile(cosang, 0.05) > 0.95  # outward, near-radial

        write_mesh_ply(tmp_path / "m.ply", verts, faces,
                       colors=np.full((len(verts), 3), 99, np.uint8),
                       normals=normals)
        v2, f2, c2 = read_mesh_ply(tmp_path / "m.ply", with_colors=True)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(c2, 99)
