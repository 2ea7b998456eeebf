import numpy as np
import pytest

from da3slam_tpu.viz.debug import get_distinct_color, apply_chunk_color_to_images_batch
from da3slam_tpu.viz.sky import sky_mask_heuristic, apply_sky_segmentation
from da3slam_tpu.utils import StageTimer


class TestChunkColors:
    def test_distinct_and_deterministic(self):
        colors = [get_distinct_color(i) for i in range(10)]
        assert len(set(colors)) == 10
        assert colors == [get_distinct_color(i) for i in range(10)]
        assert all(0 <= c <= 255 for rgb in colors for c in rgb)

    def test_tint(self):
        imgs = np.zeros((2, 8, 8, 3), np.uint8)
        out = apply_chunk_color_to_images_batch(imgs, 0, blend=1.0)
        assert (out[0, 0, 0] == np.asarray(get_distinct_color(0))).all()


class TestSkyMask:
    def make_scene(self):
        """Blue sky upper half, brown ground lower half."""
        img = np.zeros((40, 60, 3), np.uint8)
        img[:20] = [110, 160, 230]  # sky blue
        img[20:] = [120, 90, 50]  # ground
        return img

    def test_detects_sky_region(self):
        mask = sky_mask_heuristic(self.make_scene())
        assert mask[:18].mean() > 0.9
        assert mask[22:].mean() < 0.05

    def test_apply_zeroes_confidence(self):
        img = self.make_scene()
        conf = np.full((1, 40, 60), 2.0, np.float32)
        out = apply_sky_segmentation(conf, img[None])
        assert (out[0, :18] == 0).mean() > 0.9
        assert (out[0, 22:] == 2.0).all()

    def test_indoor_scene_mostly_unmasked(self):
        rng = np.random.default_rng(0)
        img = rng.integers(30, 120, (40, 60, 3)).astype(np.uint8)  # dark indoor
        mask = sky_mask_heuristic(img)
        assert mask.mean() < 0.1

    def test_dark_pixel_does_not_shadow_rows_below(self):
        """Regression: the old column-AND flood let a single non-sky pixel
        kill all sky beneath it; a proper connected-component flood grows
        laterally around it."""
        img = self.make_scene()
        img[5, 30] = [120, 90, 50]  # one dark pixel inside the sky
        mask = sky_mask_heuristic(img)
        assert not mask[5, 30]
        assert mask[6:18, 30].all()  # sky continues below via lateral runs
        assert mask[:18].mean() > 0.95

    def test_foreground_object_occludes_only_itself(self):
        """A dark tower through the sky: sky must persist on both sides and
        below its top, but the tower column itself stays unmasked."""
        img = self.make_scene()
        img[0:20, 20:24] = [60, 50, 40]  # dark tower from the top edge down
        mask = sky_mask_heuristic(img)
        assert not mask[:20, 20:24].any()
        assert mask[:18, :18].mean() > 0.95
        assert mask[:18, 26:].mean() > 0.95

    def test_sky_colored_region_not_connected_to_top_is_excluded(self):
        """A blue lake at the bottom is not top-connected → not sky."""
        img = self.make_scene()
        img[30:36, 10:50] = [110, 160, 230]  # lake, same color as sky
        mask = sky_mask_heuristic(img, horizon=1.0)
        assert not mask[30:36, 10:50].any()

    def test_onnx_path_missing_runtime_falls_back(self, capsys):
        img = self.make_scene()
        conf = np.full((1, 40, 60), 2.0, np.float32)
        out = apply_sky_segmentation(conf, img[None], onnx_model_path="/nonexistent.onnx")
        # heuristic fallback still zeroes the sky
        assert (out[0, :18] == 0).mean() > 0.9
        assert "using heuristic" in capsys.readouterr().out


class TestStageTimer:
    def test_accumulates_and_reports(self):
        import time

        t = StageTimer(sync=False)
        for _ in range(3):
            with t("work"):
                time.sleep(0.01)
        with t("other"):
            pass
        assert t.counts["work"] == 3
        assert t.totals["work"] >= 0.03
        rep = t.report()
        assert "work" in rep and "other" in rep
        t.reset()
        assert not t.totals


class TestOrbaxCheckpoint:
    @pytest.mark.slow
    def test_train_state_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from da3slam_tpu.models.config import get_preset
        from da3slam_tpu.parallel import make_mesh, make_train_step, synthetic_batch
        from da3slam_tpu.parallel.checkpoint import save_train_state, restore_train_state

        cfg = get_preset("tiny")
        mesh = make_mesh(1)
        init_fn, step_fn, place_batch = make_train_step(cfg, mesh)
        state = init_fn(seed=0)
        state, _ = step_fn(state, place_batch(synthetic_batch(cfg, 1, 2, (28, 28))))

        save_train_state(tmp_path / "ckpt", state)
        template = init_fn(seed=1)
        restored = restore_train_state(tmp_path / "ckpt", template)
        assert int(restored.step) == int(state.step) == 1
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBatchViewer:
    def test_prediction_adapter(self):
        from da3slam_tpu.models.da3 import Prediction
        from da3slam_tpu.viz.batch_viewer import prediction_to_viewer_dict

        pred = Prediction(
            processed_images=np.zeros((2, 8, 8, 3), np.uint8),
            depth=np.ones((2, 8, 8), np.float32),
            conf=np.ones((2, 8, 8), np.float32),
            extrinsics=np.tile(np.eye(4, dtype=np.float32)[:3], (2, 1, 1)),
            intrinsics=np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        )
        d = prediction_to_viewer_dict(pred)
        assert set(d) == {"images", "depth", "conf", "extrinsics", "intrinsics"}
        # global extrinsics override
        g = pred.extrinsics.copy()
        g[:, 0, 3] = 7.0
        d2 = prediction_to_viewer_dict(pred, g)
        assert (d2["extrinsics"][:, 0, 3] == 7.0).all()

    def test_show_prediction_headless(self):
        from da3slam_tpu.models.da3 import Prediction
        from da3slam_tpu.viz.batch_viewer import show_prediction

        pred = Prediction(
            processed_images=np.zeros((1, 8, 8, 3), np.uint8),
            depth=np.ones((1, 8, 8), np.float32),
            conf=np.ones((1, 8, 8), np.float32),
            extrinsics=np.eye(4, dtype=np.float32)[None, :3],
            intrinsics=np.eye(3, dtype=np.float32)[None],
        )
        assert show_prediction(pred) is None  # viser absent → headless


class TestTrackNormalization:
    def test_roundtrip(self):
        import jax.numpy as jnp

        from da3slam_tpu.core.geometry import (
            denormalize_pixel_tracks,
            normalize_pixel_tracks,
        )

        rng = np.random.default_rng(0)
        tracks = jnp.asarray(rng.uniform(0, 63, (10, 5, 2)), jnp.float32)
        for mode in ("minus_one_to_one", "zero_to_one"):
            n = normalize_pixel_tracks(tracks, (48, 64), mode)
            back = denormalize_pixel_tracks(n, (48, 64), mode)
            np.testing.assert_allclose(np.asarray(back), np.asarray(tracks), atol=1e-4)
        # corners map to the range ends
        corners = jnp.asarray([[0.0, 0.0], [63.0, 47.0]])
        n = normalize_pixel_tracks(corners, (48, 64))
        np.testing.assert_allclose(np.asarray(n), [[-1, -1], [1, 1]], atol=1e-6)
