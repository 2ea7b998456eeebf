import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from da3slam_tpu.preprocess import (
    preprocess_batch,
    adjust_brightness,
    crop_square,
    rgb_to_lab,
    lab_to_rgb,
    clahe,
)


class TestColorSpace:
    def test_lab_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        lab = rgb_to_lab(jnp.asarray(rgb))
        back = np.asarray(lab_to_rgb(lab)) * 255.0
        assert np.abs(back - rgb).max() < 2.0  # quantisation tolerance

    def test_gray_axis(self):
        """Neutral grays: a, b ≈ 128 (centred), L monotone in intensity."""
        grays = jnp.stack([jnp.full((4, 4, 3), v, jnp.uint8) for v in [0, 64, 128, 255]])
        lab = rgb_to_lab(grays)
        np.testing.assert_allclose(np.asarray(lab[..., 1]), 128.0, atol=1.0)
        np.testing.assert_allclose(np.asarray(lab[..., 2]), 128.0, atol=1.0)
        Ls = np.asarray(lab[:, 0, 0, 0])
        assert (np.diff(Ls) > 0).all()
        assert abs(Ls[-1] - 255.0) < 1.0  # white → L=255 (OpenCV scaling)


class TestCLAHE:
    def test_flat_image_unchanged_shape_and_range(self):
        out = clahe(jnp.full((64, 64), 100.0))
        assert out.shape == (64, 64)
        assert 0 <= float(out.min()) and float(out.max()) <= 255.0

    def test_increases_local_contrast(self):
        """A low-contrast gradient must spread toward the full range."""
        rng = np.random.default_rng(1)
        img = 100.0 + 20.0 * rng.random((64, 64)).astype(np.float32)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.std() > img.std() * 1.5

    def test_clip_limit_bounds_amplification(self):
        """Lower clip limit → less contrast amplification."""
        rng = np.random.default_rng(2)
        img = 120.0 + 5.0 * rng.random((64, 64)).astype(np.float32)
        hi = np.asarray(clahe(jnp.asarray(img), clip_limit=8.0)).std()
        lo = np.asarray(clahe(jnp.asarray(img), clip_limit=1.0)).std()
        assert lo < hi


class TestBrightness:
    def test_output_contract(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        out = np.asarray(adjust_brightness(jnp.asarray(img)))
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_darkens_overbright(self):
        img = np.full((64, 64, 3), 250, np.uint8)  # everything over-bright
        out = np.asarray(adjust_brightness(jnp.asarray(img)))
        assert out.mean() < img.mean()

    def test_brightens_dark_image(self):
        rng = np.random.default_rng(4)
        img = rng.integers(5, 40, (64, 64, 3)).astype(np.uint8)  # dark scene
        out = np.asarray(adjust_brightness(jnp.asarray(img)))
        assert out.astype(float).mean() > img.astype(float).mean()

    def test_reduces_brightness_spread_across_frames(self):
        """The point of the reference chain: frames of very different
        exposure end up closer together."""
        rng = np.random.default_rng(5)
        base = rng.random((64, 64, 3))
        dark = (base * 60).astype(np.uint8)
        bright = (base * 150 + 100).astype(np.uint8)
        od = np.asarray(adjust_brightness(jnp.asarray(dark))).mean()
        ob = np.asarray(adjust_brightness(jnp.asarray(bright))).mean()
        spread_before = bright.mean() - dark.mean()
        assert abs(ob - od) < spread_before * 0.6


class TestCrop:
    def test_uka1_geometry(self):
        """ratio 0.8, +20 x-offset (reference preprocess_crop.py:31-36)."""
        imgs = jnp.zeros((2, 100, 160, 3), jnp.uint8)
        out = crop_square(imgs, 0.8, 20)
        assert out.shape == (2, 80, 80, 3)

    def test_clamps_at_boundary(self):
        imgs = jnp.arange(2 * 50 * 60 * 3, dtype=jnp.uint8).reshape(2, 50, 60, 3)
        out = crop_square(imgs, 0.9, x_offset=1000)  # pushes past right edge
        assert out.shape == (2, 45, 45, 3)
        # clamped to the right edge: last column of crop = last column of image
        np.testing.assert_array_equal(np.asarray(out[0, :, -1]), np.asarray(imgs[0, 2:47, -1]))

    def test_crop_content_matches_numpy(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 255, (1, 100, 160, 3)).astype(np.uint8)
        out = np.asarray(crop_square(jnp.asarray(img), 0.8, 20))
        S = int(100 * 0.8)
        left = (160 - S) // 2 + 20
        top = int(100 * (1 - 0.8) / 2)  # = 9: same float expression as the
        # reference (preprocess_crop.py:40), where (1-0.8) is 0.19999...
        np.testing.assert_array_equal(out[0], img[0, top : top + S, left : left + S])


class TestFusedPipeline:
    def test_jits_and_shapes(self):
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 255, (4, 100, 160, 3)).astype(np.uint8)
        out = preprocess_batch(jnp.asarray(frames), out_hw=(56, 56))
        assert out.shape == (4, 56, 56, 3)
        assert out.dtype == jnp.float32  # ImageNet-normalised
        assert np.isfinite(np.asarray(out)).all()

    def test_unnormalized_mode(self):
        rng = np.random.default_rng(8)
        frames = rng.integers(0, 255, (2, 100, 160, 3)).astype(np.uint8)
        out = preprocess_batch(jnp.asarray(frames), out_hw=(56, 56), normalize=False)
        assert out.dtype == jnp.uint8


class TestHostCLIs:
    def test_crop_cli(self, tmp_path):
        from da3slam_tpu.cli.preprocess import main

        src = tmp_path / "in"
        src.mkdir()
        rng = np.random.default_rng(9)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (100, 160, 3)).astype(np.uint8)).save(
                src / f"{i}.png"
            )
        main(["crop", "--input", str(src), "--output", str(tmp_path / "out"),
              "--dataset", "uka1"])
        outs = sorted((tmp_path / "out").iterdir())
        assert len(outs) == 3
        assert outs[0].name.startswith("cropped_")
        assert Image.open(outs[0]).size == (80, 80)

    def test_brightness_cli(self, tmp_path):
        from da3slam_tpu.cli.preprocess import main

        src = tmp_path / "in"
        src.mkdir()
        rng = np.random.default_rng(10)
        for i in range(2):
            Image.fromarray(rng.integers(5, 60, (64, 64, 3)).astype(np.uint8)).save(
                src / f"{i}.png"
            )
        main(["brightness", "--input", str(src), "--output", str(tmp_path / "out")])
        outs = sorted((tmp_path / "out").iterdir())
        assert len(outs) == 2
        before = np.asarray(Image.open(src / "0.png")).mean()
        after = np.asarray(Image.open(outs[0])).mean()
        assert after > before  # dark input brightened

    def test_video2frame_gated_error(self, tmp_path):
        """Without an ffmpeg backend the CLI must fail with a clear message."""
        from da3slam_tpu.preprocess.host import video_to_frames

        fake = tmp_path / "v.mp4"
        fake.write_bytes(b"not a video")
        with pytest.raises(RuntimeError, match="ffmpeg|video"):
            video_to_frames(fake, tmp_path / "frames")


class TestTileHistograms:
    def test_matches_numpy_bincount(self):
        from da3slam_tpu.preprocess.device import _tile_histograms

        rng = np.random.default_rng(0)
        bins = rng.integers(0, 256, size=(4, 4, 999)).astype(np.int32)
        hist = np.asarray(_tile_histograms(jnp.asarray(bins), 256))
        ref = np.stack([
            np.stack([np.bincount(bins[i, j], minlength=256) for j in range(4)])
            for i in range(4)
        ]).astype(np.float32)
        np.testing.assert_array_equal(hist, ref)

    def test_degenerate_single_value(self):
        from da3slam_tpu.preprocess.device import _tile_histograms

        bins = jnp.full((2, 2, 50), 7, jnp.int32)
        hist = np.asarray(_tile_histograms(bins, 16))
        assert hist[0, 0, 7] == 50 and hist.sum() == 4 * 50
