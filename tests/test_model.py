import numpy as np
import jax
import jax.numpy as jnp
import pytest

from da3slam_tpu.models import DepthAnything3, get_preset, PRESETS
from da3slam_tpu.models.da3 import forward_fn, init_params
from da3slam_tpu.ops.resize import upper_bound_shape, resize_normalize, denormalize_to_uint8


TINY = get_preset("tiny")


@pytest.fixture(scope="module")
def tiny_model():
    return DepthAnything3.from_pretrained("tiny")


def random_images(n=3, h=56, w=70, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(n, h, w, 3), dtype=np.uint8)


class TestUpperBoundShape:
    def test_snaps_to_patch_multiples(self):
        th, tw = upper_bound_shape(518, 518, 504, 14)
        assert th % 14 == 0 and tw % 14 == 0
        assert max(th, tw) == 504

    def test_aspect_preserved_landscape(self):
        th, tw = upper_bound_shape(480, 640, 504, 14)
        assert tw == 504
        assert abs(th / tw - 480 / 640) < 0.05

    def test_upscales_small(self):
        th, tw = upper_bound_shape(100, 100, 504, 14)
        assert max(th, tw) == 504


class TestNormalize:
    def test_roundtrip_uint8(self):
        imgs = random_images(2, 28, 28)
        norm = resize_normalize(jnp.asarray(imgs), (28, 28))
        back = np.asarray(denormalize_to_uint8(norm))
        np.testing.assert_array_equal(back, imgs)


class TestForward:
    def test_output_contract(self, tiny_model):
        """The §2.5 tensor contract: shapes, positivity, conf>=1, ref=identity."""
        imgs = random_images(3)
        pred = tiny_model.inference(image=imgs, process_res=56)
        n, h, w = pred.depth.shape
        assert n == 3
        assert pred.processed_images.shape == (n, h, w, 3)
        assert pred.processed_images.dtype == np.uint8
        assert pred.conf.shape == (n, h, w)
        assert pred.extrinsics.shape == (n, 3, 4)
        assert pred.intrinsics.shape == (n, 3, 3)
        assert (pred.depth > 0).all()
        assert (pred.conf >= 1.0).all()
        # reference view anchors the chunk frame
        np.testing.assert_allclose(pred.extrinsics[0], np.eye(4)[:3], atol=1e-5)
        # rotations are orthonormal
        for E in pred.extrinsics:
            np.testing.assert_allclose(E[:3, :3] @ E[:3, :3].T, np.eye(3), atol=1e-5)
        # zero-skew pinhole intrinsics
        K = pred.intrinsics
        assert (K[:, 0, 1] == 0).all() and (K[:, 2, 2] == 1).all()
        assert (K[:, 0, 0] > 0).all() and (K[:, 1, 1] > 0).all()

    def test_middle_ref_view(self, tiny_model):
        imgs = random_images(5)
        pred = tiny_model.inference(image=imgs, process_res=42, ref_view_strategy="middle")
        np.testing.assert_allclose(pred.extrinsics[2], np.eye(4)[:3], atol=1e-5)

    def test_deterministic(self, tiny_model):
        imgs = random_images(2)
        p1 = tiny_model.inference(image=imgs, process_res=42)
        p2 = tiny_model.inference(image=imgs, process_res=42)
        np.testing.assert_array_equal(p1.depth, p2.depth)

    def test_depth_depends_on_input(self, tiny_model):
        p1 = tiny_model.inference(image=random_images(2, seed=1), process_res=42)
        p2 = tiny_model.inference(image=random_images(2, seed=2), process_res=42)
        assert np.abs(p1.depth - p2.depth).max() > 0

    def test_cross_view_coupling(self, tiny_model):
        """Changing view B must change view A's depth (cross-view attention)."""
        imgs = random_images(2, seed=3)
        other = random_images(2, seed=4)
        p1 = tiny_model.inference(image=imgs, process_res=42)
        mixed = np.stack([imgs[0], other[1]])
        p2 = tiny_model.inference(image=mixed, process_res=42)
        assert np.abs(p1.depth[0] - p2.depth[0]).max() > 1e-7

    def test_extrinsics_conditioning(self, tiny_model):
        imgs = random_images(2)
        ext = np.tile(np.eye(4)[:3], (2, 1, 1)).astype(np.float32)
        ext[1, 0, 3] = 0.5
        pred = tiny_model.inference(image=imgs, process_res=42, extrinsics=ext)
        np.testing.assert_allclose(pred.extrinsics, ext, atol=1e-6)

    def test_nonsquare_input(self, tiny_model):
        imgs = random_images(2, h=48, w=96)
        pred = tiny_model.inference(image=imgs, process_res=56)
        h, w = pred.depth.shape[1:]
        assert w == 56 and w % 14 == 0 and h % 14 == 0 and h < w

    def test_frame_descriptors(self, tiny_model):
        """Retrieval descriptors: [N, D] L2-normalised, input-dependent."""
        p1 = tiny_model.inference(image=random_images(3, seed=1), process_res=42)
        assert p1.frame_desc is not None
        assert p1.frame_desc.shape == (3, tiny_model.cfg.embed_dim)
        np.testing.assert_allclose(
            np.linalg.norm(p1.frame_desc, axis=-1), 1.0, atol=1e-5)
        p2 = tiny_model.inference(image=random_images(3, seed=2), process_res=42)
        assert np.abs(p1.frame_desc - p2.frame_desc).max() > 1e-4


class TestCheckpoint:
    def test_save_load_roundtrip(self, tiny_model, tmp_path):
        from da3slam_tpu.models.weights import save_checkpoint, load_checkpoint

        save_checkpoint(tmp_path / "ckpt", tiny_model.params, tiny_model.cfg)
        m2 = DepthAnything3.from_pretrained(str(tmp_path / "ckpt"))
        assert m2.cfg == tiny_model.cfg
        imgs = random_images(2)
        p1 = tiny_model.inference(image=imgs, process_res=42)
        p2 = m2.inference(image=imgs, process_res=42)
        np.testing.assert_allclose(p1.depth, p2.depth, atol=1e-6)
        np.testing.assert_allclose(p1.extrinsics, p2.extrinsics, atol=1e-6)

    def test_preset_aliases(self):
        assert get_preset("DA3-SAMLL") is PRESETS["small"]
        assert get_preset("/some/path/DA3NESTED-GIANT-LARGE-1.1") is PRESETS["giant"]


class TestJit:
    @pytest.mark.slow
    def test_forward_fn_jits_and_grads(self):
        """The pure forward must be differentiable (training path)."""
        cfg = TINY
        params = init_params(jax.random.PRNGKey(0), cfg)
        imgs = resize_normalize(jnp.asarray(random_images(2, 28, 28)), (28, 28))

        def loss(p):
            out = forward_fn(p, imgs, cfg)
            return jnp.mean(out["depth"]) + jnp.mean(out["conf"])

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(jnp.isfinite(l).all() for l in leaves)
        # gradient actually flows to the patch embedding
        assert float(jnp.abs(g["encoder"]["patch_embed"]["kernel"]).max()) > 0
