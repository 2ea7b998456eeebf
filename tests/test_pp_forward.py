"""Pipeline-parallel encoder: pp must be a pure execution-strategy change —
taps and final activations identical to the sequential vit.encode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from da3slam_tpu.models import vit
from da3slam_tpu.models.config import get_preset
from da3slam_tpu.parallel.pp_forward import make_pp_encode, split_encoder_params


def pp_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.asarray(devs[:n]), axis_names=("pp",))


class TestPPForward:
    def _run(self, n_stages, M=3, N=2, hw=(28, 28)):
        cfg = get_preset("tiny")  # depth=4, taps (0,1,2,3), interval 2
        mesh = pp_mesh(n_stages)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.normal(size=(M, N, *hw, 3)).astype(np.float32)
        )

        # sequential reference, per microbatch
        ref_taps, ref_final = [], []
        for m in range(M):
            taps, final, _grid = vit.encode(params, images[m], cfg, attn_impl="xla")
            ref_taps.append(jnp.stack(taps))
            ref_final.append(final)
        ref_taps = jnp.stack(ref_taps)  # [M, n_taps, N, S, D]
        ref_final = jnp.stack(ref_final)

        stage_params, rest = split_encoder_params(params, n_stages, mesh)
        encode_pp = make_pp_encode(cfg, mesh, n_stages)
        taps, final = encode_pp(stage_params, rest, images)
        return np.asarray(taps), np.asarray(final), np.asarray(ref_taps), np.asarray(ref_final)

    def test_two_stages_match_sequential(self):
        taps, final, ref_taps, ref_final = self._run(2)
        np.testing.assert_allclose(final, ref_final, atol=2e-5)
        np.testing.assert_allclose(taps, ref_taps, atol=2e-5)

    def test_four_stages_match_sequential(self):
        """One block per stage — every tap crosses a stage boundary."""
        taps, final, ref_taps, ref_final = self._run(4)
        np.testing.assert_allclose(final, ref_final, atol=2e-5)
        np.testing.assert_allclose(taps, ref_taps, atol=2e-5)

    def test_single_microbatch(self):
        taps, final, ref_taps, ref_final = self._run(2, M=1)
        np.testing.assert_allclose(final, ref_final, atol=2e-5)

    def test_stage_count_must_divide_depth(self):
        cfg = get_preset("tiny")
        mesh = pp_mesh(3)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="must divide"):
            split_encoder_params(params, 3, mesh)
        with pytest.raises(ValueError, match="must divide"):
            make_pp_encode(cfg, mesh, 3)

    def test_remat_matches_no_remat(self):
        """cfg.remat is a pure memory/FLOPs trade: pp forward outputs and
        grads through the pipeline must be unchanged (GPipe + remat — the
        backward recomputes each block from its per-tick input)."""
        import dataclasses

        cfg = get_preset("tiny")
        cfg_r = dataclasses.replace(cfg, remat=True)
        n_stages, M, N, hw = 2, 2, 2, (28, 28)
        mesh = pp_mesh(n_stages)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.normal(size=(M, N, *hw, 3)).astype(np.float32))
        stage_params, rest = split_encoder_params(params, n_stages, mesh)

        outs, grads = [], []
        for c in (cfg, cfg_r):
            encode_pp = make_pp_encode(c, mesh, n_stages)
            taps, final = encode_pp(stage_params, rest, images)
            outs.append((np.asarray(taps), np.asarray(final)))

            def scalar(sp, enc=encode_pp):
                t, f = enc(sp, rest, images)
                return jnp.sum(f**2) + jnp.sum(t**2)

            grads.append(jax.grad(scalar)(stage_params))
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
        np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            grads[0], grads[1],
        )

    def test_weights_are_stage_sharded(self):
        """Each stage's block weights live only on its pipeline rank."""
        cfg = get_preset("tiny")
        mesh = pp_mesh(4)
        params = vit.init_encoder(jax.random.PRNGKey(0), cfg)
        stage_params, _ = split_encoder_params(params, 4, mesh)
        leaf = stage_params["attn"]["qkv_w"]  # [4, 1, D, 3D]
        assert leaf.sharding.spec[0] == "pp"
        # per-device shard is a quarter of the stacked weights
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[0] == 1


class TestPPTrain:
    """Pipeline-parallel training: grads through the ppermute ring must
    match the sequential encoder's grads (transposed ring = GPipe
    backward), and the step must actually learn."""

    def _setup(self, n_stages=2, M=3, N=2, hw=(28, 28)):
        from da3slam_tpu.parallel import make_pp_train_step

        cfg = get_preset("tiny")
        mesh = pp_mesh(n_stages)
        init_fn, step_fn, place_batch = make_pp_train_step(cfg, mesh, n_stages)
        rng = np.random.default_rng(0)
        batch = place_batch({
            "images": jnp.asarray(rng.normal(size=(M, N, *hw, 3)).astype(np.float32)),
            "depth": jnp.asarray(rng.uniform(0.5, 3.0, size=(M, N, *hw)).astype(np.float32)),
        })
        return cfg, mesh, init_fn, step_fn, batch

    @pytest.mark.slow  # heavy: see --durations trim, round 3
    def test_loss_decreases(self):
        _, _, init_fn, step_fn, batch = self._setup()
        state = init_fn(seed=0)
        losses = []
        for _ in range(5):
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    @pytest.mark.slow  # heavy: see --durations trim, round 3
    def test_grads_match_sequential(self):
        """Same initial weights: pp grads (stage-stacked, pp-sharded) must
        equal the sequential encoder's grads up to f32 reduction order."""
        from da3slam_tpu.models import dpt as dpt_mod
        from da3slam_tpu.models.da3 import init_params
        from da3slam_tpu.parallel.pp_forward import split_encoder_params
        from da3slam_tpu.parallel.train import depth_loss, make_pp_train_step

        cfg = get_preset("tiny")
        n_stages, M, N, hw = 2, 3, 2, (28, 28)
        mesh = pp_mesh(n_stages)
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.normal(size=(M, N, *hw, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0.5, 3.0, size=(M, N, *hw)).astype(np.float32))

        full = init_params(jax.random.PRNGKey(0), cfg)

        # sequential reference loss over the same microbatches
        def seq_loss(full_params):
            def per_mb(imgs, gt_d):
                taps, final, grid = vit.encode(full_params["encoder"], imgs, cfg,
                                               attn_impl="xla")
                depth, conf, _ = dpt_mod.apply_dpt(full_params["dpt"], taps, grid,
                                                   hw, cfg)
                return depth, conf
            depth, conf = jax.vmap(per_mb)(images, gt)
            flat = lambda a: a.reshape((-1,) + a.shape[2:])
            return depth_loss(flat(depth), flat(conf), flat(gt))

        seq_grads = jax.grad(seq_loss)(full)

        # pp loss with identical weights
        from da3slam_tpu.parallel.pp_forward import make_pp_encode
        encode_pp = make_pp_encode(cfg, mesh, n_stages)
        stage_params, rest = split_encoder_params(full["encoder"], n_stages, mesh)

        def pp_loss(params):
            sp, r, dp = params
            taps, _final = encode_pp(sp, r, images)
            grid = (hw[0] // cfg.patch_size, hw[1] // cfg.patch_size)
            def head(taps_m):
                depth, conf, _ = dpt_mod.apply_dpt(dp, list(taps_m), grid, hw, cfg)
                return depth, conf
            depth, conf = jax.vmap(head)(taps)
            flat = lambda a: a.reshape((-1,) + a.shape[2:])
            return depth_loss(flat(depth), flat(conf), flat(gt))

        pp_grads = jax.grad(pp_loss)((stage_params, rest, full["dpt"]))
        g_stage, g_rest, g_dpt = pp_grads

        # stage-stacked block grads -> per-block, compare against the list
        per = cfg.depth // n_stages
        for s in range(n_stages):
            for j in range(per):
                blk_pp = jax.tree.map(lambda a: np.asarray(a[s, j]), g_stage)
                blk_seq = jax.tree.map(np.asarray,
                                       seq_grads["encoder"]["blocks"][s * per + j])
                for a, b in zip(jax.tree.leaves(blk_pp), jax.tree.leaves(blk_seq)):
                    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)
        # patch embed (rest) and head grads
        np.testing.assert_allclose(
            np.asarray(g_rest["patch_embed"]["kernel"]),
            np.asarray(seq_grads["encoder"]["patch_embed"]["kernel"]),
            atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(
            np.asarray(g_dpt["head_out"]["kernel"]),
            np.asarray(seq_grads["dpt"]["head_out"]["kernel"]),
            atol=2e-4, rtol=2e-3)
