import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da3slam_tpu.models.config import get_preset
from da3slam_tpu.parallel import make_mesh, make_train_step, synthetic_batch, param_shardings


CFG = get_preset("tiny").with_overrides(embed_dim=64, num_heads=4, depth=4)


class TestMesh:
    def test_8_devices_factorises(self):
        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("dp", "tp")

    def test_single_device(self):
        mesh = make_mesh(1)
        assert mesh.devices.shape == (1, 1)

    def test_explicit_tp(self):
        mesh = make_mesh(8, tp=4)
        assert mesh.devices.shape == (2, 4)

    def test_invalid_tp_raises(self):
        with pytest.raises(ValueError):
            make_mesh(8, tp=3)


class TestShardingRules:
    def test_block_weights_sharded(self):
        from da3slam_tpu.models.da3 import init_params

        mesh = make_mesh(8, tp=2)
        params = init_params(jax.random.PRNGKey(0), CFG)
        sh = param_shardings(params, mesh)
        qkv = sh["encoder"]["blocks"][0]["attn"]["qkv_w"].spec
        assert qkv == jax.sharding.PartitionSpec(None, "tp")
        proj = sh["encoder"]["blocks"][0]["attn"]["proj_w"].spec
        assert proj == jax.sharding.PartitionSpec("tp", None)
        # norms replicated
        assert sh["encoder"]["norm"]["scale"].spec == jax.sharding.PartitionSpec()


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_on_8dev_mesh(self):
        mesh = make_mesh(8)
        init_fn, step_fn, place_batch = make_train_step(CFG, mesh, learning_rate=3e-4)
        state = init_fn()
        batch = place_batch(synthetic_batch(CFG, batch=4, n_views=3, hw=(28, 28)))
        losses = []
        for _ in range(5):
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_tp_matches_single_device(self):
        """Same init + batch must give the same loss on (4,2) and (1,1)
        meshes — sharding must not change the math."""
        batch = synthetic_batch(CFG, batch=4, n_views=2, hw=(28, 28))
        results = []
        for n, tp in [(1, 1), (8, 2)]:
            mesh = make_mesh(n, tp=tp)
            init_fn, step_fn, place_batch = make_train_step(CFG, mesh)
            state = init_fn(seed=0)
            _, loss = step_fn(state, place_batch(batch))
            results.append(float(loss))
        np.testing.assert_allclose(results[0], results[1], rtol=2e-4)


class TestSpTrainStep:
    def _window_batch(self, n_views, hw=(28, 28), seed=0):
        b = synthetic_batch(CFG, batch=1, n_views=n_views, hw=hw, seed=seed)
        return {k: v[0] for k, v in b.items()}  # drop the window axis

    @pytest.mark.slow
    def test_matches_dp_single_window(self):
        """The view-sharded (ring cross-view attention) train step must
        compute the same loss trajectory as the dense dp step on the same
        single window — sp is an execution layout, not different math."""
        from da3slam_tpu.parallel import make_sp_train_step

        window = self._window_batch(n_views=8)

        mesh1 = make_mesh(1)
        init_d, step_d, place_d = make_train_step(CFG, mesh1)
        state_d = init_d(seed=0)
        dense_batch = place_d({k: v[None] for k, v in window.items()})

        mesh8 = make_mesh(8, tp=1)
        init_s, step_s, place_s = make_sp_train_step(CFG, mesh8)
        state_s = init_s(seed=0)
        sp_batch = place_s(window)

        # two steps: the second loss reflects the first step's parameter
        # update, so it checks gradients end-to-end through the ring
        for step in range(2):
            state_d, loss_d = step_d(state_d, dense_batch)
            state_s, loss_s = step_s(state_s, sp_batch)
            np.testing.assert_allclose(
                float(loss_d), float(loss_s), rtol=1e-3,
                err_msg=f"sp/dp loss diverged at step {step}",
            )

    @pytest.mark.slow
    def test_loss_decreases(self):
        from da3slam_tpu.parallel import make_sp_train_step

        mesh = make_mesh(8, tp=1)
        init_fn, step_fn, place_batch = make_sp_train_step(
            CFG, mesh, learning_rate=3e-4
        )
        state = init_fn(seed=0)
        batch = place_batch(self._window_batch(n_views=8, seed=1))
        losses = []
        for _ in range(5):
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # params are replicated and stay replicated through the update
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestGraftEntry:
    @pytest.mark.slow
    def test_dryrun_multichip_8(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    @pytest.mark.slow
    def test_dryrun_multichip_2(self):
        # slow: ~95 s — the driver exercises this exact path every round,
        # and the 8-device variant covers it in the -m '' run
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(2)

    @pytest.mark.slow
    def test_dryrun_multichip_bare_subprocess(self):
        """The driver calls the entry point bare (no conftest). Prove it is
        self-sufficient: strip the conftest's XLA_FLAGS, keep the profile's
        JAX_PLATFORMS pin, and require a real (4,2) mesh in the output."""
        import os
        import subprocess

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # conftest sets this; the driver won't
        proc = subprocess.run(
            [
                "python",
                "-c",
                "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
            ],
            cwd="/root/repo",
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "mesh=(4, 2)" in proc.stdout
        assert "sp ring-attention forward ok" in proc.stdout


class TestMeshShortDeviceGuard:
    def test_make_mesh_raises_on_too_few_devices(self):
        with pytest.raises(ValueError, match="only"):
            make_mesh(len(jax.devices()) + 1)
