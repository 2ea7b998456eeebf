"""Flash-attention kernel correctness vs the XLA reference (interpret mode on
CPU; the real-TPU run is exercised by bench.py / verification drives)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from da3slam_tpu.ops.flash_attention import flash_attention


def xla_attention(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


def rand_qkv(rng, B, S, H, D, dtype=jnp.float32):
    def r():
        return jnp.asarray(rng.normal(size=(B, S, H, D)), dtype)

    return r(), r(), r()


# interpret mode: the kernel runs through the Pallas interpreter on CPU,
# validating the exact program the TPU executes
import contextlib
import functools
from unittest import mock


@contextlib.contextmanager
def interpret_mode():
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        yield


def flash_interp(q, k, v, **kw):
    with interpret_mode():
        return flash_attention.__wrapped__(q, k, v, **kw)


class TestFlashAttention:
    @pytest.mark.parametrize("S", [128, 256, 300])
    def test_matches_xla(self, S):
        rng = np.random.default_rng(0)
        q, k, v = rand_qkv(rng, 2, S, 3, 64)
        out = flash_interp(q, k, v, block_q=128, block_k=128)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_ragged_seq_masking(self):
        """S not a block multiple: padded keys must not leak into softmax."""
        rng = np.random.default_rng(1)
        q, k, v = rand_qkv(rng, 1, 200, 2, 64)
        out = flash_interp(q, k, v, block_q=128, block_k=128)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self):
        rng = np.random.default_rng(2)
        q, k, v = rand_qkv(rng, 1, 256, 2, 64, jnp.bfloat16)
        out = flash_interp(q, k, v, block_q=128, block_k=128)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_extreme_logits_stable(self):
        """Online softmax must survive large score magnitudes."""
        rng = np.random.default_rng(3)
        q, k, v = rand_qkv(rng, 1, 128, 1, 64)
        q = q * 30.0
        out = flash_interp(q, k, v, block_q=128, block_k=128)
        assert np.isfinite(np.asarray(out)).all()
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestFlashBackward:
    @pytest.mark.parametrize("S", [128, 256, 300])
    def test_grads_match_xla(self, S):
        rng = np.random.default_rng(4)
        q, k, v = rand_qkv(rng, 2, S, 3, 64)

        def loss_flash(q, k, v):
            return jnp.sum(flash_interp(q, k, v, block_q=128, block_k=128) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v) ** 2)

        with interpret_mode():
            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for gf, gx, name in zip(g_flash, g_xla, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gx), atol=3e-4,
                err_msg=f"d{name} mismatch at S={S}",
            )

    def test_value_and_grad_jit(self):
        rng = np.random.default_rng(5)
        q, k, v = rand_qkv(rng, 1, 128, 2, 64)

        def loss(q):
            return jnp.sum(flash_interp(q, q, q, block_q=128, block_k=128))

        with interpret_mode():
            val, g = jax.value_and_grad(loss)(q)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(g)).all()
        ref_val, ref_g = jax.value_and_grad(
            lambda q: jnp.sum(xla_attention(q, q, q))
        )(q)
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g), atol=3e-4)


class TestKSplits:
    """k_splits unrolls the online softmax over sub-blocks of one fetched
    K/V block (MXU/VPU overlap); the math must be bit-for-block identical
    in effect to the unsplit recurrence."""

    @pytest.mark.parametrize("k_splits", [2, 4])
    @pytest.mark.parametrize("S", [512, 300])
    def test_matches_xla(self, S, k_splits):
        rng = np.random.default_rng(10)
        q, k, v = rand_qkv(rng, 1, S, 2, 64)
        out = flash_interp(q, k, v, block_q=256, block_k=256, k_splits=k_splits)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_non_divisible_splits_degrade_gracefully(self):
        """bk not divisible by 128*k_splits halves the split factor instead
        of producing misaligned sub-blocks."""
        rng = np.random.default_rng(11)
        q, k, v = rand_qkv(rng, 1, 384, 2, 64)
        out = flash_interp(q, k, v, block_q=128, block_k=384, k_splits=4)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_grad_matches_unsplit(self):
        rng = np.random.default_rng(12)
        q, k, v = rand_qkv(rng, 1, 256, 2, 64)

        def loss(fn):
            def f(q, k, v):
                return jnp.sum(fn(q, k, v) ** 2)
            return f

        with interpret_mode():
            f_split = loss(lambda q, k, v: flash_attention.__wrapped__(
                q, k, v, block_q=128, block_k=256, k_splits=2))
            f_plain = loss(lambda q, k, v: flash_attention.__wrapped__(
                q, k, v, block_q=128, block_k=256))
            gs = jax.grad(f_split, argnums=(0, 1, 2))(q, k, v)
            gp = jax.grad(f_plain, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gs, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestBoundMode:
    """Max-free forward (stable=False): per-row norm-bound softmax shift.
    Must match XLA at transformer-typical scales; the documented failure
    mode (enormous-norm diffuse inputs underflow) is pinned explicitly."""

    @pytest.mark.parametrize("S", [256, 300])
    def test_matches_xla(self, S):
        rng = np.random.default_rng(20)
        q, k, v = rand_qkv(rng, 2, S, 3, 64)
        out = flash_interp(q, k, v, block_q=128, block_k=128, stable=False)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def test_bf16_layernormed_scale(self):
        """Inputs at the scale the encoder feeds (layernorm + projection)."""
        rng = np.random.default_rng(21)
        q, k, v = rand_qkv(rng, 1, 512, 2, 64, jnp.bfloat16)
        out = flash_interp(q, k, v, block_q=256, block_k=256, stable=False)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_grads_match_stable(self):
        """One backward serves both forwards: lse is the same quantity."""
        rng = np.random.default_rng(22)
        q, k, v = rand_qkv(rng, 1, 256, 2, 64)

        def loss(stable):
            def f(q, k, v):
                out = flash_attention.__wrapped__(
                    q, k, v, block_q=128, block_k=256, stable=stable)
                return jnp.sum(out ** 2)
            return f

        with interpret_mode():
            gb = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
            gs = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gb, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_documented_pathology_underflow(self):
        """30x-scaled diffuse inputs: δ = bound - true max exceeds the f32
        underflow range, every p flushes to zero and the output collapses —
        the exact case the docstring routes to stable=True."""
        rng = np.random.default_rng(23)
        q, k, v = rand_qkv(rng, 1, 128, 1, 64)
        q = q * 30.0
        out = flash_interp(q, k, v, block_q=128, block_k=128, stable=False)
        assert np.isfinite(np.asarray(out)).all()  # degrades to zeros, not NaN
        np.testing.assert_array_equal(np.asarray(out), 0.0)
        ok = flash_interp(q, k, v, block_q=128, block_k=128, stable=True)
        np.testing.assert_allclose(np.asarray(ok), np.asarray(xla_attention(q, k, v)),
                                   atol=1e-4)


class TestOneBlockDispatch:
    """The intra-view shape (S≈1.3k) routes through the flash kernel as ONE
    S-sized block per (batch, head) — XLA's fused attention materialises
    the full [B, H, S, S] f32 score tensor there (~12 ms of the SMALL
    forward, r3 trace).  Validate the exact one-block program numerically."""

    def test_one_block_matches_xla(self):
        rng = np.random.default_rng(7)
        S = 1301  # the 504x504 intra-view token count (36*36 + 5)
        q, k, v = rand_qkv(rng, 2, S, 2, 64)
        b = (S + 127) // 128 * 128
        out = flash_interp(q, k, v, block_q=b, block_k=b, stable=False)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_dispatch_gate_bounds(self):
        from da3slam_tpu.ops import attention as A

        # the one-block path must stay within its VMEM-safe block cap
        assert A.FLASH_ONEBLOCK_MIN_SEQ < A.FLASH_ONEBLOCK_MAX < A.FLASH_MIN_SEQ
        assert A._round_up(1301, 128) <= A.FLASH_ONEBLOCK_MAX
