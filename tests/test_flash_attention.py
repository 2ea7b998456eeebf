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
def flash_interp(q, k, v, **kw):
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
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
