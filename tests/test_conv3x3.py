"""Tap-panel Pallas 3×3 conv (ops/conv3x3.py) vs the XLA conv oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da3slam_tpu.ops.conv3x3 import conv3x3_eligible, conv3x3_fused


def _oracle(x, kernel, bias, relu):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(x.dtype)
    return jnp.maximum(out, 0.0) if relu else out


@pytest.mark.parametrize(
    "shape,cout,relu",
    [
        ((2, 16, 20, 8), 4, True),   # head2-like: narrow out channels
        ((1, 24, 9, 16), 8, False),  # head1-like; odd width
        ((2, 16, 16, 3), 5, False),  # non-multiple-of-8 channels
    ],
)
def test_matches_xla_conv(shape, cout, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, shape[-1], cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    assert conv3x3_eligible(x, k)
    out = conv3x3_fused(k, b, x, relu=relu, interpret=True)
    ref = _oracle(x, k, b, relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_zero_padding_boundary():
    """Border pixels must see zero padding, not wrapped neighbours — ones
    input makes any leakage visible."""
    x = jnp.ones((1, 8, 8, 2), jnp.float32)
    k = jnp.ones((3, 3, 2, 1), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)
    out = np.asarray(conv3x3_fused(k, b, x, interpret=True))[0, :, :, 0]
    assert out[0, 0] == pytest.approx(8.0)    # corner: 4 taps × 2 ch
    assert out[0, 4] == pytest.approx(12.0)   # edge: 6 taps × 2 ch
    assert out[4, 4] == pytest.approx(18.0)   # interior: 9 × 2


def test_eligibility_gates():
    x = jnp.zeros((1, 15, 16, 8), jnp.float32)  # H % 8 != 0
    k = jnp.zeros((3, 3, 8, 4))
    assert not conv3x3_eligible(x, k)
    assert not conv3x3_eligible(jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 1, 8, 4)))
    assert conv3x3_eligible(jnp.zeros((1, 16, 16, 8)), k)


def test_bf16_input():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 12, 8)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    out = conv3x3_fused(k, b, x, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _oracle(x.astype(jnp.float32), k, b, relu=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )
