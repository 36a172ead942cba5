"""Pallas fused conv2d+bias+act vs the XLA reference path (interpret mode on
CPU; the same code compiles on TPU), including the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.ops.activations import activation
from graphical_gan_tpu.ops.pallas.fused_conv import fused_conv2d_bias_act


def ref_conv(x, w, b, stride, padding, act):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + b.astype(out.dtype)
    return activation(act)(out)


def _rand(rng, shape, dtype="float32"):
    return jnp.asarray(rng.randn(*shape).astype(dtype))


CASES = [
    # (B, H, W, Cin, Cout, K, stride, padding) — the model families' shapes
    (4, 32, 32, 3, 16, 5, 2, "SAME"),     # first D/E conv (cifar)
    (4, 16, 16, 16, 32, 5, 2, "SAME"),    # deeper block
    (2, 7, 7, 8, 16, 5, 2, "SAME"),       # odd spatial (mnist 7x7)
    (2, 9, 9, 8, 8, 3, 1, "SAME"),        # stride 1
    (2, 12, 12, 8, 8, 5, 2, "VALID"),
    (2, 8, 8, 8, 24, 1, 1, "SAME"),       # 1x1
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("act", [None, "leaky_relu"])
def test_forward_matches_xla(case, act):
    b, h, w_, cin, cout, k, s, pad = case
    rng = np.random.RandomState(0)
    x = _rand(rng, (b, h, w_, cin))
    w = _rand(rng, (k, k, cin, cout)) * 0.2
    bias = _rand(rng, (cout,))
    got = fused_conv2d_bias_act(x, w, bias, s, pad, act)
    want = ref_conv(x, w, bias, s, pad, act)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_forward_bf16_accumulates_f32():
    rng = np.random.RandomState(1)
    x = _rand(rng, (2, 16, 16, 8)).astype(jnp.bfloat16)
    w = (_rand(rng, (5, 5, 8, 16)) * 0.2).astype(jnp.bfloat16)
    bias = _rand(rng, (16,))
    got = fused_conv2d_bias_act(x, w, bias, 2, "SAME", "leaky_relu")
    assert got.dtype == jnp.bfloat16
    want = ref_conv(x.astype(jnp.float32), w.astype(jnp.float32), bias, 2,
                    "SAME", "leaky_relu")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


@pytest.mark.parametrize("act", [None, "leaky_relu"])
def test_vjp_matches_xla(act):
    rng = np.random.RandomState(2)
    x = _rand(rng, (2, 8, 8, 4))
    w = _rand(rng, (5, 5, 4, 8)) * 0.3
    bias = _rand(rng, (8,))

    def loss_fused(x, w, b):
        y = fused_conv2d_bias_act(x, w, b, 2, "SAME", act)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(ref_conv(x, w, b, 2, "SAME", act)))

    gx, gw, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, bias)
    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_op_fused_dispatch_matches():
    """ops.conv.conv2d(act=...) under the Pallas gate == the ungated path."""
    from graphical_gan_tpu.core import registry
    from graphical_gan_tpu.ops import conv as conv_mod
    from graphical_gan_tpu.ops import pallas as pallas_pkg

    rng = np.random.RandomState(3)
    x = _rand(rng, (2, 8, 8, 4))

    def fwd():
        return conv_mod.conv2d("C", 4, 8, 5, x, stride=2, act="leaky_relu")

    out_ref, params = registry.init(fwd, jax.random.PRNGKey(0))
    pallas_pkg.enable_pallas(True)
    try:
        got = registry.apply(fwd, params, jax.random.PRNGKey(0))
    finally:
        pallas_pkg.enable_pallas(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
