"""Exactness of the phase-decomposed transposed conv.

``ops/phase_deconv.conv_transpose_phase`` must reproduce
``lax.conv_transpose(..., transpose_kernel=True)`` — the implementation
behind ``deconv2d``, itself tf-oracle-tested against
``tf.nn.conv2d_transpose`` (tests/test_tf_parity.py) — bit-for-math on
every kernel size/shape the families use, including values and gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from graphical_gan_tpu.ops.phase_deconv import conv_transpose_phase

_DN2D = ("NHWC", "HWIO", "NHWC")


def _ref(x, w):
    return lax.conv_transpose(x, w, strides=(2, 2), padding="SAME",
                              dimension_numbers=_DN2D, transpose_kernel=True)


@pytest.mark.parametrize("k", [3, 4, 5])
@pytest.mark.parametrize("h,w_sp", [(4, 4), (7, 5), (8, 8)])
def test_phase_deconv_matches_conv_transpose(k, h, w_sp):
    rng = np.random.RandomState(k * 100 + h)
    ci, co = 6, 7
    x = jnp.asarray(rng.randn(2, h, w_sp, ci).astype(np.float32))
    # TF transpose-conv kernel layout (k, k, out, in)
    wk = jnp.asarray(rng.randn(k, k, co, ci).astype(np.float32))
    got = conv_transpose_phase(x, wk)
    want = _ref(x, wk)
    assert got.shape == want.shape == (2, 2 * h, 2 * w_sp, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_phase_deconv_gradients_match():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    wk = jnp.asarray(rng.randn(5, 5, 4, 5).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))

    def loss(fn, x, wk):
        return jnp.sum(fn(x, wk) * cot)

    gx1, gw1 = jax.grad(lambda a, b: loss(conv_transpose_phase, a, b),
                        argnums=(0, 1))(x, wk)
    gx2, gw2 = jax.grad(lambda a, b: loss(_ref, a, b),
                        argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=3e-5, atol=3e-5)


def test_deconv2d_op_identical_under_gate(monkeypatch):
    """The deconv2d layer produces the same output with the gate on/off."""
    from graphical_gan_tpu.core import registry
    from graphical_gan_tpu.ops.conv import deconv2d

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8, 8, 12).astype(np.float32))

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("GGAN_PHASE_DECONV", flag)
        _, params = registry.init(lambda: deconv2d("D", 12, 9, 5, x),
                                  jax.random.PRNGKey(7))
        outs[flag] = registry.apply(lambda: deconv2d("D", 12, 9, 5, x),
                                    params, None)
    np.testing.assert_allclose(np.asarray(outs["0"]), np.asarray(outs["1"]),
                               rtol=2e-5, atol=2e-5)
