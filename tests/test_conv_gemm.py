"""Shape-specialized implicit-GEMM conv kernel (ops/pallas/conv_gemm.py)
vs XLA's identically-fused conv — forward correctness at the flagship
discriminator shapes, both dtypes, batch blocking, and phase-stack
geometry edge cases."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphical_gan_tpu.ops.pallas.conv_gemm import (
    conv_gemm, conv_gemm_reference, phase_stack)


@pytest.mark.parametrize("b,h,cin,cout", [
    (4, 16, 128, 256),     # disc2-like
    (4, 8, 256, 512),      # disc3-like
    (2, 32, 8, 128),       # stem-like (small C still correct, if slow)
    (6, 12, 16, 128),      # odd H not divisible by 4
])
def test_conv_gemm_matches_xla_f32(b, h, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, h, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, cin, cout).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    got = np.asarray(conv_gemm(x, w, bias))
    ref = np.asarray(conv_gemm_reference(x, w, bias))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_conv_gemm_bf16_and_no_act():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 16, 16, 64), jnp.bfloat16)
    w = jnp.asarray(rng.randn(5, 5, 64, 128) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(128), jnp.bfloat16)
    got = np.asarray(conv_gemm(x, w, bias, leak=None), np.float32)
    ref = np.asarray(conv_gemm_reference(x, w, bias, leak=None), np.float32)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 2e-2   # bf16 tolerance
    assert got.dtype == np.float32  # cast from bf16 output


def test_conv_gemm_batch_blocking_equivalence():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 16, 16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 64, 128).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    whole = np.asarray(conv_gemm(x, w, bias, b_block=8))
    blocked = np.asarray(conv_gemm(x, w, bias, b_block=2))
    np.testing.assert_allclose(whole, blocked, atol=1e-5)


def test_phase_stack_geometry():
    """Tap (kh, kw) must read phase (kh%2, kw%2) at offset (kh//2, kw//2):
    verify against a direct gather of the padded image."""
    rng = np.random.RandomState(3)
    h = 16
    x = jnp.asarray(rng.randn(2, h, h, 4).astype(np.float32))
    xp = np.asarray(phase_stack(x, 5, 2))
    oh = h // 2
    xpad = np.zeros((2, h + 5, h + 5, 4), np.float32)
    xpad[:, 1:h + 1, 1:h + 1] = np.asarray(x)     # SAME pads: top/left 1
    for kh in range(5):
        for kw in range(5):
            ph, pw = kh % 2, kw % 2
            oh0, ow0 = kh // 2, kw // 2
            win = xp[ph * 2 + pw][:, oh0:oh0 + oh, ow0:ow0 + oh, :]
            direct = xpad[:, kh:kh + 2 * oh:2, kw:kw + 2 * oh:2, :]
            np.testing.assert_array_equal(win, direct,
                                          err_msg=f"tap {kh},{kw}")


def test_conv_gemm_im2col_variant_matches():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 16, 16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 64, 128).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    got = np.asarray(conv_gemm(x, w, bias, variant="im2col"))
    ref = np.asarray(conv_gemm_reference(x, w, bias))
    np.testing.assert_allclose(got, ref, atol=1e-3)
