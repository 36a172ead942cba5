"""Op-level numerics: conv/deconv/conv1d/conv3d vs torch (TF-SAME padded),
batchnorm math, init statistics, masks, weightnorm, linear ND reshape."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.ops import (
    batchnorm, conv1d, conv2d, conv3d, deconv2d, layernorm, linear,
    minibatch_layer, ladder, leaky_relu, flatten_image, unflatten_image,
)
from graphical_gan_tpu.ops import initializers as inits

KEY = jax.random.PRNGKey(42)


def tf_same_pads(in_size, k, s):
    out = -(-in_size // s)
    pad = max((out - 1) * s + k - in_size, 0)
    return pad // 2, pad - pad // 2


def test_conv2d_matches_torch_tf_same():
    rng = np.random.RandomState(0)
    B, H, W, I, O, K, S = 2, 7, 7, 3, 5, 5, 2
    x = rng.randn(B, H, W, I).astype("float32")

    def f(xx):
        return conv2d("c", I, O, K, xx, stride=S)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    w = np.asarray(params["c.Filters"])  # HWIO
    lo, hi = tf_same_pads(H, K, S)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    wt = torch.tensor(w.transpose(3, 2, 0, 1))
    ref = F.conv2d(F.pad(xt, (lo, hi, lo, hi)), wt, stride=S)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv2d_valid_padding():
    rng = np.random.RandomState(1)
    B, H, I, O, K = 2, 6, 4, 3, 4
    x = rng.randn(B, H, H, I).astype("float32")

    def f(xx):
        return conv2d("c", I, O, K, xx, stride=1, padding="VALID")

    out, params = registry.init(f, KEY, jnp.asarray(x))
    w = np.asarray(params["c.Filters"])
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    wt = torch.tensor(w.transpose(3, 2, 0, 1))
    ref = F.conv2d(xt, wt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_deconv2d_is_gradient_of_forward_conv():
    """TF conv2d_transpose == input-gradient of the SAME forward conv; check
    against jax.vjp of the forward conv (the definitional oracle)."""
    rng = np.random.RandomState(2)
    B, Hin, I, O, K, S = 2, 4, 3, 5, 5, 2
    g = rng.randn(B, Hin, Hin, I).astype("float32")

    def f(xx):
        return deconv2d("d", I, O, K, xx, stride=S, biases=False)

    out, params = registry.init(f, KEY, jnp.asarray(g))
    w = jnp.asarray(params["d.Filters"])  # (K,K,O,I)

    def fwd(x):
        return jax.lax.conv_general_dilated(
            x, w, (S, S), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x0 = jnp.zeros((B, Hin * S, Hin * S, O), jnp.float32)
    _, vjp = jax.vjp(fwd, x0)
    ref, = vjp(jnp.asarray(g))
    assert out.shape == (B, Hin * S, Hin * S, O)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_deconv2d_output_shape_stride2():
    x = jnp.zeros((3, 7, 7, 4))

    def f(xx):
        return deconv2d("d", 4, 2, 5, xx)

    out, _ = registry.init(f, KEY, x)
    assert out.shape == (3, 14, 14, 2)


def test_conv1d_matches_torch():
    rng = np.random.RandomState(3)
    B, Wd, I, O, K, S = 2, 9, 3, 4, 5, 1
    x = rng.randn(B, Wd, I).astype("float32")

    def f(xx):
        return conv1d("c", I, O, K, xx, stride=S)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    w = np.asarray(params["c.Filters"])  # WIO
    lo, hi = tf_same_pads(Wd, K, S)
    xt = torch.tensor(x.transpose(0, 2, 1))
    wt = torch.tensor(w.transpose(2, 1, 0))
    ref = F.conv1d(F.pad(xt, (lo, hi)), wt, stride=S)
    ref = ref.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv3d_matches_torch_tf_same():
    rng = np.random.RandomState(4)
    B, L, H, I, O = 2, 4, 8, 3, 5
    x = rng.randn(B, L, H, H, I).astype("float32")

    def f(xx):
        return conv3d("c", 4, I, O, 4, xx, stride=2, stride_len=2)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    w = np.asarray(params["c.Filters"])  # DHWIO
    llo, lhi = tf_same_pads(L, 4, 2)
    slo, shi = tf_same_pads(H, 4, 2)
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    wt = torch.tensor(w.transpose(4, 3, 0, 1, 2))
    ref = F.conv3d(F.pad(xt, (slo, shi, slo, shi, llo, lhi)), wt, stride=2)
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_mask_a_b_patterns():
    from graphical_gan_tpu.ops.conv import _make_mask2d
    m = _make_mask2d("a", 1, 3, 2, 2)
    # future rows/cols zeroed; 'a' also zeroes the center tap
    assert m[2].sum() == 0 and m[1, 2].sum() == 0
    assert m[1, 1].sum() == 0  # type 'a': center masked (i>=j with 1 channel)
    mb = _make_mask2d("b", 1, 3, 2, 2)
    assert mb[1, 1].sum() == 4  # type 'b': center kept


def test_linear_init_statistics():
    """uniform(+-stdev*sqrt(3)) => sample stdev ~= scheme stdev (linear.py:39-75)."""
    in_d, out_d = 400, 300
    for scheme, expected in [
        ("lecun", math.sqrt(1.0 / in_d)),
        ("glorot", math.sqrt(2.0 / (in_d + out_d))),
        ("he", math.sqrt(2.0 / in_d)),
        ("glorot_he", math.sqrt(4.0 / (in_d + out_d))),
    ]:
        def f(xx):
            return linear("l", in_d, out_d, xx, initialization=scheme)

        _, params = registry.init(f, KEY, jnp.zeros((1, in_d)))
        w = np.asarray(params["l.W"])
        assert abs(w.std() / expected - 1.0) < 0.02, scheme
        assert abs(w.max() - expected * math.sqrt(3)) < 0.01 * expected * 2
        registry_params = params
    assert registry_params["l.b"].shape == (out_d,)


def test_linear_explicit_orthogonal():
    def f(xx):
        return linear("l", 64, 64, xx, initialization="orthogonal")

    _, params = registry.init(f, KEY, jnp.zeros((1, 64)))
    w = np.asarray(params["l.W"])
    np.testing.assert_allclose(w.T @ w, np.eye(64), atol=1e-4)


def test_linear_default_square_is_glorot_not_orthogonal():
    """Reference parity: the reference's orthogonal-when-square branch is
    unreachable (linear.py:55 catches None first) — default init is glorot
    even for square layers."""
    def f(xx):
        return linear("l", 512, 512, xx)  # initialization=None, square

    _, params = registry.init(f, KEY, jnp.zeros((1, 512)))
    w = np.asarray(params["l.W"])
    expected = math.sqrt(2.0 / (512 + 512))
    assert abs(w.std() / expected - 1.0) < 0.02
    # decidedly NOT orthogonal
    assert np.abs(w.T @ w - np.eye(512)).max() > 0.05


def test_linear_nd_input_reshape():
    def f(xx):
        return linear("l", 4, 6, xx, initialization="he")

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4).astype("float32"))
    out, params = registry.init(f, KEY, x)
    assert out.shape == (2, 3, 6)
    flat = registry.apply(f, params, None, x.reshape(6, 4))
    np.testing.assert_allclose(np.asarray(out).reshape(6, 6),
                               np.asarray(flat), atol=1e-6)


def test_linear_weightnorm():
    def f(xx):
        return linear("l", 8, 4, xx, initialization="he", weightnorm=True)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype("float32"))
    out, params = registry.init(f, KEY, x)
    w = np.asarray(params["l.W"])
    g = np.asarray(params["l.g"])
    np.testing.assert_allclose(g, np.sqrt((w ** 2).sum(0)), rtol=1e-6)
    # at init, weightnorm is identity (g == column norms)
    ref = x @ w + np.asarray(params["l.b"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_batchnorm_conv_path():
    rng = np.random.RandomState(5)
    x = rng.randn(4, 6, 6, 3).astype("float32") * 2 + 1

    def f(xx):
        return batchnorm("bn", xx)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    ref = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    assert params["bn.offset"].shape == (3,)
    assert params["bn.scale"].shape == (3,)


def test_batchnorm_dense_path():
    rng = np.random.RandomState(6)
    x = rng.randn(16, 10).astype("float32") * 3 - 2

    def f(xx):
        return batchnorm("bn", xx, axes=[0])

    out, params = registry.init(f, KEY, jnp.asarray(x))
    ref = (x - x.mean(0)) / np.sqrt(x.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    # dense [B,F] case uses per-feature params (shape (F,), not the
    # reference's keepdims (1,F) — same math, cleaner pytree)
    assert params["bn.offset"].shape == (10,)


def test_layernorm():
    rng = np.random.RandomState(7)
    x = rng.randn(4, 10).astype("float32")

    def f(xx):
        return layernorm("ln", [1], xx)

    out, _ = registry.init(f, KEY, jnp.asarray(x))
    ref = (x - x.mean(1, keepdims=True)) / np.sqrt(
        x.var(1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_minibatch_layer_shape_and_math():
    rng = np.random.RandomState(8)
    B, NI, NK, DK = 4, 6, 3, 2
    x = rng.randn(B, NI).astype("float32")

    def f(xx):
        return minibatch_layer("mb", NI, NK, DK, xx)

    out, params = registry.init(f, KEY, jnp.asarray(x))
    assert out.shape == (B, NI + NK)
    w = np.asarray(params["mb.W"])
    act = np.einsum("bi,ikd->bkd", x, w)
    f_ref = np.zeros((B, NK))
    for b in range(B):
        for k in range(NK):
            s = 0.0
            for b2 in range(B):
                d = np.abs(act[b, k] - act[b2, k]).sum()
                if b2 == b:
                    d += 1e6
                s += np.exp(-d)
            f_ref[b, k] = s
    np.testing.assert_allclose(np.asarray(out)[:, NI:], f_ref, atol=1e-4)


def test_ladder_identity_at_init():
    """At init (a1=c1=...=0, a2=c2=1, b1=0): z_est = z_lat."""
    rng = np.random.RandomState(9)
    z = rng.randn(3, 5).astype("float32")
    u = rng.randn(3, 5).astype("float32")

    def f(zz, uu):
        return ladder((zz, uu), 5, "lad")

    out, _ = registry.init(f, KEY, jnp.asarray(z), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), z, atol=1e-6)


def test_flatten_roundtrip_nchw_order():
    rng = np.random.RandomState(10)
    flat = rng.randn(2, 3 * 4 * 5).astype("float32")
    img = unflatten_image(jnp.asarray(flat), 3, 4, 5)
    assert img.shape == (2, 4, 5, 3)
    back = flatten_image(img)
    np.testing.assert_array_equal(np.asarray(back), flat)
    # NCHW ordering: element [b, c, h, w] of the flat vector
    np.testing.assert_allclose(
        np.asarray(img)[0, 1, 2, 2], flat[0, 2 * 20 + 1 * 5 + 2])


def test_leaky_relu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x)), [-0.4, 0.0, 3.0])


def test_py2_div_parity():
    assert inits.py2_div(25, 4) == 6          # py2 floor
    assert inits.py2_div(25.0, 4) == 6.25     # float stays true division
    # conv3d fan arithmetic mirrors left-to-right py2 evaluation
    fi, fo = inits.conv3d_fans(1, 32, 4, 4, 2, 2)
    assert fi == 1 * 16 * 4
    assert fo == ((32 * 16) // 4) * 4 // 2


def test_conv2d_weightnorm_identity_at_init():
    """Conv weightnorm: g initializes to per-output-filter norms, so the
    first forward equals the plain conv (conv2d.py:90-100)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6, 6, 3).astype("float32"))

    def f_wn(xx):
        return conv2d("c", 3, 4, 3, xx, weightnorm=True)

    out, params = registry.init(f_wn, KEY, x)
    w = np.asarray(params["c.Filters"])
    g = np.asarray(params["c.g"])
    np.testing.assert_allclose(g, np.sqrt((w ** 2).sum((0, 1, 2))),
                               rtol=1e-6)

    def f_plain(xx):
        return conv2d("c", 3, 4, 3, xx, weightnorm=False)

    ref = registry.apply(f_plain, params, None, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_deconv2d_weightnorm_identity_at_init():
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype("float32"))

    def f_wn(xx):
        return deconv2d("d", 3, 4, 5, xx, weightnorm=True)

    out, params = registry.init(f_wn, KEY, x)
    w = np.asarray(params["d.Filters"])  # (k,k,out,in); norms over (0,1,3)
    g = np.asarray(params["d.g"])
    np.testing.assert_allclose(g, np.sqrt((w ** 2).sum((0, 1, 3))),
                               rtol=1e-6)

    def f_plain(xx):
        return deconv2d("d", 3, 4, 5, xx, weightnorm=False)

    ref = registry.apply(f_plain, params, None, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_masked_conv_blocks_future_pixels():
    """Type-'a' mask: output at (i,j) must not depend on input at (i,j) or
    any later raster position."""
    def f(xx):
        return conv2d("c", 1, 1, 3, xx, mask_type=("a", 1), biases=False)

    x0 = jnp.zeros((1, 5, 5, 1))
    out0, params = registry.init(f, KEY, x0)
    # perturb the center pixel; outputs at positions <= center must not move
    x1 = x0.at[0, 2, 2, 0].set(10.0)
    out1 = registry.apply(f, params, None, x1)
    diff = np.abs(np.asarray(out1 - out0))[0, :, :, 0]
    assert diff[2, 2] == 0          # center (mask 'a' excludes self)
    assert diff[:2].sum() + diff[2, :3].sum() == 0  # strictly before center
    assert diff[3, :].sum() > 0     # later rows do see it
