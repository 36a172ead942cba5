"""Pallas fused batchnorm+activation vs the jnp reference path (interpret
mode on CPU; the same code compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.ops import batchnorm, leaky_relu, relu
from graphical_gan_tpu.ops.pallas import fused_batchnorm_act

KEY = jax.random.PRNGKey(0)


def ref_bn_act(x, scale, offset, act):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=tuple(range(x.ndim - 1)))
    var = jnp.var(x32, axis=tuple(range(x.ndim - 1)))
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + offset
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky_relu":
        y = jnp.maximum(0.2 * y, y)
    return y


@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_forward_matches_reference(act):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7, 7, 32).astype("float32") * 2 + 1)
    scale = jnp.asarray(rng.rand(32).astype("float32") + 0.5)
    offset = jnp.asarray(rng.randn(32).astype("float32"))
    out = fused_batchnorm_act(x, scale, offset, act)
    ref = ref_bn_act(x, scale, offset, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_forward_nonaligned_rows():
    """Row count not divisible by large tiles (e.g. B*H*W = 4*7*7=196)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(196, 16).astype("float32"))
    scale = jnp.ones((16,))
    offset = jnp.zeros((16,))
    out = fused_batchnorm_act(x, scale, offset, "relu")
    ref = ref_bn_act(x, scale, offset, "relu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_gradients_match_reference(act):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 4, 4, 16).astype("float32"))
    scale = jnp.asarray(rng.rand(16).astype("float32") + 0.5)
    offset = jnp.asarray(rng.randn(16).astype("float32"))
    g_out = jnp.asarray(rng.randn(8, 4, 4, 16).astype("float32"))

    def loss_fused(x, s, o):
        return jnp.sum(fused_batchnorm_act(x, s, o, act) * g_out)

    def loss_ref(x, s, o):
        return jnp.sum(ref_bn_act(x, s, o, act) * g_out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, offset)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, offset)
    for a, b, name in zip(gf, gr, ("dx", "dscale", "doffset")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3, err_msg=name)


def test_matches_registry_batchnorm_relu():
    """Drop-in equivalence with the model path batchnorm+relu."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 8, 8, 8).astype("float32"))

    def f(xx):
        return relu(batchnorm("bn", xx))

    out_ref, params = registry.init(f, KEY, x)
    out_fused = fused_batchnorm_act(x, params["bn.scale"],
                                    params["bn.offset"], "relu")
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=1e-4)


@pytest.mark.slow
def test_pallas_path_inside_model():
    """GGAN_PALLAS: the fused kernel slots into the model batchnorm path
    with identical losses and finite gradients (interpret mode on CPU)."""
    import jax
    from graphical_gan_tpu.core import registry
    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    from graphical_gan_tpu.ops import norm

    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=4)
    model = GanInferenceModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    raw = jnp.asarray(np.random.RandomState(0).rand(4, 784).astype("float32"))
    key = jax.random.PRNGKey(1)

    g_ref, _ = registry.apply(lambda: model.gen_loss(raw), params, key)
    norm.enable_pallas(True)
    try:
        g_pallas, _ = registry.apply(lambda: model.gen_loss(raw), params, key)
        gen, _ = registry.partition(params, model.GEN_PLAYER)
        disc, _ = registry.partition(params, model.DISC_PLAYER)

        def loss(gen_params):
            p = registry.merge(gen_params, disc)
            out, _ = registry.apply(lambda: model.gen_loss(raw), p, key)
            return out

        grads = jax.grad(loss)(gen)
        finite = all(bool(jnp.isfinite(v).all()) for v in grads.values())
    finally:
        norm.enable_pallas(False)

    np.testing.assert_allclose(float(g_pallas), float(g_ref), rtol=1e-4)
    assert finite
