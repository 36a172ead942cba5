"""Core param registry semantics (create-or-share, partition, RNG)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.ops import initializers as inits


def test_create_or_share_by_name():
    def model():
        a = registry.param("Generator.W", inits.normal((4, 4)))
        b = registry.param("Generator.W", inits.normal((4, 4)))
        return a, b

    (a, b), params = registry.init(model, jax.random.PRNGKey(0))
    assert list(params) == ["Generator.W"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cross_function_sharing():
    """GMGAN shares 'Generator.Hyper.Mu' across HyperGenerator and
    HyperExtractor (gmgan_inference_mnist.py:143,149)."""

    def f1():
        return registry.param("Generator.Hyper.Mu", inits.normal((3, 2)))

    def f2():
        return registry.param("Generator.Hyper.Mu", inits.normal((3, 2)))

    def model():
        return f1(), f2()

    (a, b), params = registry.init(model, jax.random.PRNGKey(0))
    assert len(params) == 1
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_key_is_order_independent():
    def model_ab():
        a = registry.param("A", inits.normal((2,)))
        b = registry.param("B", inits.normal((2,)))
        return a, b

    def model_ba():
        b = registry.param("B", inits.normal((2,)))
        a = registry.param("A", inits.normal((2,)))
        return a, b

    _, p1 = registry.init(model_ab, jax.random.PRNGKey(7))
    _, p2 = registry.init(model_ba, jax.random.PRNGKey(7))
    for n in ("A", "B"):
        np.testing.assert_array_equal(np.asarray(p1[n]), np.asarray(p2[n]))


def test_apply_is_pure_lookup():
    def model(x):
        w = registry.param("W", inits.normal((3, 3)))
        return x @ w

    x = jnp.ones((2, 3))
    _, params = registry.init(model, jax.random.PRNGKey(0), x)
    out1 = registry.apply(model, params, None, x)
    out2 = registry.apply(model, params, None, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    with pytest.raises(KeyError):
        registry.apply(model, {}, None, x)


def test_apply_is_jit_and_grad_compatible():
    def model(x):
        w = registry.param("W", inits.normal((3, 1)))
        return jnp.sum(x @ w)

    x = jnp.ones((2, 3))
    _, params = registry.init(model, jax.random.PRNGKey(0), x)

    @jax.jit
    def loss(p, x):
        return registry.apply(model, p, None, x)

    g = jax.grad(loss)(params, x)
    assert g["W"].shape == (3, 1)
    np.testing.assert_allclose(np.asarray(g["W"]), 2.0 * np.ones((3, 1)))


def test_params_with_name_substring_semantics():
    params = {"Generator.W": 1, "Extractor.W": 2, "Discriminator.zx1.W": 3}
    assert set(registry.params_with_name(params, "Generator")) == {"Generator.W"}
    # substring (not prefix) matching — reference tflib/__init__.py:35-36
    assert set(registry.params_with_name(params, "zx1")) == {"Discriminator.zx1.W"}


def test_partition():
    params = {"Generator.W": 1, "Extractor.W": 2, "Discriminator.W": 3}
    hit, rest = registry.partition(params, ["Generator", "Extractor"])
    assert set(hit) == {"Generator.W", "Extractor.W"}
    assert set(rest) == {"Discriminator.W"}


def test_rng_stream_distinct_keys():
    def model():
        return registry.next_rng_key(), registry.next_rng_key()

    (k1, k2), _ = registry.init(model, jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))


def test_alias_params():
    """alias_params redirects lookups (reference tflib/__init__.py:42-47)."""
    def model():
        a = registry.param("A", inits.normal((2,)))
        registry.alias_params({"B": "A"})
        b = registry.param("B", inits.normal((2,)))
        registry.delete_param_aliases()
        c = registry.param("B", inits.normal((2,)))
        return a, b, c

    (a, b, c), params = registry.init(model, jax.random.PRNGKey(0))
    assert set(params) == {"A", "B"}
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
