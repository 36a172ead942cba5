"""Family-2 GMGAN: mixture prior/posterior mechanics, shared Mu, MODE_K
sampling, mode dispatch, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import gmgan_defaults
from graphical_gan_tpu.models.gmgan import GMGanModel
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def tiny(dataset="mnist", mode="local_ep", **kw):
    kw.setdefault("dim", 8)
    kw.setdefault("batch_size", 4)
    kw.setdefault("n_coms", 5)
    return gmgan_defaults(dataset, mode, **kw)


def test_hyper_mu_shared_and_in_generator_player():
    model = GMGanModel(tiny())
    params = model.init(KEY)
    assert "Generator.Hyper.Mu" in params
    assert params["Generator.Hyper.Mu"].shape == (5, 128)
    gen, _ = registry.partition(params, model.GEN_PLAYER)
    disc, _ = registry.partition(params, model.DISC_PLAYER)
    assert "Generator.Hyper.Mu" in gen
    assert "Generator.Hyper.Mu" not in disc


def test_hyper_generator_math():
    model = GMGanModel(tiny())
    params = model.init(KEY)
    mu = np.asarray(params["Generator.Hyper.Mu"])
    k = jax.nn.one_hot(jnp.asarray([2, 0]), 5)
    noise = jnp.zeros((2, 128))
    out = registry.apply(lambda: model.hyper_generator(k, noise), params, KEY)
    np.testing.assert_allclose(np.asarray(out)[0], mu[2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], mu[0], atol=1e-6)


def test_hyper_extractor_logits_are_distances():
    model = GMGanModel(tiny())
    params = model.init(KEY)
    mu = np.asarray(params["Generator.Hyper.Mu"])
    # z exactly at component 3's mean => argmax logits == 3
    z = jnp.asarray(mu[3:4])
    logits, k = registry.apply(lambda: model.hyper_extractor(z), params, KEY)
    assert int(jnp.argmax(logits, axis=-1)[0]) == 3
    # CONCRETE sample is a simplex point
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-5)
    assert float(jnp.min(k)) >= 0.0


@pytest.mark.parametrize("mode_k", ["CONCRETE", "STRAIGHT_THROUGHT_CONCRETE",
                                    "STRAIGHT_THROUGHT", "REINFORCE"])
def test_mode_k_sampling_shapes(mode_k):
    model = GMGanModel(tiny(mode_k=mode_k))
    params = model.init(KEY)
    z = jnp.asarray(np.random.RandomState(0).randn(4, 128).astype("float32"))
    logits, k = registry.apply(lambda: model.hyper_extractor(z), params, KEY)
    assert k.shape == (4, 5)
    if mode_k in ("STRAIGHT_THROUGHT_CONCRETE", "REINFORCE"):
        # forward value is (numerically) one-hot
        np.testing.assert_allclose(np.asarray(jnp.max(k, axis=1)),
                                   np.ones(4), rtol=1e-5)


def test_straight_through_gradient_flows():
    """ST-CONCRETE: forward one-hot, backward soft — grads w.r.t. z nonzero."""
    model = GMGanModel(tiny(mode_k="STRAIGHT_THROUGHT_CONCRETE"))
    params = model.init(KEY)

    def loss(z):
        _, k = model.hyper_extractor(z)
        return jnp.sum(k * jnp.arange(5.0))

    g = registry.apply(
        lambda z: jax.grad(lambda zz: loss(zz))(z), params, KEY,
        jnp.ones((2, 128)))
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("mode", ["ali", "alice", "local_ep", "local_epce",
                                  "vegan"])
def test_all_gmgan_modes_finite(mode):
    cfg = tiny("mnist", mode)
    model = GMGanModel(cfg)
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(0).rand(4, 784).astype("float32"))
    g, _ = registry.apply(lambda: model.gen_loss(raw), params,
                          jax.random.PRNGKey(1))
    d, _ = registry.apply(lambda: model.disc_loss(raw), params,
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(g)) and np.isfinite(float(d)), mode


def test_reinforce_adds_surrogate():
    cfg = tiny("mnist", "local_ep", mode_k="REINFORCE")
    model = GMGanModel(cfg)
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(0).rand(4, 784).astype("float32"))
    g, _ = registry.apply(lambda: model.gen_loss(raw), params,
                          jax.random.PRNGKey(1))
    assert np.isfinite(float(g))


def test_local_ep_has_two_discriminators():
    cfg = tiny("mnist", "local_ep")
    model = GMGanModel(cfg)
    params = model.init(KEY)
    # both the latent-layer MLP and the data-layer conv D exist
    assert "Discriminator.HyperInput.W" in params
    assert "Discriminator.1.Filters" in params
    assert "Discriminator.zx1.W" in params


def test_ali_uses_joint_xzk_discriminator():
    cfg = tiny("mnist", "ali")
    model = GMGanModel(cfg)
    params = model.init(KEY)
    assert "Discriminator.x1.Filters" in params
    assert "Discriminator.zk1.W" in params
    assert "Discriminator.zkx1.W" in params
    assert "Discriminator.HyperInput.W" not in params


def test_cluster_probs_shape_and_simplex():
    cfg = tiny()
    model = GMGanModel(cfg)
    params = model.init(KEY)
    raw = jnp.asarray(np.random.RandomState(0).rand(4, 784).astype("float32"))
    probs = registry.apply(lambda: model.cluster_probs(raw), params, KEY)
    assert probs.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, axis=1)),
                               np.ones(4), rtol=1e-5)


def test_gmgan_train_step_smoke():
    cfg = tiny("mnist", "local_ep")
    model = GMGanModel(cfg)
    params = model.init(KEY)
    step, init_state = make_train_step(model)
    state = init_state(params)
    rng = np.random.RandomState(0)
    mu_before = None
    for i in range(4):
        raw = jnp.asarray(rng.rand(2, 4, 784).astype("float32"))
        if i == 1:
            mu_before = np.asarray(state.params["Generator.Hyper.Mu"]).copy()
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(i > 0))
        assert np.isfinite(float(m["gen_cost"]))
        assert np.isfinite(float(m["disc_cost"]))
    # the mixture means are being trained (by the generator player)
    mu_after = np.asarray(state.params["Generator.Hyper.Mu"])
    assert np.abs(mu_after - mu_before).max() > 0


def test_gmgan_defaults_per_dataset():
    assert gmgan_defaults("mnist").n_coms == 30
    assert gmgan_defaults("svhn").n_coms == 50
    assert gmgan_defaults("svhn").bn is False
    assert gmgan_defaults("celeba").n_coms == 100
    assert gmgan_defaults("celeba").batch_size == 128
