"""Learning-dynamics integration tests: with a structured low-dimensional
data distribution, training must actually reduce reconstruction error /
move samples toward the data manifold (not just keep losses finite)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.train.step import make_train_step


def structured_images(n: int, seed: int = 0) -> np.ndarray:
    """A 2-factor image family: smooth vertical/horizontal gradients mixed
    by two latent coefficients — easily learnable by a tiny ALI model."""
    rng = np.random.RandomState(seed)
    a = rng.rand(n, 1, 1)
    b = rng.rand(n, 1, 1)
    yy, xx = np.mgrid[0:28, 0:28] / 27.0
    img = a * yy[None] + b * xx[None]
    return (img / img.max(axis=(1, 2), keepdims=True)).reshape(
        n, 784).astype("float32")


@pytest.mark.slow
def test_alice_reconstruction_improves():
    """alice mode (explicit reconstruction term): rec error must drop
    substantially over a few hundred steps."""
    cfg = gan_inference_defaults("mnist", "alice", dim=8, batch_size=32,
                                 dim_latent=8, lr=1e-3)
    model = GanInferenceModel(cfg)
    step, init_state = make_train_step(model)
    state = init_state(model.init(jax.random.PRNGKey(0)))
    data = structured_images(2048)
    rng = np.random.RandomState(0)

    def rec_err(params, x):
        rec = registry.apply(lambda: model.reconstruct(jnp.asarray(x)),
                             params, jax.random.PRNGKey(123))
        return float(jnp.mean(jnp.square(rec - jnp.asarray(x))))

    hold = data[:64]
    err0 = rec_err(state.params, hold)
    for i in range(600):
        idx = rng.randint(0, len(data), size=(2, cfg.batch_size))
        raw = jnp.asarray(data[idx])
        state, m = step(state, raw, jax.random.PRNGKey(i + 1),
                        jnp.asarray(i > 0))
    err1 = rec_err(state.params, hold)
    assert np.isfinite(err1)
    assert err1 < err0 * 0.2, (err0, err1)


@pytest.mark.slow
def test_ali_samples_move_toward_data_statistics():
    """ali (no reconstruction term): generated samples' mean image should
    approach the data mean as the generator learns."""
    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=32,
                                 dim_latent=8, lr=1e-3)
    model = GanInferenceModel(cfg)
    step, init_state = make_train_step(model)
    state = init_state(model.init(jax.random.PRNGKey(0)))
    data = structured_images(2048)
    data_mean = data.mean(axis=0)
    rng = np.random.RandomState(0)

    def sample_gap(params):
        noise = jax.random.normal(jax.random.PRNGKey(77), (128, 8))
        s = registry.apply(lambda: model.sample(noise), params,
                           jax.random.PRNGKey(78))
        return float(np.abs(np.asarray(s).mean(axis=0) - data_mean).mean())

    gap0 = sample_gap(state.params)
    for i in range(600):
        idx = rng.randint(0, len(data), size=(2, cfg.batch_size))
        raw = jnp.asarray(data[idx])
        state, _ = step(state, raw, jax.random.PRNGKey(i + 1),
                        jnp.asarray(i > 0))
    gap1 = sample_gap(state.params)
    assert gap1 < gap0 * 0.7, (gap0, gap1)
