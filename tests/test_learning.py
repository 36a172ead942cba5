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


def four_cluster_images(n: int, seed: int = 0):
    """4 well-separated clusters: a bright 14x14 quadrant (+noise) per
    cluster — trivially separable, so a working GMGAN must beat chance."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 4, size=n)
    imgs = rng.rand(n, 28, 28).astype("float32") * 0.15
    for i, lab in enumerate(labels):
        r, c = divmod(int(lab), 2)
        imgs[i, r * 14:(r + 1) * 14, c * 14:(c + 1) * 14] += 0.8
    return imgs.reshape(n, 784).clip(0, 1), labels


def _gmgan_clustering_accuracy(mode_k: str, iters: int = 700,
                               threshold: float = 0.45) -> float:
    """Train a tiny GMGAN on the 4-cluster mixture and return unsupervised
    clustering accuracy (max-prob cluster labeling,
    ``gmgan_inference_mnist.py:513-531``).  Chance = 0.25."""
    from graphical_gan_tpu.core.config import gmgan_defaults
    from graphical_gan_tpu.metrics.clustering import clustering_accuracy
    from graphical_gan_tpu.models.gmgan import GMGanModel

    cfg = gmgan_defaults("mnist", "local_ep", dim=8, batch_size=32,
                         dim_latent=8, n_coms=4, lr=1e-3, mode_k=mode_k)
    model = GMGanModel(cfg)
    step, init_state = make_train_step(model)
    state = init_state(model.init(jax.random.PRNGKey(0)))
    data, labels = four_cluster_images(2048)
    rng = np.random.RandomState(0)
    k = cfg.critic_iters

    probs_j = registry.jit_apply(model.cluster_probs)

    def accuracy(params):
        p = np.asarray(probs_j(params, jax.random.PRNGKey(5),
                               jnp.asarray(data[:512])))
        return clustering_accuracy(p, labels[:512])

    for i in range(iters):
        idx = rng.randint(0, len(data), size=(1 + k, cfg.batch_size))
        state, m = step(state, jnp.asarray(data[idx]),
                        jax.random.PRNGKey(i + 1), jnp.asarray(i > 0))
    acc = accuracy(state.params)
    assert np.isfinite(acc)
    assert acc > threshold, (mode_k, acc)
    return acc


@pytest.mark.slow
def test_gmgan_clustering_beats_chance():
    """GMGAN (default CONCRETE Gumbel-softmax k) must beat chance by a
    clear margin — fails on a broken posterior or mixture alignment."""
    _gmgan_clustering_accuracy("CONCRETE")


@pytest.mark.slow
def test_gmgan_clustering_beats_chance_reinforce():
    """MODE_K=REINFORCE: the hard-argmax k plus the score-function
    surrogate (``gmgan_inference_mnist.py:152-153,355-372``,
    ``tflib/objs/discrete_variables.py:4-8``) must still learn to cluster —
    a wrong surrogate sign or a stop_gradient on the wrong side makes the
    component assignment random and this fails."""
    _gmgan_clustering_accuracy("REINFORCE", threshold=0.40)


@pytest.mark.slow
def test_gmgan_clustering_beats_chance_straight_through():
    """MODE_K=STRAIGHT_THROUGHT_CONCRETE: hard one-hot forward with the
    Gumbel-softmax gradient passed straight through
    (``gmgan_inference_mnist.py:156-159``) — a misplaced stop_gradient
    would zero the hyper-path gradient and the accuracy stays at chance."""
    _gmgan_clustering_accuracy("STRAIGHT_THROUGHT_CONCRETE", threshold=0.40)


def moving_blob_videos(n: int, seq_len: int, seed: int = 0) -> np.ndarray:
    """Deterministic 64x64 videos: a bright 8x8 blob sliding with a
    per-video constant velocity — low-dimensional, learnable dynamics."""
    rng = np.random.RandomState(seed)
    vids = np.zeros((n, seq_len, 64, 64), dtype="float32")
    for i in range(n):
        r, c = rng.randint(0, 56, size=2)
        vr, vc = rng.randint(-4, 5, size=2)
        for t in range(seq_len):
            rr = int(np.clip(r + vr * t, 0, 56))
            cc = int(np.clip(c + vc * t, 0, 56))
            vids[i, t, rr:rr + 8, cc:cc + 8] = 1.0
    return vids.reshape(n, seq_len, 64 * 64)


@pytest.mark.slow
def test_ssgan_video_reconstruction_improves():
    """SSGAN local_epce-z (explicit per-frame rec penalty): video rec error
    must fall substantially — fails on a broken scan chain / posterior /
    weighted objective."""
    from graphical_gan_tpu.core.config import ssgan_defaults
    from graphical_gan_tpu.models.ssgan import SSGanModel

    cfg = ssgan_defaults("moving_mnist", "local_epce-z", seq_len=4,
                         dim=8, dim_op=32, dim_latent_g=16, dim_latent_l=4,
                         batch_size=8, n_classes=2, lr=1e-3, lambda_=1.0)
    model = SSGanModel(cfg)
    step, init_state = make_train_step(model)
    state = init_state(model.init(jax.random.PRNGKey(0)))
    vids = moving_blob_videos(256, cfg.seq_len)
    ys = np.random.RandomState(1).randint(0, 2, size=256)
    y1h = np.eye(2, dtype="float32")[ys]
    rng = np.random.RandomState(0)
    k = cfg.critic_iters

    rec_j = registry.jit_apply(model.reconstruct)

    def rec_err(params):
        x = jnp.asarray(vids[:16])
        rec = rec_j(params, jax.random.PRNGKey(9), x, jnp.asarray(y1h[:16]))
        # model I/O is [-1,1]; data is [0,1]
        return float(jnp.mean(jnp.square((rec + 1.0) / 2.0 - x)))

    err0 = rec_err(state.params)
    for i in range(100):    # measured: err falls ~12x by step 100 on CPU
        idx = rng.randint(0, len(vids), size=(1 + k, cfg.batch_size))
        raw = {"x": jnp.asarray(vids[idx]), "y": jnp.asarray(y1h[idx])}
        state, m = step(state, raw, jax.random.PRNGKey(i + 1),
                        jnp.asarray(i > 0))
    err1 = rec_err(state.params)
    assert np.isfinite(err1)
    assert err1 < err0 * 0.5, (err0, err1)


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
