"""Report (grids/gifs/plot/scatter) + metrics (inception math, clustering)."""

import os

import numpy as np
import pytest

from graphical_gan_tpu.metrics.clustering import clustering_accuracy
from graphical_gan_tpu.metrics.inception import (
    get_inception_score, inception_score_from_probs,
)
from graphical_gan_tpu.report.plot import MetricLogger
from graphical_gan_tpu.report.save_images import (
    large_image, save_gifs, save_images,
)


def test_large_image_grid_math():
    # 6 images of 4x4: rows = largest divisor <= sqrt(6) -> 2x3
    x = np.random.RandomState(0).rand(6, 4, 4)
    img = large_image(x)
    assert img.shape == (8, 12)
    assert img.dtype == np.uint8

    img = large_image(x, size=(3, 2))
    assert img.shape == (12, 8)


def test_large_image_bchw_and_flat():
    x = np.random.RandomState(0).rand(4, 3, 5, 5)   # BCHW color
    img = large_image(x)
    assert img.shape == (10, 10, 3)
    flat = np.random.RandomState(0).rand(4, 16)     # flat -> 4x4
    img = large_image(flat)
    assert img.shape == (8, 8)


def test_save_images_and_gifs(tmp_path):
    x = np.random.RandomState(0).rand(4, 1, 8, 8)
    p = save_images(x, str(tmp_path / "grid.png"))
    assert os.path.getsize(p) > 0
    vid = np.random.RandomState(0).rand(4, 3, 1, 8, 8)  # N,T,C,H,W
    p = save_gifs(vid, str(tmp_path / "vid.gif"))
    assert os.path.getsize(p) > 0


def test_metric_logger(tmp_path):
    log = MetricLogger()
    logfile = str(tmp_path / "logfile.txt")
    for i in range(3):
        log.plot("cost", float(i))
        log.tick()
    line = log.flush(str(tmp_path), logfile, render=False)
    assert "cost\t1.0" in line
    assert os.path.isfile(logfile)
    assert log.history("cost") == {0: 0.0, 1: 1.0, 2: 2.0}


def test_inception_score_uniform_is_one():
    """p(y|x) == p(y) for every x => KL = 0 => score = 1."""
    preds = np.full((1000, 10), 0.1)
    mean, std = inception_score_from_probs(preds)
    np.testing.assert_allclose(mean, 1.0, atol=1e-6)
    np.testing.assert_allclose(std, 0.0, atol=1e-6)


def test_inception_score_confident_classifier():
    """Perfectly confident + uniform class coverage => score = n_classes."""
    n, k = 1000, 10
    preds = np.full((n, k), 1e-12)
    for i in range(n):
        preds[i, i % k] = 1.0 - 1e-12 * (k - 1)
    mean, std = inception_score_from_probs(preds)
    np.testing.assert_allclose(mean, k, rtol=1e-3)


def test_inception_score_split_arithmetic():
    """Split means differ from the global mean — verify per-split protocol
    against a direct numpy transliteration of inception_score.py:47-53."""
    rng = np.random.RandomState(0)
    preds = rng.dirichlet(np.ones(5), size=200)
    mean, std = inception_score_from_probs(preds, splits=4)
    scores = []
    for i in range(4):
        part = preds[i * 200 // 4:(i + 1) * 200 // 4]
        kl = part * (np.log(part) - np.log(np.expand_dims(
            np.mean(part, 0), 0)))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    np.testing.assert_allclose(mean, np.mean(scores), rtol=1e-10)
    np.testing.assert_allclose(std, np.std(scores), rtol=1e-10)


def test_get_inception_score_batching():
    calls = []

    def classifier(batch):
        calls.append(batch.shape[0])
        out = np.full((batch.shape[0], 4), 0.25)
        return out

    images = [np.zeros((8, 8, 3)) for _ in range(250)]
    mean, _ = get_inception_score(images, classifier, splits=5)
    assert calls == [100, 100, 50]
    np.testing.assert_allclose(mean, 1.0, atol=1e-6)


def test_clustering_accuracy_perfect():
    """3 clusters perfectly aligned with 3 classes -> accuracy 1."""
    y = np.array([0, 0, 1, 1, 2, 2])
    prob = np.zeros((6, 3))
    cluster_of = [2, 2, 0, 0, 1, 1]   # arbitrary cluster ids per class
    for i, c in enumerate(cluster_of):
        prob[i, c] = 0.9 + 0.01 * i
    assert clustering_accuracy(prob, y) == 1.0


def test_clustering_accuracy_propagation():
    """Max-prob example labels the cluster (gmgan_inference_mnist.py:521-530)."""
    y = np.array([0, 1, 1])
    prob = np.array([
        [0.9, 0.1],
        [0.8, 0.2],
        [0.3, 0.7],
    ])
    # cluster 0's max-prob example is idx0 (label 0); cluster 1's is idx2
    # (label 1). predictions: [0, 0, 1] -> accuracy 2/3
    np.testing.assert_allclose(clustering_accuracy(prob, y), 2 / 3)


def test_scatter_with_mus_overlay(tmp_path):
    from graphical_gan_tpu.report.visualization import scatter
    rng = np.random.RandomState(0)
    data = rng.randn(50, 2)
    label = rng.randint(0, 3, 50)
    mus = rng.randn(3, 2)
    p = scatter(data, label, str(tmp_path), "s.png", mus=mus)
    assert os.path.getsize(p) > 0
    assert os.path.getsize(os.path.join(str(tmp_path), "mus_s.png")) > 0
    # 2-D one-hot labels are argmaxed (visualization.py:12-13 parity)
    onehot = np.eye(3)[label]
    scatter(data, onehot, str(tmp_path), "s2.png")


def test_keystream_determinism_and_restore():
    import jax
    from graphical_gan_tpu.core.rng import KeyStream
    a = KeyStream(7)
    k1, k2 = a.next(), a.next()
    b = KeyStream(7)
    np.testing.assert_array_equal(np.asarray(b.next()), np.asarray(k1))
    # restore resumes mid-stream
    c = KeyStream(7)
    c.restore(a.state() - 1)
    np.testing.assert_array_equal(np.asarray(c.next()), np.asarray(k2))
    assert not np.array_equal(np.asarray(k1), np.asarray(KeyStream(8).next()))
