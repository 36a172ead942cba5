"""FID metric and device-prefetch iterator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.data.prefetch import prefetch_to_device
from graphical_gan_tpu.metrics.fid import (
    compute_fid, fid_from_features, frechet_distance, gaussian_stats,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, s = gaussian_stats(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_frechet_distance_mean_shift():
    """For equal covariances, FID == ||mu1-mu2||^2 exactly."""
    rng = np.random.RandomState(1)
    f = rng.randn(2000, 8)
    mu, s = gaussian_stats(f)
    mu2 = mu + 3.0
    np.testing.assert_allclose(frechet_distance(mu, s, mu2, s),
                               float(((mu - mu2) ** 2).sum()), rtol=1e-6)


def test_frechet_distance_known_1d():
    """1-D closed form: (m1-m2)^2 + (s1-s2)^2 for stds s1, s2."""
    d = frechet_distance([0.0], [[4.0]], [1.0], [[1.0]])
    np.testing.assert_allclose(d, 1.0 + (2.0 - 1.0) ** 2, rtol=1e-6)


def test_fid_from_features_sensitivity():
    rng = np.random.RandomState(2)
    a = rng.randn(1000, 8)
    b_close = a + rng.randn(1000, 8) * 0.01
    b_far = a + 5.0
    assert fid_from_features(a, b_close) < 0.1
    assert fid_from_features(a, b_far) > 10.0


def test_compute_fid_with_metric_classifier():
    from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier
    clf = MetricClassifier(image_hw=(8, 8), channels=3, n_classes=2, dim=8)
    params = clf.init(jax.random.PRNGKey(0))
    feat = clf.as_feature_fn(params)
    rng = np.random.RandomState(0)
    imgs_a = rng.randint(0, 255, size=(200, 8, 8, 3))
    imgs_b = rng.randint(0, 255, size=(200, 8, 8, 3))
    imgs_dark = rng.randint(0, 40, size=(200, 8, 8, 3))
    fid_same = compute_fid(imgs_a, imgs_b, feat, batch_size=64)
    fid_diff = compute_fid(imgs_a, imgs_dark, feat, batch_size=64)
    assert fid_same < fid_diff
    assert np.isfinite(fid_same) and np.isfinite(fid_diff)


def test_prefetch_preserves_order_and_values():
    data = [np.full((2, 3), i, dtype=np.float32) for i in range(7)]
    out = list(prefetch_to_device(iter(data), size=3))
    assert len(out) == 7
    for i, x in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), data[i])


def test_prefetch_pytree_batches():
    data = [{"x": np.ones((2,)) * i, "y": np.asarray([i])} for i in range(3)]
    out = list(prefetch_to_device(iter(data)))
    assert [int(o["y"][0]) for o in out] == [0, 1, 2]
    assert isinstance(out[0]["x"], jax.Array)


def test_prefetch_propagates_exceptions():
    def gen():
        yield np.ones((2,))
        raise RuntimeError("loader broke")

    it = prefetch_to_device(gen())
    next(it)
    with pytest.raises(RuntimeError, match="loader broke"):
        list(it)


def test_prefetch_abandonment_releases_worker():
    """Breaking out of the consumer must unblock and stop the worker."""
    import threading
    import time as _time

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield np.ones((2,)) * i

    before = threading.active_count()
    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()  # abandon
    _time.sleep(0.5)
    # worker exits (thread count returns to baseline) and production stops
    assert threading.active_count() <= before + 1
    n = len(produced)
    _time.sleep(0.3)
    assert len(produced) <= n + 3  # no unbounded production after close


def test_fid_rejects_ill_conditioned():
    """Rank-deficient covariances with a strongly complex sqrtm raise
    instead of returning a corrupted score (or pass through the eps
    retry) — either way, never a silent garbage value."""
    rng = np.random.RandomState(0)
    # 10 samples in 64-D: wildly rank-deficient
    a = rng.randn(10, 64)
    b = rng.randn(10, 64)
    try:
        val = fid_from_features(a, b)
        assert np.isfinite(val) and val >= -1e-6
    except ValueError as e:
        assert "complex" in str(e)
