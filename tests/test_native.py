"""Native (C++) moving-MNIST synthesizer: build, correctness properties,
determinism, and speed sanity vs the numpy path."""

import time

import numpy as np
import pytest

from graphical_gan_tpu.data import moving_mnist
from graphical_gan_tpu.native import native_available, synthesize_batch_native


pytestmark = pytest.mark.skipif(
    not native_available("moving_mnist"),
    reason="no C++ toolchain available")


def test_native_synthesis_properties():
    rng = np.random.RandomState(0)
    digits = (rng.rand(8, 28, 28) > 0.5).astype("float32") * 0.7
    out = synthesize_batch_native(digits, 16, seed=123)
    assert out is not None and out.shape == (8, 16, 4096)
    frames = out.reshape(8, 16, 64, 64)
    # mass conservation: each frame contains exactly the digit's mass
    np.testing.assert_allclose(
        frames.sum(axis=(2, 3)),
        np.broadcast_to(digits.sum(axis=(1, 2))[:, None], (8, 16)),
        rtol=1e-4)
    # motion: frames differ over time
    assert (frames[:, 0] != frames[:, 1]).any(axis=(1, 2)).all()
    # bounds: nothing outside the canvas (implied by shape, but check no
    # wrap artifacts: column/row sums at borders are finite)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0


def test_native_determinism_and_seed_sensitivity():
    digits = np.ones((4, 28, 28), np.float32)
    a = synthesize_batch_native(digits, 8, seed=7)
    b = synthesize_batch_native(digits, 8, seed=7)
    c = synthesize_batch_native(digits, 8, seed=8)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_native_speed_vs_numpy():
    rng = np.random.RandomState(0)
    digits = rng.rand(256, 28, 28).astype("float32")
    # warm both paths
    synthesize_batch_native(digits[:8], 16, seed=0)
    moving_mnist.synthesize_batch(np.random.RandomState(0), digits[:8], 16)

    # best-of-N to be robust against CPU contention from parallel test runs
    t_native = min(
        _timed(lambda: synthesize_batch_native(digits, 16, seed=1))
        for _ in range(5))
    t_numpy = min(
        _timed(lambda: moving_mnist.synthesize_batch(
            np.random.RandomState(1), digits, 16))
        for _ in range(5))

    # the native path must not be slower (usually several x faster)
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_loader_uses_native_path():
    train, _ = moving_mnist.load_video(4, 8)
    x, y = next(iter(train()))
    assert x.shape == (8, 4, 4096)
    assert x.min() >= 0.0 and x.max() <= 1.0
