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


# ---------------------------------------------------------------------------
# Native batcher (multithreaded row gather, native/batcher.cc)
# ---------------------------------------------------------------------------

batcher_native = pytest.mark.skipif(
    not native_available("batcher"), reason="no C++ toolchain available")


@batcher_native
@pytest.mark.parametrize("dtype", ["uint8", "float32", "int32", "float64"])
def test_gather_rows_matches_numpy(dtype):
    from graphical_gan_tpu.native import gather_rows_native
    rng = np.random.RandomState(0)
    a = (rng.rand(500, 321) * 100).astype(dtype)
    idx = rng.randint(0, 500, size=130)
    out = gather_rows_native(a, idx)
    assert out is not None and out.dtype == a.dtype
    np.testing.assert_array_equal(out, a[idx])


@batcher_native
def test_gather_rows_nd_and_empty():
    from graphical_gan_tpu.native import gather_rows_native
    rng = np.random.RandomState(1)
    a = rng.rand(64, 3, 32, 32).astype("float32")
    idx = rng.permutation(64)[:17]
    np.testing.assert_array_equal(gather_rows_native(a, idx), a[idx])
    empty = gather_rows_native(a, np.zeros((0,), np.int64))
    assert empty.shape == (0, 3, 32, 32)


@batcher_native
def test_gather_rows_rejects_out_of_range():
    from graphical_gan_tpu.native import gather_rows_native
    a = np.zeros((4, 8), np.float32)
    with pytest.raises(IndexError):
        gather_rows_native(a, np.array([0, 4], np.int64))
    with pytest.raises(IndexError):
        gather_rows_native(a, np.array([0, -5], np.int64))


@batcher_native
def test_gather_rows_wraps_negative_indices_like_numpy():
    # numpy's a[idx] wraps in-range negatives; the native path must match
    # so take_rows semantics don't depend on host core count (ADVICE r3).
    from graphical_gan_tpu.native import gather_rows_native
    rng = np.random.RandomState(3)
    a = rng.rand(32, 8).astype("float32")
    idx = np.array([0, -1, 5, -32, -7, 31], np.int64)
    np.testing.assert_array_equal(gather_rows_native(a, idx), a[idx])


@batcher_native
def test_gather_rows_validates_out():
    from graphical_gan_tpu.native import gather_rows_native
    rng = np.random.RandomState(4)
    a = rng.rand(16, 8).astype("float32")
    idx = np.arange(5, dtype=np.int64)
    good = np.empty((5, 8), np.float32)
    np.testing.assert_array_equal(gather_rows_native(a, idx, out=good), a[idx])
    with pytest.raises(ValueError):
        gather_rows_native(a, idx, out=np.empty((5, 8), np.float64))
    with pytest.raises(ValueError):
        gather_rows_native(a, idx, out=np.empty((4, 8), np.float32))
    with pytest.raises(ValueError):
        gather_rows_native(a, idx,
                           out=np.empty((8, 5), np.float32).T)


@batcher_native
def test_gather_rows_threaded_path_large():
    # Force the multithreaded branch (> 1 MiB) and check exactness.
    from graphical_gan_tpu.native import gather_rows_native
    rng = np.random.RandomState(2)
    a = rng.randint(0, 256, size=(4096, 2048)).astype("uint8")
    idx = rng.randint(0, 4096, size=3000)
    np.testing.assert_array_equal(gather_rows_native(a, idx), a[idx])


def test_take_rows_fallback_matches_numpy(monkeypatch):
    # With the native fn unavailable, take_rows must be plain a[idx].
    from graphical_gan_tpu.native import batcher_ext
    monkeypatch.setattr(batcher_ext, "_fn", lambda: None)
    rng = np.random.RandomState(3)
    a = rng.rand(2048, 1024).astype("float32")  # above NATIVE_MIN_BYTES
    idx = rng.randint(0, 2048, size=512)
    np.testing.assert_array_equal(batcher_ext.take_rows(a, idx), a[idx])


@batcher_native
def test_epoch_batches_native_equals_reference_protocol(monkeypatch):
    # The loader protocol (paired shuffle + gather) must be byte-identical
    # whichever gather backend runs: same seed => same batches.  Force the
    # native dispatch (it requires >= 2 threads + a large transfer, which
    # the 1-core CI host would otherwise never satisfy).
    from graphical_gan_tpu.data.common import epoch_batches
    from graphical_gan_tpu.native import batcher_ext
    monkeypatch.setenv("GGAN_BATCHER_THREADS", "4")
    monkeypatch.setattr(batcher_ext, "NATIVE_MIN_BYTES", 1)
    rng = np.random.RandomState(7)
    x = rng.randint(0, 256, size=(1000, 3072)).astype("uint8")
    y = rng.randint(0, 10, size=(1000,)).astype("int64")

    got = list(epoch_batches(64, x, y, rng=np.random.RandomState(5)))
    # Reference gather: force numpy
    orig = batcher_ext.take_rows
    try:
        batcher_ext.take_rows = lambda a, idx: a[idx]
        want = list(epoch_batches(64, x, y, rng=np.random.RandomState(5)))
    finally:
        batcher_ext.take_rows = orig
    assert len(got) == len(want) == 1000 // 64
    for (gx, gy), (wx, wy) in zip(got, want):
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)
