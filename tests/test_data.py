"""Data layer: loader protocols, shuffling, moving-MNIST synthesis laws,
on-device sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.data import (
    celeba, chairs, cifar10, common, mnist, moving_mnist, ondevice, svhn,
)


def test_paired_shuffle_keeps_alignment():
    rng = np.random.RandomState(0)
    x = np.arange(100).reshape(100, 1).copy()
    y = np.arange(100).copy()
    common.paired_shuffle(rng, x, y)
    np.testing.assert_array_equal(x[:, 0], y)
    assert not np.array_equal(y, np.arange(100))  # actually shuffled


def test_generator_factory_protocol():
    x = np.arange(10).reshape(10, 1)
    y = np.arange(10)
    factory = common.generator_factory(3, x, y, seed=0)
    b1 = list(factory())
    b2 = list(factory())
    assert len(b1) == 3            # drop remainder
    for bx, by in b1:
        assert bx.shape == (3, 1) and by.shape == (3,)
        np.testing.assert_array_equal(bx[:, 0], by)
    # fresh epoch reshuffles
    flat1 = np.concatenate([b[1] for b in b1])
    flat2 = np.concatenate([b[1] for b in b2])
    assert not np.array_equal(flat1, flat2)


def test_mnist_synthetic_fallback():
    train, dev, test = mnist.load(8, 8, path="/nonexistent/mnist.pkl.gz",
                                  synthetic_sizes=(64, 32, 32))
    x, y = next(iter(train()))
    assert x.shape == (8, 784) and x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    assert y.shape == (8,)


def test_cifar10_loader_and_recon_data():
    train, test = cifar10.load(16, data_dir=None, synthetic_sizes=(64, 32))
    x, y = next(iter(train()))
    assert x.shape == (16, 3072) and x.dtype == np.int32
    rec = cifar10.get_reconstruction_data(10)
    rec2 = cifar10.get_reconstruction_data(10)
    np.testing.assert_array_equal(rec, rec2)  # fixed seed 1234


def test_svhn_celeba_chairs_fallbacks():
    tr, te = svhn.load(4, data_dir="/nonexistent", synthetic_sizes=(16, 8))
    x, y = next(iter(tr()))
    assert x.shape == (4, 3072)

    tr, te = celeba.load(4, data_dir=None, num_dev=8, synthetic_size=32)
    x = next(iter(tr()))
    assert x.shape == (4, 64 * 64 * 3)

    tr, te = chairs.load(31, 2, data_dir=None, num_dev=4, synthetic_size=16)
    x = next(iter(tr()))
    assert x.shape == (2, 31, 64 * 64 * 3)
    tr4, _ = chairs.load(4, 2, data_dir=None, num_dev=4, synthetic_size=16)
    assert next(iter(tr4())).shape == (2, 4, 64 * 64 * 3)
    tr1, _ = chairs.load(1, 2, data_dir=None, num_dev=4, synthetic_size=16)
    assert next(iter(tr1())).shape == (2, 64 * 64 * 3)


def test_chairs_offline_converter(tmp_path):
    # Synthetic rendered-chairs layout: 2 chairs x 31 azimuth pngs, 600x600
    # (the fixed [140:460,140:460] crop assumes the real renders' size).
    from PIL import Image
    rng = np.random.RandomState(0)
    for chair in ("chair_a", "chair_b"):
        d = tmp_path / chair / "renders"
        d.mkdir(parents=True)
        for i in range(31):
            img = rng.randint(0, 256, size=(600, 600, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i:03d}.png")
    out = chairs.convert_to_numpy(str(tmp_path), size=32)
    arr = np.load(out)
    assert arr.shape == (2, 31, 32, 32, 3) and arr.dtype == np.int32
    assert 0 <= arr.min() and arr.max() <= 255
    # round-trips through the loader (which transposes to NCHW + flattens)
    tr, te = chairs.load(31, 1, size=32, data_dir=str(tmp_path), num_dev=1,
                         synthetic_fallback=False)
    x = next(iter(tr()))
    assert x.shape == (1, 31, 32 * 32 * 3)

    # crop law: a render with a unique pixel at (140,140) maps it to (0,0)
    img = np.zeros((600, 600, 3), np.uint8)
    img[140:460, 140:460] = 7
    cropped = chairs.center_crop(img, 32)
    assert (cropped == 7).all()


def test_moving_mnist_trajectory_laws():
    rng = np.random.RandomState(0)
    top, left = moving_mnist.random_trajectory(rng, 100, 16)
    assert top.shape == (16, 100)
    assert top.min() >= 0 and top.max() <= 36   # canvas = 64-28
    assert left.min() >= 0 and left.max() <= 36
    # speed bound: 0.1 * canvas = 3.6 px/step
    assert np.abs(np.diff(top.astype(int), axis=0)).max() <= 4


def test_moving_mnist_synthesis():
    rng = np.random.RandomState(0)
    digits = np.ones((3, 28, 28), np.float32) * 0.5
    vids = moving_mnist.synthesize_batch(rng, digits, 5)
    assert vids.shape == (3, 5, 64 * 64)
    frames = vids.reshape(3, 5, 64, 64)
    # each frame contains exactly the digit's mass
    np.testing.assert_allclose(frames.sum(axis=(2, 3)), 0.5 * 28 * 28,
                               rtol=1e-5)
    # digit moves between frames
    assert (frames[:, 0] != frames[:, 1]).any()


def test_moving_mnist_load_video_protocol():
    train, test = moving_mnist.load_video(4, 8)
    x, y = next(iter(train()))
    assert x.shape == (8, 4, 4096) and x.dtype == np.float32
    assert y.shape == (8,)
    assert x.min() >= 0.0 and x.max() <= 1.0


def test_moving_mnist_load_image_protocol():
    train, test = moving_mnist.load_image(4, 8)
    x, y = next(iter(train()))
    assert x.shape == (8, 4096)
    assert y.shape == (8,)


def test_ondevice_sampling():
    data = jnp.arange(40).reshape(10, 4).astype(jnp.float32)
    out = ondevice.sample_batches(data, jax.random.PRNGKey(0), 3, 5)
    assert out.shape == (3, 5, 4)
    # every sampled row must be an actual dataset row
    rows = np.asarray(out).reshape(-1, 4)
    base = np.asarray(data)
    for r in rows:
        assert (r == base).all(axis=1).any()
    # deterministic per key
    out2 = ondevice.sample_batches(data, jax.random.PRNGKey(0), 3, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
