"""Real-dataset on-disk loader branches, exercised in CI.

Every loader falls back to synthetic data when offline, so the REAL-file
branches (the reference's acquisition protocols — ``tflib/mnist.py:50-55``,
``tflib/cifar10.py``, ``tflib/svhn.py:9-16``, ``tflib/celebA.py:43-73``,
``tflib/chairs.py:61-83``) previously ran only against actual downloads.
These tests write tiny fixtures shaped EXACTLY like each dataset's on-disk
artifact and load them with ``synthetic_fallback=False``, so the
non-fallback parse/convert/split paths are pinned without network access.
"""

import gzip
import os
import pickle

import numpy as np
import pytest


def _batches(gen, n=2):
    out = []
    for i, b in enumerate(gen()):
        out.append(b)
        if i + 1 >= n:
            break
    return out


# -- mnist.pkl.gz -------------------------------------------------------------

def test_mnist_pickle_fixture(tmp_path):
    from graphical_gan_tpu.data import mnist
    rng = np.random.RandomState(0)
    splits = []
    for n in (40, 20, 20):
        splits.append((rng.rand(n, 784).astype(np.float32),
                       rng.randint(0, 10, size=n).astype(np.int64)))
    path = str(tmp_path / "mnist.pkl.gz")
    with gzip.open(path, "wb") as f:
        pickle.dump(tuple(splits), f, protocol=2)

    train, dev, test = mnist.load(10, 10, path=path,
                                  synthetic_fallback=False)
    xb, yb = _batches(train, 1)[0]
    assert xb.shape == (10, 784) and xb.dtype == np.float32
    assert yb.shape == (10,)
    # content flows through: every batch row exists in the fixture
    assert any(np.allclose(xb[0], row) for row in splits[0][0])


def test_mnist_idx_fixture(tmp_path):
    """The 4-file idx fallback protocol (train/test images + labels)."""
    from graphical_gan_tpu.data import mnist
    rng = np.random.RandomState(1)

    def write_idx_images(path, arr):  # idx3: magic 2051, dims
        with gzip.open(path, "wb") as f:
            n, h, w = arr.shape
            f.write((2051).to_bytes(4, "big") + n.to_bytes(4, "big")
                    + h.to_bytes(4, "big") + w.to_bytes(4, "big"))
            f.write(arr.astype(np.uint8).tobytes())

    def write_idx_labels(path, arr):  # idx1: magic 2049
        with gzip.open(path, "wb") as f:
            f.write((2049).to_bytes(4, "big") + len(arr).to_bytes(4, "big"))
            f.write(arr.astype(np.uint8).tobytes())

    tx = rng.randint(0, 256, size=(30, 28, 28))
    ty = rng.randint(0, 10, size=30)
    ex = rng.randint(0, 256, size=(20, 28, 28))
    ey = rng.randint(0, 10, size=20)
    write_idx_images(str(tmp_path / "train-images-idx3-ubyte.gz"), tx)
    write_idx_labels(str(tmp_path / "train-labels-idx1-ubyte.gz"), ty)
    write_idx_images(str(tmp_path / "t10k-images-idx3-ubyte.gz"), ex)
    write_idx_labels(str(tmp_path / "t10k-labels-idx1-ubyte.gz"), ey)

    data = mnist._load_idx_dir(str(tmp_path))
    (train_x, train_y), (dev_x, dev_y), (test_x, test_y) = data
    assert train_x.shape[1] == 784
    assert len(train_x) + len(dev_x) == 30        # dev split off the train
    assert len(test_x) == 20
    assert train_x.max() <= 1.0 + 1e-6            # [0,1] scaling applied


# -- cifar batches ------------------------------------------------------------

def test_cifar10_batches_fixture(tmp_path):
    from graphical_gan_tpu.data import cifar10
    rng = np.random.RandomState(2)
    rows = {}
    for fn in cifar10.TRAIN_FILES + cifar10.TEST_FILES:
        x = rng.randint(0, 256, size=(20, 3072)).astype(np.uint8)
        y = rng.randint(0, 10, size=20).tolist()
        with open(tmp_path / fn, "wb") as f:
            pickle.dump({"data": x, "labels": y}, f, protocol=2)
        rows[fn] = x

    train, test = cifar10.load(10, str(tmp_path), synthetic_fallback=False)
    xb, yb = _batches(train, 1)[0]
    assert xb.shape == (10, 3072) and xb.dtype == np.int32
    assert yb.shape == (10,)
    # 5 train batches concatenated
    total = sum(1 for _ in train())
    assert total == 100 // 10

    # the fixed seed-1234 reconstruction subset comes from test_batch
    rec = cifar10.get_reconstruction_data(8, str(tmp_path))
    assert rec.shape == (8, 3072)
    test_rows = {r.tobytes() for r in rows["test_batch"].astype(np.int32)}
    assert all(np.asarray(r, np.int32).tobytes() in test_rows for r in rec)


# -- svhn .mat ----------------------------------------------------------------

def test_svhn_mat_fixture(tmp_path):
    from scipy.io import savemat
    from graphical_gan_tpu.data import svhn
    rng = np.random.RandomState(3)
    for name, n in (("train_32x32.mat", 24), ("test_32x32.mat", 12)):
        x = rng.randint(0, 256, size=(32, 32, 3, n)).astype(np.uint8)
        y = rng.randint(1, 11, size=(n, 1)).astype(np.uint8)  # 10 == '0'
        savemat(str(tmp_path / name), {"X": x, "y": y})

    train, test = svhn.load(12, str(tmp_path), synthetic_fallback=False)
    xb, yb = _batches(train, 1)[0]
    assert xb.shape == (12, 3072)
    assert yb.min() >= 0 and yb.max() <= 9       # the 10->0 remap applied


# -- celebA npy ---------------------------------------------------------------

def test_celeba_npy_fixture(tmp_path):
    from graphical_gan_tpu.data import celeba
    rng = np.random.RandomState(4)
    data = rng.randint(0, 256, size=(50, 3, 64, 64)).astype(np.uint8)
    np.save(tmp_path / "celebA_64x64.npy", data)

    train, test = celeba.load(10, str(tmp_path), num_dev=20,
                              synthetic_fallback=False)
    xb = _batches(train, 1)[0]
    xb = xb[0] if isinstance(xb, tuple) else xb
    assert xb.shape == (10, 3 * 64 * 64)
    assert sum(1 for _ in train()) == 3          # 30 train rows / batch 10
    assert sum(1 for _ in test()) == 2           # 20 dev rows


def test_celeba_converter_roundtrip(tmp_path):
    """convert_to_numpy: jpgs -> center-cropped NCHW uint8 npy."""
    pytest.importorskip("PIL")
    from PIL import Image
    from graphical_gan_tpu.data import celeba
    rng = np.random.RandomState(5)
    for i in range(3):
        arr = rng.randint(0, 256, size=(218, 178, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i:06d}.jpg")
    out = str(tmp_path / "celebA_64x64.npy")
    celeba.convert_to_numpy(str(tmp_path), out)
    data = np.load(out)
    assert data.shape == (3, 3, 64, 64) and data.dtype == np.uint8


# -- chairs npy ---------------------------------------------------------------

def test_chairs_npy_fixture(tmp_path):
    from graphical_gan_tpu.data import chairs
    rng = np.random.RandomState(6)
    size = 16
    data = rng.randint(0, 256, size=(8, 31, size, size, 3)).astype(np.uint8)
    np.save(tmp_path / f"chairs_{size}.npy", data)

    train, dev = chairs.load(4, 2, size=size, data_dir=str(tmp_path),
                             num_dev=2, synthetic_fallback=False)
    xb = _batches(train, 1)[0]
    assert xb.shape == (2, 4, size * size * 3)   # [B, seq, flat NCHW]
    assert xb.dtype == np.float32

    # seq_length=31 returns whole sequences; 1 draws single frames
    train31, _ = chairs.load(31, 2, size=size, data_dir=str(tmp_path),
                             num_dev=2, synthetic_fallback=False)
    assert _batches(train31, 1)[0].shape == (2, 31, size * size * 3)


def test_chairs_converter(tmp_path):
    """convert_to_numpy: per-chair render dirs -> (N,31,s,s,3) npy."""
    pytest.importorskip("PIL")
    from PIL import Image
    from graphical_gan_tpu.data import chairs
    rng = np.random.RandomState(7)
    for chair in ("chair_a", "chair_b"):
        d = tmp_path / chair / "renders"
        os.makedirs(d)
        for j in range(31):
            arr = rng.randint(0, 256, size=(600, 600, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"r{j:02d}.png")
    out = chairs.convert_to_numpy(str(tmp_path), size=16)
    data = np.load(out)
    # the converter's documented artifact is int32 (the loader casts)
    assert data.shape == (2, 31, 16, 16, 3) and data.dtype == np.int32
    assert 0 <= data.min() and data.max() <= 255
