"""Tests for the MNIST IDX reader, pooling, and synthetic stand-in."""

import gzip
import os
import struct

import numpy as np
import pytest

from tensornetworkforml_tpu.data.mnist import (
    _read_idx,
    get_MNIST_dataset,
    max_pool_2x2,
    synthetic_mnist,
)


def _write_idx_images(path, arr, gz=False):
    header = struct.pack(">HBB", 0, 0x08, arr.ndim) + struct.pack(
        ">" + "I" * arr.ndim, *arr.shape
    )
    payload = header + arr.astype(">u1").tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as fh:
        fh.write(payload)


def test_idx_roundtrip(tmp_path):
    imgs = np.random.default_rng(0).integers(0, 256, (7, 28, 28),
                                             dtype=np.uint8)
    p = str(tmp_path / "imgs-idx3-ubyte")
    _write_idx_images(p, imgs)
    np.testing.assert_array_equal(_read_idx(p), imgs)
    # gzipped variant
    pz = str(tmp_path / "imgs-idx3-ubyte.gz")
    _write_idx_images(pz, imgs, gz=True)
    np.testing.assert_array_equal(_read_idx(pz), imgs)


def test_get_mnist_dataset_from_idx_dir(tmp_path):
    rng = np.random.default_rng(1)
    tr_i = rng.integers(0, 256, (10, 28, 28), dtype=np.uint8)
    tr_l = rng.integers(0, 10, (10,), dtype=np.uint8)
    te_i = rng.integers(0, 256, (4, 28, 28), dtype=np.uint8)
    te_l = rng.integers(0, 10, (4,), dtype=np.uint8)
    _write_idx_images(str(tmp_path / "train-images-idx3-ubyte"), tr_i)
    _write_idx_images(str(tmp_path / "train-labels-idx1-ubyte"), tr_l)
    # mixed raw/gz and torchvision-style subdirectory
    os.makedirs(tmp_path / "MNIST" / "raw")
    _write_idx_images(
        str(tmp_path / "MNIST" / "raw" / "t10k-images-idx3-ubyte.gz"),
        te_i, gz=True,
    )
    _write_idx_images(str(tmp_path / "t10k-labels-idx1-ubyte"), te_l)

    a, b, c, d = get_MNIST_dataset(str(tmp_path))
    np.testing.assert_array_equal(a, tr_i.astype(np.float64))
    np.testing.assert_array_equal(b, tr_l)
    np.testing.assert_array_equal(c, te_i.astype(np.float64))
    np.testing.assert_array_equal(d, te_l)


def test_get_mnist_dataset_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="synthetic_mnist"):
        get_MNIST_dataset(str(tmp_path / "nope"))


def test_max_pool_2x2_semantics():
    x = np.arange(16, dtype=float).reshape(1, 4, 4)
    out = max_pool_2x2(x)
    np.testing.assert_array_equal(out[0], [[5, 7], [13, 15]])


def test_synthetic_mnist_shapes_and_determinism():
    a1, y1, b1, z1 = synthetic_mnist(100, 20)
    a2, y2, b2, z2 = synthetic_mnist(100, 20)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(y1, y2)
    assert a1.shape == (100, 28, 28)
    assert a1.min() >= 0 and a1.max() <= 255
    assert set(np.unique(y1)) <= set(range(10))


def test_cifar_batch_roundtrip(tmp_path):
    """CIFAR-10 binary batch parsing + grayscale conversion."""
    import os

    from tensornetworkforml_tpu.data.cifar import (
        get_CIFAR10_grayscale,
        rgb_to_gray,
        synthetic_cifar10,
    )

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "cifar-10-batches-bin")
    records = {}
    for name, n in [(f"data_batch_{i}.bin", 6) for i in range(1, 6)] + [
        ("test_batch.bin", 4)
    ]:
        labels = rng.integers(0, 10, n, dtype=np.uint8)
        imgs = rng.integers(0, 256, (n, 3072), dtype=np.uint8)
        raw = np.concatenate([labels[:, None], imgs], axis=1)
        (tmp_path / "cifar-10-batches-bin" / name).write_bytes(raw.tobytes())
        records[name] = (imgs, labels)

    tr_x, tr_y, te_x, te_y = get_CIFAR10_grayscale(str(tmp_path))
    assert tr_x.shape == (30, 32, 32) and te_x.shape == (4, 32, 32)
    assert tr_x.min() >= 0 and tr_x.max() <= 1.0
    imgs, labels = records["test_batch.bin"]
    np.testing.assert_array_equal(te_y, labels)
    want = rgb_to_gray(
        imgs.reshape(-1, 3, 32, 32).astype(np.float64)
    ) / 255.0
    np.testing.assert_allclose(te_x, want, rtol=1e-12)

    a, y1, b, y2 = synthetic_cifar10(50, 10)
    assert a.shape == (50, 32, 32) and a.max() <= 1.0
