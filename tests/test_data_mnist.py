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


def test_idx_hand_crafted_bytes(tmp_path):
    """Byte-literal IDX fixture (NOT produced by our own writer): catches
    reader/writer shared misunderstandings of the format. The dimension
    300 = 0x012C spans two bytes, so a little-endian misread would return
    shape (11264...,) garbage, and the pixel payload has a pinned
    checksum."""
    # magic: 2 zero bytes, dtype 0x08 (ubyte), ndim 3; dims 300, 2, 3
    header = bytes([0, 0, 0x08, 3,
                    0, 0, 0x01, 0x2C,   # 300 big-endian
                    0, 0, 0, 2,
                    0, 0, 0, 3])
    payload = bytes(range(256)) * 7 + bytes(8)  # 300*2*3 = 1800 bytes
    p = str(tmp_path / "crafted-idx3-ubyte")
    with open(p, "wb") as fh:
        fh.write(header + payload)
    arr = _read_idx(p)
    assert arr.shape == (300, 2, 3)
    assert arr.dtype == np.uint8
    assert arr[0, 0, 0] == 0 and arr[0, 0, 2] == 2 and arr[1, 0, 0] == 6
    assert int(arr.sum()) == 228480  # 7 * sum(0..255)
    # labels-style 1-D fixture with a >255 dimension too
    lheader = bytes([0, 0, 0x08, 1, 0, 0, 0x01, 0x04])  # 260 items
    lpayload = bytes([i % 10 for i in range(260)])
    pl = str(tmp_path / "crafted-idx1-ubyte")
    with open(pl, "wb") as fh:
        fh.write(lheader + lpayload)
    labels = _read_idx(pl)
    assert labels.shape == (260,)
    assert labels[0] == 0 and labels[259] == 9 and int(labels.sum()) == 1170


def test_idx_int32_big_endian_payload(tmp_path):
    """Multi-byte element dtype (0x0C = int32): payload bytes are
    big-endian; a native-endian misread returns wildly different values."""
    header = bytes([0, 0, 0x0C, 1, 0, 0, 0, 2])
    payload = bytes([0, 0, 0x01, 0x00,   # 256
                     0xFF, 0xFF, 0xFF, 0xFE])  # -2
    p = str(tmp_path / "crafted-idx-int32")
    with open(p, "wb") as fh:
        fh.write(header + payload)
    arr = _read_idx(p)
    assert arr.shape == (2,)
    assert int(arr[0]) == 256 and int(arr[1]) == -2


# Well-known invariants of the genuine MNIST distribution files: first ten
# train labels / test labels, counts, and image magic. Gated on the real
# files being present; this is the readiness check for the
# Stoudenmire-Schwab 99.03% @ m=120 north-star replication run
# (BASELINE.json; reference paper section 4).
_REAL_DIRS = ("./datasets", "/root/datasets", "/root/data",
              os.environ.get("MNIST_DIR", ""))


def _find_real_mnist():
    from tensornetworkforml_tpu.data.mnist import _find

    for d in _REAL_DIRS:
        if d and _find(d, "train-images-idx3-ubyte"):
            return d
    return None


def test_real_mnist_invariants_when_present():
    d = _find_real_mnist()
    if d is None:
        pytest.skip("real MNIST IDX files not present in this environment")
    tr_x, tr_y, te_x, te_y = get_MNIST_dataset(d)
    assert tr_x.shape == (60000, 28, 28) and te_x.shape == (10000, 28, 28)
    np.testing.assert_array_equal(tr_y[:10], [5, 0, 4, 1, 9, 2, 1, 3, 1, 4])
    np.testing.assert_array_equal(te_y[:10], [7, 2, 1, 0, 4, 1, 4, 9, 5, 9])
    assert 0 <= tr_x.min() and tr_x.max() == 255.0


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


def test_mnist_verify_checksums(tmp_path):
    """Checksum self-test (VERDICT r4 item 8): synthetic-but-canonical-
    geometry files report shape-ok, wrong geometry reports mismatch,
    absent files report missing; a pristine gz whose md5 matches the
    published torchvision constant reports ok (validated here by writing
    a file and checking against its OWN md5 via monkeypatch-free
    comparison of the code path)."""
    import hashlib

    from tensornetworkforml_tpu.data import mnist as m

    # all missing
    assert set(m.verify_checksums(str(tmp_path)).values()) == {"missing"}

    rng = np.random.default_rng(0)
    _write_idx_images(
        str(tmp_path / "train-images-idx3-ubyte"),
        rng.integers(0, 256, (60000, 28, 28), dtype=np.uint8),
    )
    _write_idx_images(
        str(tmp_path / "train-labels-idx1-ubyte"),
        rng.integers(0, 10, (60000,), dtype=np.uint8),
    )
    _write_idx_images(  # wrong count -> mismatch
        str(tmp_path / "t10k-images-idx3-ubyte"),
        rng.integers(0, 256, (8, 28, 28), dtype=np.uint8),
    )
    out = m.verify_checksums(str(tmp_path))
    assert out["train-images-idx3-ubyte"] == "shape-ok"
    assert out["train-labels-idx1-ubyte"] == "shape-ok"
    assert out["t10k-images-idx3-ubyte"] == "mismatch"
    assert out["t10k-labels-idx1-ubyte"] == "missing"

    # gz md5 path: write a gz labels file and point the expected-md5
    # table at its actual hash -- proves the md5 branch returns "ok"
    pz = tmp_path / "t10k-labels-idx1-ubyte.gz"
    _write_idx_images(str(pz), rng.integers(0, 10, (10000,),
                                            dtype=np.uint8), gz=True)
    md5 = hashlib.md5(pz.read_bytes()).hexdigest()
    orig = m.MNIST_GZ_MD5["t10k-labels-idx1-ubyte.gz"]
    try:
        m.MNIST_GZ_MD5["t10k-labels-idx1-ubyte.gz"] = md5
        assert m.verify_checksums(str(tmp_path))[
            "t10k-labels-idx1-ubyte"] == "ok"
    finally:
        m.MNIST_GZ_MD5["t10k-labels-idx1-ubyte.gz"] = orig
    # with the real constant, the synthetic gz still passes structurally
    assert m.verify_checksums(str(tmp_path))[
        "t10k-labels-idx1-ubyte"] == "shape-ok"


def test_cifar_verify_checksums(tmp_path):
    from tensornetworkforml_tpu.data import cifar as c

    out = c.verify_checksums(str(tmp_path))
    assert out["archive"] == "missing"
    assert out["data_batch_1.bin"] == "missing"

    rng = np.random.default_rng(0)
    rec = np.zeros((10000, 3073), dtype=np.uint8)
    rec[:, 0] = rng.integers(0, 10, 10000)
    rec[:, 1:] = rng.integers(0, 256, (10000, 3072))
    d = tmp_path / "cifar-10-batches-bin"
    d.mkdir()
    rec.tofile(str(d / "data_batch_1.bin"))
    bad = rec.copy()
    bad[0, 0] = 99  # label out of range
    bad.tofile(str(d / "test_batch.bin"))
    out = c.verify_checksums(str(tmp_path))
    assert out["data_batch_1.bin"] == "shape-ok"
    assert out["test_batch.bin"] == "mismatch"
