"""Tests for the native (C++) host data pipeline and its NumPy fallbacks."""

import numpy as np
import pytest

from tensornetworkforml_tpu.data import native
from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.mnist import max_pool_2x2 as np_pool


def test_native_library_builds_and_loads():
    assert native.available(), "native data library failed to build/load"
    assert native.get_lib().tnml_version() == 1


def test_native_diagonals_distribution():
    data, labels = native.diagonals_dataset(2000, 6, sigma=0.4, seed=7)
    assert data.shape == (2000, 6, 6)
    assert data.min() >= 0.0 and data.max() <= 1.0
    assert set(np.unique(labels)) <= {0, 1}
    # determinism per seed
    data2, labels2 = native.diagonals_dataset(2000, 6, sigma=0.4, seed=7)
    np.testing.assert_array_equal(data, data2)
    np.testing.assert_array_equal(labels, labels2)
    # different seeds differ
    data3, _ = native.diagonals_dataset(2000, 6, sigma=0.4, seed=8)
    assert np.abs(data - data3).max() > 0

    # pattern structure: on-diagonal pixels brighter than off-diagonal
    ones = data[labels == 1]
    diag_mean = np.einsum("bii->bi", ones).mean()
    off_mean = (ones.sum((1, 2)) - np.einsum("bii->bi", ones).sum(1)).mean() / 30
    assert diag_mean > off_mean + 0.3

    # same separability as the numpy generator (a model trained on one
    # distribution evaluates on the other in the e2e suite)
    np_data, np_labels = create_dataset(2000, 6, sigma=0.4, seed=7)
    assert abs(np_data.mean() - data.mean()) < 0.02


def test_native_psi_embed_matches_numpy():
    x = np.random.default_rng(0).random((13, 7)).astype(np.float32)
    got = native.psi_embed(x)
    want = np.stack(
        [np.sin(np.pi * x / 2), np.cos(np.pi * x / 2)], axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    x64 = x.astype(np.float64)
    got64 = native.psi_embed(x64)
    want64 = np.stack(
        [np.sin(np.pi * x64 / 2), np.cos(np.pi * x64 / 2)], axis=-1
    )
    np.testing.assert_allclose(got64, want64, rtol=1e-11, atol=1e-13)


def test_native_max_pool_matches_numpy():
    x = np.random.default_rng(1).random((5, 8, 10))
    np.testing.assert_allclose(native.max_pool_2x2(x), np_pool(x))


def test_native_shuffle_and_gather():
    idx = native.shuffled_indices(1000, seed=3)
    assert sorted(idx.tolist()) == list(range(1000))
    idx2 = native.shuffled_indices(1000, seed=3)
    np.testing.assert_array_equal(idx, idx2)
    if native.available():
        assert not np.array_equal(idx, np.arange(1000))

    data = np.random.default_rng(2).random((100, 17)).astype(np.float32)
    sel = native.shuffled_indices(100, seed=4)[:32]
    np.testing.assert_array_equal(native.gather_rows(data, sel), data[sel])


def test_profiling_harness():
    """The per-op profiling table runs and reports sane values."""
    from tensornetworkforml_tpu.utils.profiling import Timer, profile_model

    summary = profile_model(N=10, M=4, L=2, batch=8, iters=2)
    assert set(summary) == {"forward", "full_sweep", "env_stack", "svd_split"}
    for v in summary.values():
        assert v["count"] == 2 and v["total_s"] > 0

    t = Timer()
    with t.scope("x"):
        pass
    assert "x" in t.report()
