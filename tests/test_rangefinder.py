"""Rangefinder split: the TPU-fast replacement for the exact SVD split.

The exact SVD (reference ``Network_class.py:887``) is latency-bound on TPU
(~190 us/step, ~83% of two-site step time). In the canonical gauge only the
SPAN of the left factor is load-bearing (basis rotations inside the kept
subspace are gauge), so an oversampled randomized rangefinder with
Rayleigh-Ritz truncation replaces it: measured 2.9x faster sweeps at
N=196/M=32/B=256 on TPU with statistically equivalent training quality
(BENCH_NOTES.md).
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.ops.svd import (
    _rangefinder_split,
    truncated_svd_split,
)


def _gapped_matrix(I, J, rank, gap=0.05, seed=0, scale=1.0):
    """Random (I, J) matrix with a spectral gap at `rank` (the measured
    structure of two-site tensors during canonical training)."""
    rng = np.random.default_rng(seed)
    U = np.linalg.qr(rng.standard_normal((I, I)))[0]
    V = np.linalg.qr(rng.standard_normal((J, I)))[0]
    s = np.concatenate([
        np.geomspace(1.0, 0.1, rank),
        np.geomspace(0.1 * gap, 0.01 * gap, I - rank),
    ])
    return scale * (U * s) @ V.T


@pytest.mark.parametrize("scale", [1.0, 1e10, 1e-8])
def test_rangefinder_isometry_and_capture(scale):
    I, J, rank = 64, 640, 32
    b = jnp.asarray(_gapped_matrix(I, J, rank, scale=scale))
    q, r = _rangefinder_split(b, rank)
    q = np.asarray(q)
    # exact isometry (the canonical gauge depends on it)
    np.testing.assert_allclose(q.T @ q, np.eye(rank), atol=1e-10)
    # right factor is the projection
    np.testing.assert_allclose(np.asarray(r), q.T @ np.asarray(b), rtol=0,
                               atol=1e-6 * scale)
    # subspace capture within 1e-6 of the optimal rank-`rank` truncation
    s = np.linalg.svd(np.asarray(b), compute_uv=False)
    e_opt = (s[:rank] ** 2).sum()
    e_rf = np.linalg.norm(q.T @ np.asarray(b)) ** 2
    assert e_rf / e_opt > 1 - 1e-6


def test_rangefinder_matches_svd_function():
    # the reconstructed rank-M tensor must match the optimal truncation
    # (not the factors, which are only gauge-equivalent)
    I, J, rank = 32, 320, 16
    b = jnp.asarray(_gapped_matrix(I, J, rank, seed=3))
    q, r = _rangefinder_split(b, rank)
    u, svh = truncated_svd_split(b, rank, "svd", split_mode="canonical")
    np.testing.assert_allclose(
        np.asarray(q @ r), np.asarray(u @ svh), atol=1e-8
    )


def test_rangefinder_rejects_unsupported_modes():
    b = jnp.ones((8, 16))
    with pytest.raises(ValueError, match="canonical"):
        truncated_svd_split(b, 4, "rangefinder", split_mode="shared")
    with pytest.raises(ValueError, match="reference"):
        truncated_svd_split(b, 4, "rangefinder", keep=jnp.asarray(2),
                            split_mode="canonical")


def test_rangefinder_training_equals_svd_quality():
    """End-to-end: canonical training with rangefinder splits reaches the
    same accuracy as exact-SVD splits on the diagonals task."""
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.trainer import train_model

    data, labels = create_dataset(400, 6, sigma=0.5, seed=0)
    accs = {}
    for method in ("svd", "rangefinder"):
        train_loader, val_loader, _ = prepare_dataset(
            data.reshape(len(data), -1), labels, 0.8, 0.2,
            train_batch_size=32, val_batch_size=64, test_batch_size=64,
            embed=False, seed=0,
        )
        x_cal, _ = next(train_loader.batches())
        mps = product_init(jax.random.PRNGKey(0), N=36, M=8, L=2,
                           act_fn="linear", loss_fn="MSE",
                           dtype=jnp.float64, calibration_x=x_cal)
        _, val_acc, _ = train_model(
            mps, train_loader, val_loader, lr=0.1, n_epochs=2,
            weight_dec=1e-5, L2_flag=False, split_mode="canonical",
            svd_method=method, verbose=False,
        )
        accs[method] = val_acc[-1]
    assert accs["rangefinder"] >= 0.95
    assert abs(accs["rangefinder"] - accs["svd"]) <= 0.05


@pytest.mark.parametrize("scale", [1.0, 1e10, 1e-8])
def test_cholqr_isometry_and_capture(scale):
    I, J, rank = 64, 640, 32
    b = jnp.asarray(_gapped_matrix(I, J, rank, scale=scale))
    q, r = truncated_svd_split(b, rank, "cholqr", split_mode="canonical")
    q = np.asarray(q)
    np.testing.assert_allclose(q.T @ q, np.eye(rank), atol=1e-9)
    np.testing.assert_allclose(np.asarray(r), q.T @ np.asarray(b), rtol=0,
                               atol=1e-6 * scale)
    s = np.linalg.svd(np.asarray(b), compute_uv=False)
    e_opt = (s[:rank] ** 2).sum()
    e_q = np.linalg.norm(q.T @ np.asarray(b)) ** 2
    assert e_q / e_opt > 1 - 1e-6


def test_cholqr_matches_svd_function():
    I, J, rank = 32, 320, 16
    b = jnp.asarray(_gapped_matrix(I, J, rank, seed=3))
    q, r = truncated_svd_split(b, rank, "cholqr", split_mode="canonical")
    u, svh = truncated_svd_split(b, rank, "svd", split_mode="canonical")
    np.testing.assert_allclose(
        np.asarray(q @ r), np.asarray(u @ svh), atol=1e-8
    )


def test_cholqr_rejects_unsupported_modes():
    b = jnp.ones((8, 16))
    with pytest.raises(ValueError, match="canonical"):
        truncated_svd_split(b, 4, "cholqr", split_mode="shared")
    with pytest.raises(ValueError, match="reference"):
        truncated_svd_split(b, 4, "cholqr", keep=jnp.asarray(2),
                            split_mode="canonical")


def test_cholqr_training_equals_svd_quality():
    """End-to-end: canonical two-site training with the matmul/Cholesky-only
    split reaches the same accuracy as exact-SVD splits."""
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.trainer import train_model

    data, labels = create_dataset(400, 6, sigma=0.5, seed=0)
    accs = {}
    for method in ("svd", "cholqr"):
        train_loader, val_loader, _ = prepare_dataset(
            data.reshape(len(data), -1), labels, 0.8, 0.2,
            train_batch_size=32, val_batch_size=64, test_batch_size=64,
            embed=False, seed=0,
        )
        x_cal, _ = next(train_loader.batches())
        mps = product_init(jax.random.PRNGKey(0), N=36, M=8, L=2,
                           act_fn="linear", loss_fn="MSE",
                           dtype=jnp.float64, calibration_x=x_cal)
        _, val_acc, _ = train_model(
            mps, train_loader, val_loader, lr=0.1, n_epochs=2,
            weight_dec=1e-5, L2_flag=False, split_mode="canonical",
            svd_method=method, verbose=False,
        )
        accs[method] = val_acc[-1]
    assert accs["cholqr"] >= 0.95
    assert abs(accs["cholqr"] - accs["svd"]) <= 0.05
