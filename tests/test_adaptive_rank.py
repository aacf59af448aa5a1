"""Adaptive bond rank (VERDICT r4 item 5): the cumulative-variance
threshold the reference computed but never used
(``Network_class.py:890-891``; docstring :870 "still to be tested"),
implemented as static-shape masking inside the padded-M representation.
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp
import pytest

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.mps import product_init
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.ops.svd import (
    _adaptive_energy_mask,
    truncated_svd_split,
)
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once
from tensornetworkforml_tpu.train.trainer import train_model


def _bmat_with_spectrum(s, I=12, J=20, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((I, I)))
    v, _ = np.linalg.qr(rng.standard_normal((J, I)))
    return (u * np.asarray(s)) @ v.T


def test_adaptive_energy_mask_keeps_smallest_sufficient_prefix():
    s = jnp.asarray([10.0, 1.0, 0.1, 0.01, 0.0])
    e = np.asarray(s) ** 2
    # tol large enough to drop everything after the first value
    m = np.asarray(_adaptive_energy_mask(s, adaptive_tol=0.02))
    assert m.tolist() == [1, 0, 0, 0, 0]
    # tol requiring the first two
    m = np.asarray(_adaptive_energy_mask(s, adaptive_tol=0.005))
    assert m.tolist() == [1, 1, 0, 0, 0]
    # tiny tol keeps every nonzero value
    m = np.asarray(_adaptive_energy_mask(s, adaptive_tol=1e-9))
    assert m.tolist() == [1, 1, 1, 1, 0]
    # retained energy honors the bound in each case
    for tol in (0.02, 0.005, 1e-9):
        m = np.asarray(_adaptive_energy_mask(s, tol))
        assert e[m > 0].sum() >= (1 - tol) * e.sum()


def test_adaptive_split_function_error_bounded():
    s = np.logspace(0, -6, 12)  # 6-decade spectrum
    b = _bmat_with_spectrum(s)
    tol = 1e-6
    for method in ("svd", "cholsvd"):
        for split_mode in ("shared", "canonical"):
            left, right = truncated_svd_split(
                jnp.asarray(b), 12, method, split_mode=split_mode,
                adaptive_tol=tol,
            )
            err = np.linalg.norm(np.asarray(left) @ np.asarray(right) - b)
            # dropped energy <= tol * total energy (Frobenius)
            assert err ** 2 <= tol * np.sum(s ** 2) * (1 + 1e-6), (
                method, split_mode, err,
            )
            # some directions were actually dropped at this tol
            live = np.sum(np.linalg.norm(np.asarray(right), axis=1) > 1e-12)
            assert live < 12, (method, split_mode)


def test_adaptive_split_preserves_dead_padding():
    """Zero rows/cols (the padded edge structure) stay exactly zero."""
    s = np.concatenate([np.logspace(0, -2, 6), np.zeros(2)])
    b = _bmat_with_spectrum(s, I=8, J=14)
    b[5:, :] = 0.0  # dead rows as in the padded two-site tensor
    left, right = truncated_svd_split(
        jnp.asarray(b), 8, "svd", split_mode="canonical", adaptive_tol=1e-4
    )
    assert np.all(np.asarray(left)[5:, :] == 0)


def test_adaptive_requires_spectrum_method():
    b = jnp.asarray(_bmat_with_spectrum(np.ones(12)))
    with pytest.raises(ValueError, match="spectrum-producing"):
        truncated_svd_split(b, 12, "cholqr", split_mode="canonical",
                            adaptive_tol=1e-4)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", svd_method="polar",
                      rank_mode="adaptive")
    mps = product_init(jax.random.PRNGKey(0), N=6, M=4, L=2,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float64)
    phi = psi_embed(jnp.asarray(np.random.default_rng(0).random((8, 6))))
    y1h = jnp.asarray(np.eye(2)[np.zeros(8, np.int64)].T)
    with pytest.raises(ValueError, match="spectrum-producing"):
        sweep_once(mps, phi, y1h, 0.1, 0.0, cfg)


def test_adaptive_sweep_reports_live_rank_and_preserves_padding():
    rng = np.random.default_rng(0)
    N, M, L, B = 10, 6, 2, 16
    x = rng.random((B, N))
    mps = product_init(jax.random.PRNGKey(1), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
                       calibration_x=x)
    phi = psi_embed(jnp.asarray(x))
    y1h = jnp.asarray(np.eye(L)[rng.integers(0, L, B)].T)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", svd_method="svd",
                      rank_mode="adaptive", adaptive_tol=1e-3)
    out, f0, f_fin, metrics = sweep_once(mps, phi, y1h, 0.05, 0.0, cfg)
    live = np.asarray(metrics["live_rank"])
    assert live.shape == (N - 1,)
    assert np.all(live >= 1) and np.all(live <= M)
    # at least one interior bond should be truncated below M at this tol
    assert np.any(live < M)
    # padded edge-bond structure preserved: bond 0 of the updated chain
    # can carry at most D live directions (site 0 has a 1-dim left leg)
    sites = np.asarray(out.sites)
    s0 = sites[0].reshape(M * 2, M)
    assert np.sum(np.linalg.norm(s0, axis=0) > 1e-12) <= 2 * mps.D


def test_adaptive_training_matches_fixed_quality():
    """End-to-end: adaptive rank trains the diagonals task to the same
    quality as fixed-M while reporting live ranks below M."""
    data, labels = create_dataset(600, 6, sigma=0.55, seed=0)
    train_loader, val_loader, _ = prepare_dataset(
        data, labels, 0.8, 0.2, train_batch_size=32, val_batch_size=64,
        test_batch_size=64, embed=False, seed=0, even_train_batches=True,
    )
    x_cal, _ = next(train_loader.batches())

    def fresh():
        return product_init(jax.random.PRNGKey(0), N=36, M=8, L=2,
                            act_fn="linear", loss_fn="MSE",
                            dtype=jnp.float64, calibration_x=x_cal)

    _, acc_fixed, _ = train_model(
        fresh(), train_loader, val_loader, lr=0.1, n_epochs=3,
        weight_dec=1e-5, L2_flag=False, split_mode="canonical",
        verbose=False,
    )
    _, acc_adapt, _ = train_model(
        fresh(), train_loader, val_loader, lr=0.1, n_epochs=3,
        weight_dec=1e-5, L2_flag=False, split_mode="canonical",
        rank_mode="adaptive", adaptive_tol=1e-5, verbose=False,
    )
    assert acc_adapt[-1] >= 0.97
    assert acc_adapt[-1] >= acc_fixed[-1] - 0.03
