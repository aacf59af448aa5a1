"""Canonical-gauge tests: exactness, isometry maintenance, f32 stability.

The canonical mode is the framework's answer to the reference's documented
numerical instability (report section VI): gauge-fixed sweeps keep every
environment norm <= 1 so large-N float32 training cannot blow up.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.models.canonical import (
    canonical_init,
    left_canonicalize,
    normalize_label,
    right_canonicalize,
)
from tensornetworkforml_tpu.models.mps import mps_forward, mps_init
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

RNG = np.random.default_rng(11)


def _rand_mps(l_pos=0, N=12, M=6, L=3, dtype=jnp.float64, seed=0):
    mps = mps_init(
        jax.random.PRNGKey(seed), N=N, M=M, L=L, normalize=True,
        act_fn="softmax", loss_fn="cross_entropy", dtype=dtype,
    )
    if l_pos == N - 1:
        # move the label by one full reference-mode sweep
        phi = psi_embed(jnp.asarray(RNG.random((8, N)), dtype=dtype))
        y = jax.nn.one_hot(jnp.asarray(RNG.integers(0, L, 8)), L, dtype=dtype).T
        cfg = SweepConfig(act_fn="softmax", loss_fn="cross_entropy")
        mps, _, _, _ = sweep_once(mps, phi, y, 0.001, 0.0, cfg)
    return mps


def _check_right_isometries(mps, from_site=1):
    """sum_{d,r} A[l,d,r] A[l',d,r] must be an orthogonal projector."""
    sites = np.asarray(mps.sites)
    for n in range(from_site, mps.N):
        A = sites[n].reshape(mps.M, -1)
        P = A @ A.T
        np.testing.assert_allclose(P @ P, P, atol=1e-8)


def test_right_canonicalize_preserves_function():
    mps = _rand_mps()
    phi = psi_embed(jnp.asarray(RNG.random((6, mps.N))))
    want = np.asarray(mps_forward(mps, phi))
    mps_c = right_canonicalize(mps)
    got = np.asarray(mps_forward(mps_c, phi))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
    _check_right_isometries(mps_c)


def test_left_canonicalize_preserves_function():
    mps = _rand_mps(l_pos=11)
    assert mps.l_pos == mps.N - 1
    phi = psi_embed(jnp.asarray(RNG.random((6, mps.N))))
    want = np.asarray(mps_forward(mps, phi))
    mps_c = left_canonicalize(mps)
    got = np.asarray(mps_forward(mps_c, phi))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
    # left isometries: sum_{l,d} A[l,d,r] A[l,d,r'] is a projector
    sites = np.asarray(mps_c.sites)
    for n in range(0, mps_c.N - 1):
        A = sites[n].reshape(-1, mps_c.M)
        P = A.T @ A
        np.testing.assert_allclose(P @ P, P, atol=1e-8)


def test_normalize_label_sets_output_scale():
    mps = normalize_label(right_canonicalize(_rand_mps()), 1.0)
    assert np.isclose(float(jnp.linalg.norm(mps.label_site)), 1.0)
    phi = psi_embed(jnp.asarray(RNG.random((32, mps.N))))
    f = np.asarray(mps_forward(mps, phi))
    assert np.abs(f).max() <= 1.0 + 1e-9  # isometries + unit label core


def test_canonical_sweeps_maintain_gauge():
    """After a canonical-mode right sweep, sites 0..N-2 are left-isometric
    (mixed-canonical form travels with the label)."""
    mps = canonical_init(jax.random.PRNGKey(3), N=10, M=5, L=3,
                         dtype=jnp.float64)
    cfg = SweepConfig(act_fn="softmax", loss_fn="cross_entropy",
                      split_mode="canonical")
    B = 16
    phi = psi_embed(jnp.asarray(RNG.random((B, 10))))
    y = jax.nn.one_hot(jnp.asarray(RNG.integers(0, 3, B)), 3,
                       dtype=jnp.float64).T
    mps2, _, _, _ = sweep_once(mps, phi, y, 0.05, 1e-4, cfg)
    sites = np.asarray(mps2.sites)
    for n in range(0, mps2.N - 1):
        A = sites[n].reshape(-1, mps2.M)
        P = A.T @ A
        np.testing.assert_allclose(P, np.eye(mps2.M), atol=1e-9)

    # and a left sweep restores right isometries
    phi2 = psi_embed(jnp.asarray(RNG.random((B, 10))))
    mps3, _, _, _ = sweep_once(mps2, phi2, y, 0.05, 1e-4, cfg)
    _check_right_isometries(mps3)


def test_canonical_f32_large_N_is_stable():
    """N=196 float32 canonical training stays finite over several sweeps
    (the reference split overflows here -- its report section VI)."""
    N, M, L, B = 196, 16, 10, 32
    mps = canonical_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                         act_fn="softmax", loss_fn="cross_entropy",
                         dtype=jnp.float32)
    cfg = SweepConfig(act_fn="softmax", loss_fn="cross_entropy",
                      split_mode="canonical")
    for i in range(4):
        phi = psi_embed(jnp.asarray(RNG.random((B, N)), dtype=jnp.float32))
        y = jax.nn.one_hot(jnp.asarray(RNG.integers(0, L, B)), L,
                           dtype=jnp.float32).T
        mps, f0, f_fin, _ = sweep_once(mps, phi, y, 0.01, 1e-4, cfg)
        assert bool(jnp.isfinite(mps.sites).all()), f"sweep {i} sites blew up"
        assert bool(jnp.isfinite(f_fin).all()), f"sweep {i} output blew up"
    assert float(jnp.abs(np.asarray(mps.label_site)).max()) < 1e3


def test_canonical_training_learns_diagonals():
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.train.trainer import train_model

    data, labels = create_dataset(1600, 6, 0.6, seed=2)
    tr, va, te = prepare_dataset(
        data, labels, 1.0, 0.2, 640, 64, 64, embed=False, seed=3
    )
    mps = canonical_init(jax.random.PRNGKey(1), N=36, M=8, L=2,
                         act_fn="softmax", loss_fn="cross_entropy",
                         dtype=jnp.float64)
    mps, val_acc, _ = train_model(
        mps, tr, va, lr=0.2, n_epochs=4, weight_dec=1e-4,
        split_mode="canonical", verbose=False,
    )
    assert max(val_acc) >= 0.97, f"val accuracy too low: {val_acc}"


def test_bf16_storage_training_runs():
    """bfloat16 parameter storage: contractions in bf16, SVD split in f32."""
    mps = canonical_init(jax.random.PRNGKey(0), N=24, M=8, L=2,
                         act_fn="linear", loss_fn="MSE",
                         dtype=jnp.bfloat16)
    assert mps.sites.dtype == jnp.bfloat16
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical")
    B = 16
    phi = psi_embed(jnp.asarray(RNG.random((B, 24)), dtype=jnp.bfloat16))
    y = jax.nn.one_hot(jnp.asarray(RNG.integers(0, 2, B)), 2,
                       dtype=jnp.bfloat16).T
    mps2, f0, f_fin, _ = sweep_once(mps, phi, y, 0.05, 1e-5, cfg)
    assert mps2.sites.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(f_fin.astype(jnp.float32)).all())


def test_matmul_precision_knob_compiles():
    mps = canonical_init(jax.random.PRNGKey(0), N=10, M=4, L=2,
                         act_fn="linear", loss_fn="MSE", dtype=jnp.float32)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", matmul_precision="float32")
    B = 8
    phi = psi_embed(jnp.asarray(RNG.random((B, 10)), dtype=jnp.float32))
    y = jax.nn.one_hot(jnp.asarray(RNG.integers(0, 2, B)), 2,
                       dtype=jnp.float32).T
    mps2, *_ = sweep_once(mps, phi, y, 0.05, 1e-5, cfg)
    assert bool(jnp.isfinite(mps2.sites).all())


def test_renorm_envs_stable_at_N784():
    """Norm-transfer gauge: a canonical sweep at N=784 float32 stays finite
    (without it the label core overflows near the end of the sweep)."""
    from tensornetworkforml_tpu.models.mps import product_init

    N, M, L, B = 784, 8, 10, 32
    x = np.asarray(RNG.random((B, N)), dtype=np.float32)
    mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", renorm_envs=True)
    phi = psi_embed(jnp.asarray(x))
    y = jax.nn.one_hot(jnp.asarray(RNG.integers(0, L, B)), L,
                       dtype=jnp.float32).T
    m, f0, f_fin, _ = sweep_once(mps, phi, y, 0.03, 1e-5, cfg)
    assert bool(jnp.isfinite(m.sites).all())
    assert bool(jnp.isfinite(m.label_site).all())
    assert bool(jnp.isfinite(f_fin).all())
    # far below float32 overflow (non-renormalised sweeps overflow here);
    # the core can still legitimately grow ~(1+lr)^N from clipped updates
    assert float(jnp.abs(m.label_site).max()) < 1e30
