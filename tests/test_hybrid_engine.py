"""engine='hybrid' (pre-split kernel + iterate kernel + batched R):
equivalence with the XLA polar path in interpret mode, and the layout
round-trip invariants.
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward, product_init
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once


def _setup(N=10, M=8, L=3, B=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((B, N))
    mps = product_init(jax.random.PRNGKey(1), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x)
    phi = psi_embed(jnp.asarray(x, dtype=jnp.float32))
    y1h = jnp.asarray(
        np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T
    )
    return mps, phi, y1h


def _cfg(engine, **kw):
    base = dict(act_fn="linear", loss_fn="MSE", L2_flag=False,
                split_mode="canonical", svd_method="polar", engine=engine)
    base.update(kw)
    return SweepConfig(**base)


def test_hybrid_matches_xla_polar_one_sweep():
    mps, phi, y1h = _setup()
    out_x, f0_x, ff_x, m_x = sweep_once(mps, phi, y1h, 0.05, 1e-4,
                                        _cfg("xla"))
    out_h, f0_h, ff_h, m_h = sweep_once(mps, phi, y1h, 0.05, 1e-4,
                                        _cfg("hybrid"))
    # pre-sweep forward identical
    np.testing.assert_allclose(np.asarray(f0_h), np.asarray(f0_x),
                               rtol=1e-5, atol=1e-5)
    # same omega + same subspace iteration numerics -> same function
    np.testing.assert_allclose(np.asarray(ff_h), np.asarray(ff_x),
                               rtol=2e-4, atol=2e-4)
    # resulting networks compute the same function on fresh inputs
    rng = np.random.default_rng(7)
    phi2 = psi_embed(jnp.asarray(rng.random((8, mps.N)), jnp.float32))
    fx = np.asarray(mps_forward(out_x, phi2))
    fh = np.asarray(mps_forward(out_h, phi2))
    np.testing.assert_allclose(fh, fx, rtol=2e-4, atol=2e-4)
    # per-step metric series agree (clip sums, acc, mae)
    for k in ("accuracy", "MAE", "mean_abs_B", "mean_abs_deltaB",
              "mean_abs_f"):
        np.testing.assert_allclose(
            np.asarray(m_h[k]), np.asarray(m_x[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )
    # label position moved across the chain
    assert out_h.l_pos == mps.N - 1
    # left factors: canonical-gauge contract -- no column exceeds unit
    # norm anywhere, and a MID-CHAIN site (full live rank) has an
    # orthonormal live block (edge sites are deeply rank-deficient and
    # come out CONTRACTED -- the cholqr/NS annihilation contract, same
    # in both engines)
    for k in range(mps.N - 1):
        sk = np.asarray(out_h.sites[k]).reshape(-1, mps.M)
        assert np.linalg.norm(sk, axis=0).max() <= 1 + 1e-4, k
    smid = np.asarray(out_h.sites[mps.N // 2]).reshape(-1, mps.M)
    qtq = smid.T @ smid
    live = np.diag(qtq) > 0.9
    assert live.sum() >= mps.M // 2
    np.testing.assert_allclose(qtq[np.ix_(live, live)],
                               np.eye(live.sum()), atol=1e-3)


def test_hybrid_alternating_sweeps_train():
    """Two alternating-direction hybrid sweeps keep improving the fit on
    a learnable toy task (labels from a planted linear rule)."""
    from tensornetworkforml_tpu.train.sweep import train_batch

    rng = np.random.default_rng(3)
    N, M, L, B = 12, 8, 2, 64
    x = rng.random((B, N))
    y = (x.mean(axis=1) > 0.5).astype(np.int32)
    mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x)
    cfg = _cfg("hybrid")
    accs = []
    for _ in range(6):
        mps, acc, _ = train_batch(mps, x, y, 0.1, 1e-5, cfg)
        accs.append(float(acc))
    assert accs[-1] >= 0.9, accs


def test_hybrid_validates_config():
    mps, phi, y1h = _setup()
    with pytest.raises(ValueError, match="hybrid"):
        sweep_once(mps, phi, y1h, 0.05, 0.0,
                   _cfg("hybrid", L2_flag=True))
    big = product_init(jax.random.PRNGKey(0), N=6, M=192, L=2,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32)
    phi_b = psi_embed(jnp.asarray(np.random.default_rng(0).random((4, 6)),
                                  jnp.float32))
    y_b = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 0, 1]].T)
    with pytest.raises(ValueError, match="M\\*D"):
        sweep_once(big, phi_b, y_b, 0.05, 0.0, _cfg("hybrid"))
