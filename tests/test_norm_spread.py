"""End-of-sweep gauge rebalance (SweepConfig.norm_spread).

Canonical-mode splits leak ridge junk norm into dead bond directions;
the moving label core accumulates it (~1e9 after one M=512 sweep on
TPU, results/m512_twosweep_tpu.json) while the sites shrink to keep the
function fixed -- and the NEXT sweep's site-only environment cascades
then underflow float32 and annihilate the model to exact zeros. The
rebalance rescales the label core to unit max-abs and spreads the
factor geometrically over the live sites, which must leave the network
FUNCTION unchanged (gauge transformation).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworkforml_tpu.models.mps import (
    grow_bond,
    mps_forward,
    product_init,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once
from tensornetworkforml_tpu.train.trainer import train_model

RNG = np.random.default_rng(7)


def _state(N=12, M=4, L=3, dtype=jnp.float64):
    x = RNG.random((32, N))
    mps = product_init(
        jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
        loss_fn="MSE", dtype=dtype, calibration_x=x,
    )
    phi = psi_embed(jnp.asarray(x, dtype=dtype))
    y = jnp.asarray(RNG.integers(0, L, 32))
    y1h = jax.nn.one_hot(y, L, dtype=dtype).T
    return mps, phi, y1h


def _cfg(**kw):
    base = dict(act_fn="linear", loss_fn="MSE", L2_flag=False,
                split_mode="canonical", svd_method="cholqr")
    base.update(kw)
    return SweepConfig(**base)


def test_spread_is_a_gauge_transformation():
    """Same sweep with/without the rebalance: identical scores, and the
    spread model's label core sits at unit max-abs."""
    mps, phi, y1h = _state()
    a, _, _, _ = sweep_once(mps, phi, y1h, 0.05, 1e-5, _cfg())
    b, _, _, _ = sweep_once(
        mps, phi, y1h, 0.05, 1e-5, _cfg(norm_spread=True)
    )
    np.testing.assert_allclose(
        np.asarray(mps_forward(a, phi)),
        np.asarray(mps_forward(b, phi)),
        rtol=1e-9, atol=1e-12,
    )
    assert float(jnp.abs(b.label_site).max()) == pytest.approx(1.0, rel=1e-9)
    # zero padding of the label slot survives the scalar multiply exactly
    assert float(jnp.abs(b.sites[b.l_pos]).max()) == 0.0


def test_spread_both_directions_and_after_growth():
    """The rebalance composes across alternating-direction sweeps and a
    bond growth (the m512 collapse trigger), keeping the label at unit
    norm with the function intact. Within one sweep the rescale is an
    exact gauge move (test above); ACROSS sweeps the next splits see
    rescaled inputs, and the split's ridge/dead-tol regularisation is
    scale-relative -- so cross-sweep equivalence is approximate (~1e-4),
    not bitwise."""
    mps, phi, y1h = _state()
    cfg = _cfg(norm_spread=True)
    cur, ref = mps, mps
    for _ in range(2):
        cur, _, _, _ = sweep_once(cur, phi, y1h, 0.05, 1e-5, cfg)
        ref, _, _, _ = sweep_once(ref, phi, y1h, 0.05, 1e-5, _cfg())
    cur = grow_bond(cur, 8)
    ref = grow_bond(ref, 8)
    cur, _, _, _ = sweep_once(cur, phi, y1h, 0.05, 1e-5, cfg)
    ref, _, _, _ = sweep_once(ref, phi, y1h, 0.05, 1e-5, _cfg())
    np.testing.assert_allclose(
        np.asarray(mps_forward(cur, phi)),
        np.asarray(mps_forward(ref, phi)),
        rtol=1e-3, atol=1e-6,
    )
    assert float(jnp.abs(cur.label_site).max()) == pytest.approx(1.0, rel=1e-9)


def test_train_model_norm_spread_explicit_and_auto_threshold():
    """train_model(norm_spread=True) applies the rebalance (label core
    at unit max-abs after training); norm_spread='auto' does NOT engage
    below _NORM_SPREAD_MIN_M, preserving the measured small-M dynamics
    bit-for-bit (the rebalance is function-preserving but clip/step
    sizes are gauge-relative)."""

    class _Loader:
        def __init__(self, x, y, b):
            self.x, self.y, self.b = x, y, b

        def batches(self):
            for i in range(0, len(self.x), self.b):
                yield self.x[i:i + self.b], self.y[i:i + self.b]

        def __len__(self):
            return (len(self.x) + self.b - 1) // self.b

    N, L = 12, 3
    x = RNG.random((64, N))
    y = RNG.integers(0, L, 64)
    mps = product_init(
        jax.random.PRNGKey(1), N=N, M=4, L=L, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x[:32],
    )
    tl = _Loader(x[:48], y[:48], 16)
    vl = _Loader(x[48:], y[48:], 16)
    out, val, _ = train_model(
        mps, tl, vl, lr=0.05, n_epochs=2, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", svd_method="cholqr", verbose=False,
        fused=False, norm_spread=True,
    )
    assert float(jnp.abs(out.label_site).max()) == pytest.approx(1.0, rel=1e-9)
    assert all(np.isfinite(val))

    # auto at M=4 (< threshold): untouched gauge, label norm is whatever
    # the canonical accumulation produced (almost surely not exactly 1)
    out2, val2, _ = train_model(
        mps, tl, vl, lr=0.05, n_epochs=2, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", svd_method="cholqr", verbose=False,
        fused=False,
    )
    assert float(jnp.abs(out2.label_site).max()) != pytest.approx(
        1.0, rel=1e-9
    )
    assert all(np.isfinite(val2))
