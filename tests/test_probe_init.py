"""Linear-probe initialisation (models/probe_init.py): exact argmax
equivalence of the carrier/accumulator construction, and its value on
the pure-entangled teacher task (the pm0 foothold)."""

import numpy as np

import tests.conftest  # noqa: F401
import jax.numpy as jnp
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward
from tensornetworkforml_tpu.models.probe_init import (
    fit_linear_probe,
    probe_init,
    probe_scores,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed


def _toy_task(B=512, N=16, L=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((B, N))
    # labels from a planted ADDITIVE rule on the pt features (the probe's
    # own model class, so the probe fits well and the test is sharp)
    phi = np.stack([np.sin(np.pi / 2 * x), np.cos(np.pi / 2 * x)], axis=-1)
    pt = phi / phi.sum(-1, keepdims=True)
    w = rng.standard_normal((L, N, 2))
    y = np.einsum("lnd,bnd->lb", w, pt).argmax(0)
    return x, y


def test_probe_mps_argmax_equals_probe_exactly():
    x, y = _toy_task()
    x_tr, y_tr, x_te = x[:384], y[:384], x[384:]
    W, train_acc = fit_linear_probe(x_tr, y_tr, 4)
    assert train_acc >= 0.9
    mps, _ = probe_init(x_tr, y_tr, M=8, L=4, dtype=jnp.float64)
    assert mps.l_pos == mps.N - 1
    s_probe = probe_scores(W, x_te)
    f = np.asarray(mps_forward(mps, psi_embed(jnp.asarray(x_te))))
    assert np.mean(f.argmax(0) == s_probe.argmax(0)) == 1.0
    # scores are the probe's up to a common positive per-sample carrier
    # factor: f_b == scale_b * s_b exactly, scale_b > 0
    scale = np.sum(f * s_probe, axis=0) / np.sum(s_probe * s_probe, axis=0)
    assert np.all(scale > 0)
    resid = f - scale[None, :] * s_probe
    assert np.abs(resid).max() <= 1e-8 * np.abs(f).max()


def test_probe_init_validates_bond():
    x, y = _toy_task(B=64)
    with pytest.raises(ValueError, match="L\\+1"):
        probe_init(x, y, M=4, L=4)


def test_probe_init_carrier_stays_bounded_long_chain():
    """The per-site carrier calibration keeps outputs O(1) at N=196 --
    without it the common factor drifts like e^(0.17 N)."""
    rng = np.random.default_rng(1)
    x = rng.random((256, 196))
    y = rng.integers(0, 10, 256)
    mps, _ = probe_init(x, y, M=12, L=10, dtype=jnp.float64)
    f = np.asarray(mps_forward(mps, psi_embed(jnp.asarray(x[:64]))))
    assert np.isfinite(f).all()
    assert np.abs(f).max() < 1e3


def test_probe_init_beats_cold_start_on_pm0_teacher():
    """The pm0 foothold: probe init reaches far above chance on the task
    where cold-started greedy sweeps measure AT chance
    (results/teacher_pm0.json)."""
    from tensornetworkforml_tpu.data.teacher import teacher_task

    tr_x, tr_y, te_x, te_y = teacher_task(
        n_train=1024, n_test=512, N=36, L=10, teacher_m=4, margin=0.3,
        proto_mix=0.0, seed=0,
    )
    mps, train_acc = probe_init(tr_x, tr_y, M=12, L=10, dtype=jnp.float64)
    f = np.asarray(mps_forward(mps, psi_embed(jnp.asarray(te_x))))
    test_acc = np.mean(f.argmax(0) == te_y)
    assert train_acc >= 0.5
    assert test_acc >= 0.4, test_acc  # chance is 0.1
