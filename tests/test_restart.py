"""Restart-on-stall (``train_model(restarts=...)``): the escape hatch for
the init-basin x large-batch interaction measured in round 3
(results/recipe_robustness.json: ~1 seed in 5 plateaus at ~0.84 at B=256
and neither more epochs nor a small-batch polish recovers it -- the only
working fix is a fresh init).

The reference has no equivalent (its ``Network.train``,
``Network_class.py:261-350``, runs a single fixed-init loop); this is a
resilience subsystem beyond the reference's surface.
"""

import numpy as np
import pytest

import tensornetworkforml_tpu.train.trainer as trainer_mod
from tensornetworkforml_tpu.train.trainer import stall_detected, train_model


class TestStallDetected:
    def test_short_series_never_stalls(self):
        assert not stall_detected([0.5])
        assert not stall_detected([0.5, 0.5])

    def test_flat_low_plateau_stalls(self):
        assert stall_detected([0.5, 0.5, 0.5])

    def test_reaching_threshold_never_stalls(self):
        assert not stall_detected([0.96, 0.96, 0.96])
        # threshold reached anywhere in the series counts
        assert not stall_detected([0.96, 0.5, 0.5, 0.5])

    def test_improving_series_does_not_stall(self):
        assert not stall_detected([0.5, 0.6, 0.7])

    def test_warmup_epochs_delay_detection(self):
        vals = [0.5, 0.5, 0.5]
        assert stall_detected(vals, warmup_epochs=0)
        assert not stall_detected(vals, warmup_epochs=1)
        assert stall_detected(vals + [0.5], warmup_epochs=1)

    def test_min_delta_is_an_improvement_bar(self):
        # +0.004 in the window is inside min_delta=0.005 -> still a stall
        assert stall_detected([0.5, 0.5, 0.504])
        assert not stall_detected([0.5, 0.5, 0.51])

    def test_projection_catches_slow_creep_basin(self):
        # The measured stuck-seed signature (restart_gate.json seed 2):
        # +0.006/epoch at ~0.90 clears the plateau bar every epoch but
        # cannot reach 0.95 within a 5-epoch budget.
        creep = [0.8971, 0.8984, 0.9036, 0.9102]
        assert not stall_detected(creep, warmup_epochs=1)  # plateau arm: no
        assert stall_detected(creep, warmup_epochs=1, n_epochs=5)
        # ... but with budget to spare the same series is left alone
        assert not stall_detected(creep, warmup_epochs=1, n_epochs=20)

    def test_projection_spares_fast_improvers(self):
        # +0.15/epoch below threshold projects over it -> healthy
        assert not stall_detected([0.5, 0.65, 0.8], n_epochs=5)
        # same series with no remaining budget -> cannot make it
        assert stall_detected([0.5, 0.65, 0.8], n_epochs=3)


def _tiny_setup(seed=0):
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import product_init

    data, labels = create_dataset(40, linear_dim=4, seed=seed)
    train_loader, val_loader, _ = prepare_dataset(
        np.asarray(data.reshape(len(data), -1), dtype=np.float64),
        np.asarray(labels),
        0.6, 0.5, train_batch_size=8, val_batch_size=8,
        test_batch_size=8, embed=False, seed=seed,
    )
    x_cal, _ = next(train_loader.batches())
    mps = product_init(
        jax.random.PRNGKey(seed), N=16, M=4, L=2, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x_cal,
    )
    return mps, train_loader, val_loader, x_cal


def test_restarts_require_reinit_fn():
    mps, tr, va, _ = _tiny_setup()
    with pytest.raises(ValueError, match="reinit_fn"):
        train_model(mps, tr, va, lr=0.05, n_epochs=1, L2_flag=False,
                    split_mode="canonical", svd_method="cholqr",
                    verbose=False, restarts=1)


def test_stalled_attempt_restarts_and_keeps_best(monkeypatch):
    """Attempt 0's scripted val accs plateau low -> aborted after the
    patience window; attempt 1 improves -> kept. The returned histories
    are the kept attempt's and reinit_fn was consulted exactly once."""
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import product_init

    mps, tr, va, x_cal = _tiny_setup()
    scripted = iter([0.5, 0.5, 0.5,          # attempt 0: stall at epoch 2
                     0.6, 0.9, 0.93, 0.94])  # attempt 1: improving, full run
    monkeypatch.setattr(
        trainer_mod, "evaluate_accuracy", lambda m, l: next(scripted)
    )
    reinit_calls = []

    def reinit(attempt):
        reinit_calls.append(attempt)
        return product_init(
            jax.random.PRNGKey(100 + attempt), N=16, M=4, L=2,
            act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
            calibration_x=x_cal,
        )

    out, val_acc, var_hist = train_model(
        mps, tr, va, lr=0.05, n_epochs=4, L2_flag=False,
        split_mode="canonical", svd_method="cholqr", verbose=False,
        restarts=1, reinit_fn=reinit,
    )
    assert reinit_calls == [1]
    assert val_acc == [0.6, 0.9, 0.93, 0.94]  # the kept (second) attempt
    assert len(var_hist) == 4
    assert np.all(np.isfinite(np.asarray(out.sites)))


def test_good_run_never_restarts(monkeypatch):
    mps, tr, va, _ = _tiny_setup()
    scripted = iter([0.7, 0.96, 0.96, 0.96])
    monkeypatch.setattr(
        trainer_mod, "evaluate_accuracy", lambda m, l: next(scripted)
    )

    def reinit(attempt):  # pragma: no cover - must not be called
        raise AssertionError("restart triggered on a healthy run")

    _, val_acc, _ = train_model(
        mps, tr, va, lr=0.05, n_epochs=4, L2_flag=False,
        split_mode="canonical", svd_method="cholqr", verbose=False,
        restarts=2, reinit_fn=reinit,
    )
    assert val_acc == [0.7, 0.96, 0.96, 0.96]


def test_all_attempts_stalled_returns_best_final_val(monkeypatch):
    """Every attempt stalls; the best FINAL val acc wins. The last attempt
    runs to completion (no abort budget left)."""
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import product_init

    mps, tr, va, x_cal = _tiny_setup()
    # attempt 0 stalls at 0.55 (abort after epoch 2); attempt 1 is the
    # last attempt -> runs all 4 epochs even though flat at 0.4
    scripted = iter([0.55, 0.55, 0.55,
                     0.4, 0.4, 0.4, 0.4])
    monkeypatch.setattr(
        trainer_mod, "evaluate_accuracy", lambda m, l: next(scripted)
    )
    reinit = lambda attempt: product_init(
        jax.random.PRNGKey(100 + attempt), N=16, M=4, L=2,
        act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
        calibration_x=x_cal,
    )
    _, val_acc, _ = train_model(
        mps, tr, va, lr=0.05, n_epochs=4, L2_flag=False,
        split_mode="canonical", svd_method="cholqr", verbose=False,
        restarts=1, reinit_fn=reinit,
    )
    assert val_acc == [0.55, 0.55, 0.55]  # best final (0.55 > 0.4)
