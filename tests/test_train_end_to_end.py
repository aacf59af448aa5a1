"""End-to-end training gates (the reference's de-facto integration test).

The noisy-diagonals task with the reference's published configuration must
reach ~99% validation accuracy within a few epochs
(``results/diag_accuracy.png``; SURVEY.md section 6). Also exercises the
Network facade, checkpoint round-trip, and the reference-rank training mode.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.mps import mps_init
from tensornetworkforml_tpu.models.network import Network
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.trainer import evaluate_accuracy, train_model
from tensornetworkforml_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _diag_loaders(n=2400, dim=8, sigma=0.7, batch=1920, seed=0):
    data, labels = create_dataset(n, dim, sigma, seed=seed)
    return prepare_dataset(
        data, labels, 1.0, 0.2, batch, 64, 64, embed=False, seed=seed + 1
    )


def test_diagonals_reaches_99_percent():
    tr, va, te = _diag_loaders()
    x_cal, _ = next(tr.batches())
    phi_cal = psi_embed(jnp.asarray(x_cal[:16], dtype=jnp.float64))
    mps = mps_init(
        jax.random.PRNGKey(0),
        N=64,
        M=10,
        L=2,
        normalize=True,
        calibration_phi=phi_cal,
        act_fn="softmax",
        loss_fn="full_cross_ent",
        dtype=jnp.float64,
    )
    mps, val_acc, var_hist = train_model(
        mps, tr, va, lr=0.01, n_epochs=4, weight_dec=1.0, verbose=False
    )
    assert max(val_acc) >= 0.99, f"val accuracy too low: {val_acc}"
    # var_hist has the reference layout (n_epochs, 2, batches*(N-1))
    assert var_hist.shape[0] == 4 and var_hist.shape[1] == 2
    assert var_hist.shape[2] == len(tr) * (mps.N - 1)

    # checkpoint round-trip preserves behaviour exactly
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "model.npz")
        save_checkpoint(mps, path)
        mps2 = load_checkpoint(path)
        from tensornetworkforml_tpu.models.mps import mps_forward

        x_fix, _ = next(va.batches())
        phi_fix = psi_embed(jnp.asarray(x_fix, dtype=jnp.float64))
        np.testing.assert_array_equal(
            np.asarray(mps_forward(mps, phi_fix)),
            np.asarray(mps_forward(mps2, phi_fix)),
        )
        assert mps2.l_pos == mps.l_pos
        assert mps2.act_fn == mps.act_fn and mps2.T == mps.T


def test_network_facade_train():
    """The reference-compatible class API end-to-end (small/fast config)."""
    data, labels = create_dataset(800, 5, 0.5, seed=3)
    tr, va, te = prepare_dataset(
        data, labels, 1.0, 0.2, 320, 64, 64, embed=True, seed=4
    )
    x_cal = np.stack([pair[0] for pair in next(iter(tr))][:16])
    net = Network(
        N=25,
        M=5,
        L=2,
        normalize=True,
        calibration_X=x_cal,
        act_fn="softmax",
        loss_fn="full_cross_ent",
        dtype=jnp.float64,
        seed=0,
    )
    val_acc, var_hist = net.train(tr, va, lr=0.02, n_epochs=3, weight_dec=1.0,
                                  verbose=False)
    assert max(val_acc) >= 0.95, f"val accuracy too low: {val_acc}"

    # facade inference surface
    x, y = next(va.batches())
    f = net.forward(x)
    assert list(f.axes_names) == ["l", "b"]
    acc = net.accuracy(x, y, f)
    assert acc >= 0.9
    f_act = net.apply_act_func(f)
    s = np.asarray(f_act.elem).sum(axis=0)
    np.testing.assert_allclose(s, 1.0, rtol=1e-8)  # softmax normalised


def test_training_with_reference_rank_mode_learns():
    """The bit-parity mode (collapsing bonds) still learns the easy task."""
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

    tr, va, te = _diag_loaders(n=1200, dim=5, sigma=0.5, batch=960, seed=7)
    x_cal, _ = next(tr.batches())
    phi_cal = psi_embed(jnp.asarray(x_cal[:16], dtype=jnp.float64))
    mps = mps_init(
        jax.random.PRNGKey(1),
        N=25,
        M=8,
        L=2,
        normalize=True,
        calibration_phi=phi_cal,
        act_fn="softmax",
        loss_fn="full_cross_ent",
        dtype=jnp.float64,
    )
    cfg = SweepConfig(
        act_fn="softmax", loss_fn="full_cross_ent", rank_mode="reference"
    )
    profile = None
    for epoch in range(3):
        for x, y in tr.batches():
            phi = psi_embed(jnp.asarray(x, dtype=jnp.float64))
            y_onehot = jnp.zeros((2, len(y)), dtype=jnp.float64)
            y_onehot = y_onehot.at[jnp.asarray(y), jnp.arange(len(y))].set(1.0)
            mps, _, _, metrics = sweep_once(
                mps, phi, y_onehot, 0.02, 1.0, cfg, bond_profile=profile
            )
            profile = metrics["bond_profile"]
    acc = evaluate_accuracy(mps, va)
    assert acc >= 0.95, f"val accuracy too low: {acc}"


def test_train_with_plain_weight_decay():
    """L2_flag=False path (plain decay) trains without error."""
    tr, va, te = _diag_loaders(n=600, dim=5, sigma=0.5, batch=480, seed=9)
    x_cal, _ = next(tr.batches())
    phi_cal = psi_embed(jnp.asarray(x_cal[:16], dtype=jnp.float64))
    mps = mps_init(
        jax.random.PRNGKey(2),
        N=25,
        M=6,
        L=2,
        normalize=True,
        calibration_phi=phi_cal,
        act_fn="softmax",
        loss_fn="full_cross_ent",
        dtype=jnp.float64,
    )
    mps, val_acc, _ = train_model(
        mps, tr, va, lr=0.02, n_epochs=2, weight_dec=1e-4, L2_flag=False,
        verbose=False,
    )
    assert max(val_acc) >= 0.9, f"val accuracy too low: {val_acc}"


def test_fused_epoch_matches_sequential_sweeps():
    """The whole-epoch fused scan must equal per-batch sweep_once calls."""
    from tensornetworkforml_tpu.train.epoch import fused_epoch
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

    data, labels = create_dataset(256, 5, 0.5, seed=12)
    nb, B = 4, 64
    x = data.reshape(256, -1).astype(np.float64).reshape(nb, B, 25)
    y = labels.astype(np.int32).reshape(nb, B)
    mps = mps_init(
        jax.random.PRNGKey(4), N=25, M=6, L=2, normalize=True,
        calibration_phi=psi_embed(jnp.asarray(x[0][:16])),
        act_fn="softmax", loss_fn="full_cross_ent", dtype=jnp.float64,
    )
    cfg = SweepConfig(act_fn="softmax", loss_fn="full_cross_ent")

    ref = mps
    ref_accs = []
    for i in range(nb):
        phi = psi_embed(jnp.asarray(x[i]))
        y1h = jax.nn.one_hot(jnp.asarray(y[i]), 2, dtype=jnp.float64).T
        ref, f0, _, _ = sweep_once(ref, phi, y1h, 0.02, 1.0, cfg)
        ref_accs.append(
            float(jnp.mean((jnp.argmax(f0, axis=0) == jnp.asarray(y[i]))))
        )

    fused, accs, stepm = fused_epoch(mps, x, y, 0.02, 1.0, cfg)
    np.testing.assert_allclose(np.asarray(accs), ref_accs, atol=1e-12)
    assert stepm["MAE"].shape == (nb, 24)
    assert stepm["accuracy"].shape == (nb, 24)
    phi_probe = psi_embed(jnp.asarray(x[0][:8]))
    from tensornetworkforml_tpu.models.mps import mps_forward

    np.testing.assert_allclose(
        np.asarray(mps_forward(fused, phi_probe)),
        np.asarray(mps_forward(ref, phi_probe)),
        rtol=1e-8, atol=1e-10,
    )


def test_network_train_debug_var_hist():
    """Facade debug mode returns the reference's 7-series var_hist layout."""
    data, labels = create_dataset(400, 5, 0.5, seed=21)
    tr, va, _ = prepare_dataset(
        data, labels, 1.0, 0.2, 160, 64, 64, embed=False, seed=22
    )
    x_cal, _ = next(tr.batches())
    net = Network(
        N=25, M=4, L=2, normalize=True,
        calibration_X=np.stack(
            [np.sin(np.pi * x_cal[:16] / 2), np.cos(np.pi * x_cal[:16] / 2)],
            axis=-1,
        ),
        act_fn="softmax", loss_fn="full_cross_ent", dtype=jnp.float64,
        seed=0,
    )
    val_acc, var_hist = net.train(
        tr, va, lr=0.02, n_epochs=2, weight_dec=0.5, debug=True,
        verbose=False,
    )
    assert var_hist.shape == (2, 7, len(tr) * 24)
    assert np.isfinite(var_hist).all()
    # the debug series ordering: accuracy is slot 2, MAE slot 4 (ref
    # Network_class.py:741-747); both must be within [0, 1]-ish ranges
    assert var_hist[:, 2].min() >= 0.0 and var_hist[:, 2].max() <= 1.0
    assert var_hist[:, 4].min() >= 0.0


def test_fused_and_loop_trainer_paths_agree():
    """train_model(fused=True) and (fused=False) produce identical models
    and var_hist on uniform raw-pixel loaders."""
    data, labels = create_dataset(512, 5, 0.5, seed=31)
    mk = lambda: prepare_dataset(
        data, labels, 1.0, 0.2, 128, 64, 64, embed=False, seed=32
    )
    from tensornetworkforml_tpu.models.mps import mps_forward, product_init

    results = []
    for fused in (True, False):
        tr, va, _ = mk()
        x_cal, _ = next(tr.batches())
        mps = product_init(
            jax.random.PRNGKey(5), N=25, M=5, L=2, act_fn="linear",
            loss_fn="MSE", dtype=jnp.float64, calibration_x=x_cal[:64],
        )
        mps, val_acc, var_hist = train_model(
            mps, tr, va, lr=0.05, n_epochs=2, weight_dec=1e-5,
            L2_flag=False, split_mode="canonical", fused=fused,
            verbose=False,
        )
        results.append((mps, val_acc, var_hist))

    (m1, v1, h1), (m2, v2, h2) = results
    assert h1.shape == h2.shape
    np.testing.assert_allclose(h1, h2, rtol=1e-9, atol=1e-11)
    phi = psi_embed(jnp.asarray(data[:16].reshape(16, -1)))
    np.testing.assert_allclose(
        np.asarray(mps_forward(m1, phi)), np.asarray(mps_forward(m2, phi)),
        rtol=1e-8, atol=1e-10,
    )
