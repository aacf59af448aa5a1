"""Autodiff trainer + ring-topology tests, and checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.mps import mps_forward, product_init
from tensornetworkforml_tpu.models.ring import (
    ring_forward,
    ring_product_init,
    ring_trainer,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.autodiff import AutodiffConfig, AutodiffTrainer

RNG = np.random.default_rng(41)


def _diag(n=1200, dim=5, sigma=0.5, batch=128, seed=0):
    data, labels = create_dataset(n, dim, sigma, seed=seed)
    return prepare_dataset(
        data, labels, 1.0, 0.2, batch, 64, 64, embed=False, seed=seed + 1
    )


def test_autodiff_trainer_learns_diagonals():
    tr, va, te = _diag()
    x_cal, _ = next(tr.batches())
    mps = product_init(
        jax.random.PRNGKey(0), N=25, M=6, L=2, act_fn="softmax",
        loss_fn="cross_entropy", dtype=jnp.float32,
        calibration_x=x_cal[:64],
    )
    trainer = AutodiffTrainer(
        mps, AutodiffConfig(loss="softmax_xent", learning_rate=3e-3)
    )
    hist = trainer.fit(tr, n_epochs=8)
    assert hist[-1]["accuracy"] >= 0.97, hist

    from tensornetworkforml_tpu.train.trainer import evaluate_accuracy

    assert evaluate_accuracy(trainer.mps, va) >= 0.95


def test_ring_forward_is_cyclic():
    """The traced ring must be invariant under cyclic relabeling of sites."""
    N, M, L, B = 7, 4, 3, 5
    mps = ring_product_init(jax.random.PRNGKey(1), N=N, M=M, L=L,
                            dtype=jnp.float64, noise=0.2)
    x = RNG.random((B, N))
    phi = psi_embed(jnp.asarray(x))
    f = np.asarray(ring_forward(mps, phi))
    assert f.shape == (L, B)
    assert np.isfinite(f).all()

    # the trace is invariant under a cyclic rotation of the WHOLE ring
    # (sites, inputs, and the label position rotate together)
    k = 3
    sites_rot = np.roll(np.asarray(mps.sites), k, axis=0)
    x_rot = np.roll(x, k, axis=1)
    mps_rot = mps.replace(sites=jnp.asarray(sites_rot), l_pos=k)
    f_rot = np.asarray(ring_forward(mps_rot, psi_embed(jnp.asarray(x_rot))))
    np.testing.assert_allclose(f_rot, f, rtol=1e-9, atol=1e-11)


def test_ring_trainer_learns_diagonals():
    tr, va, te = _diag(seed=5)
    x_cal, _ = next(tr.batches())
    mps = ring_product_init(
        jax.random.PRNGKey(2), N=25, M=6, L=2, act_fn="softmax",
        loss_fn="cross_entropy", dtype=jnp.float32,
        calibration_x=x_cal[:64],
    )
    trainer = ring_trainer(
        mps, AutodiffConfig(loss="softmax_xent", learning_rate=3e-3)
    )
    hist = trainer.fit(tr, n_epochs=8)
    assert hist[-1]["accuracy"] >= 0.95, hist


def test_checkpoint_resume_mid_training(tmp_path):
    from tensornetworkforml_tpu.train.trainer import train_model

    tr, va, te = _diag(n=800, batch=320, seed=9)
    x_cal, _ = next(tr.batches())
    mps0 = product_init(
        jax.random.PRNGKey(3), N=25, M=5, L=2, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x_cal[:64],
    )
    ckpt = str(tmp_path / "train_state.npz")

    # run 2 epochs with checkpointing
    mps_a, val_a, _ = train_model(
        mps0, tr, va, lr=0.1, n_epochs=2, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", verbose=False, checkpoint_path=ckpt,
    )
    assert os.path.exists(ckpt)

    # resume: asking for 2 epochs again is a no-op (already done)
    mps_b, val_b, _ = train_model(
        mps0, tr, va, lr=0.1, n_epochs=2, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", verbose=False, checkpoint_path=ckpt,
        resume=True,
    )
    assert val_b == []  # no epochs left to run
    phi = psi_embed(jnp.asarray(next(va.batches())[0]))
    np.testing.assert_array_equal(
        np.asarray(mps_forward(mps_a, phi)), np.asarray(mps_forward(mps_b, phi))
    )

    # resume and extend to 3 epochs: runs exactly one more
    mps_c, val_c, _ = train_model(
        mps0, tr, va, lr=0.1, n_epochs=3, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", verbose=False, checkpoint_path=ckpt,
        resume=True,
    )
    assert len(val_c) == 1


def test_lr_schedule_callable():
    from tensornetworkforml_tpu.train.trainer import train_model

    tr, va, te = _diag(n=600, batch=240, seed=11)
    x_cal, _ = next(tr.batches())
    mps = product_init(
        jax.random.PRNGKey(4), N=25, M=5, L=2, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x_cal[:64],
    )
    seen = []

    def sched(epoch):
        seen.append(epoch)
        return 0.1 * (0.5**epoch)

    mps, val_acc, _ = train_model(
        mps, tr, va, lr=sched, n_epochs=3, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", verbose=False,
    )
    assert seen == [0, 1, 2]
    assert max(val_acc) >= 0.9


def test_boundary_autodiff_finetunes():
    """The optax trainer optimises the boundary-label family (finetuning
    stage for one-site / brick-wall models)."""
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.train.autodiff import (
        AutodiffConfig,
        BoundaryAutodiffTrainer,
    )

    data, labels = create_dataset(256, 4, 0.5, seed=5)
    x = data.reshape(256, -1)
    model = boundary_product_init(
        jax.random.PRNGKey(0), N=16, M=6, L=2, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x[:128],
    )
    trainer = BoundaryAutodiffTrainer(
        model, AutodiffConfig(loss="softmax_xent", learning_rate=3e-2)
    )
    first_loss, _ = trainer.step(x[:128], labels[:128])
    for _ in range(60):
        loss, acc = trainer.step(x[:128], labels[:128])
    assert loss < first_loss
    assert acc >= 0.95, acc
    assert trainer.model.sites.shape == model.sites.shape
