"""Bond-adaptive training: grow M mid-training (ROADMAP item 7).

The reference's bonds only ever shrink (``Network_class.py:894-910``);
growing M during training is how the large-m Stoudenmire-Schwab
configuration is approached without paying max-M sweep cost from epoch 0.
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.mps import (
    grow_bond,
    mps_forward,
    product_init,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.trainer import evaluate_accuracy, train_model


def test_grow_bond_preserves_function_exactly():
    rng = np.random.default_rng(0)
    x = rng.random((16, 12))
    mps = product_init(jax.random.PRNGKey(0), N=12, M=4, L=3,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
                       calibration_x=x)
    phi = psi_embed(jnp.asarray(x))
    f_before = np.asarray(mps_forward(mps, phi))
    grown = grow_bond(mps, 10)
    assert grown.M == 10 and grown.sites.shape == (12, 10, 2, 10)
    f_after = np.asarray(mps_forward(grown, phi))
    # mathematically exact (padded slots contribute 0); numerically the
    # padded contraction rounds differently by ~1 ulp
    np.testing.assert_allclose(f_before, f_after, rtol=1e-13, atol=0)
    # padded slots are exactly zero
    assert np.all(np.asarray(grown.sites)[:, 4:, :, :] == 0)
    assert np.all(np.asarray(grown.sites)[:, :, :, 4:] == 0)


def test_grow_bond_rejects_shrink():
    import pytest

    mps = product_init(jax.random.PRNGKey(0), N=6, M=6, L=2,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float64)
    with pytest.raises(ValueError, match="shrink"):
        grow_bond(mps, 4)
    assert grow_bond(mps, 6) is mps  # no-op


def test_training_doubles_m_twice_with_continuity():
    """Train with M 4 -> 8 -> 16 (two doublings); accuracy must be
    continuous across the re-jit boundaries (growth preserves the
    function, so the epoch after a growth starts from the same model) and
    the grown run must reach the quality the task demands."""
    data, labels = create_dataset(600, 6, sigma=0.55, seed=0)
    train_loader, val_loader, _ = prepare_dataset(
        data, labels, 0.8, 0.2, train_batch_size=32, val_batch_size=64,
        test_batch_size=64, embed=False, seed=0, even_train_batches=True,
    )
    x_cal, _ = next(train_loader.batches())
    mps = product_init(jax.random.PRNGKey(0), N=36, M=4, L=2,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
                       calibration_x=x_cal)

    vals_at_growth = {}

    def cb(epoch, m, val):
        vals_at_growth[epoch] = (m.M, val)

    mps, val_acc, _ = train_model(
        mps, train_loader, val_loader, lr=0.1, n_epochs=6,
        weight_dec=1e-5, L2_flag=False, split_mode="canonical",
        bond_schedule={2: 8, 4: 16}, verbose=False, epoch_callback=cb,
    )
    # two doublings happened
    assert mps.M == 16
    assert vals_at_growth[1][0] == 4
    assert vals_at_growth[2][0] == 8
    assert vals_at_growth[4][0] == 16
    # continuity: growth must not crater the validation accuracy
    assert val_acc[2] >= val_acc[1] - 0.05
    assert val_acc[4] >= val_acc[3] - 0.05
    assert val_acc[-1] >= 0.95
