"""Minimal functional-API training on the noisy-diagonals task.

Run: python examples/01_train_diagonals_functional.py
(set TNML_SMOKE=1 for the CI-sized run -- same code path, smaller data)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.mps import mps_init
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.trainer import train_model

SMOKE = bool(os.environ.get("TNML_SMOKE"))
n_samples = 320 if SMOKE else 4000
batch = 128 if SMOKE else 3200
n_epochs = 2 if SMOKE else 5

data, labels = create_dataset(n_samples, linear_dim=8, sigma=0.7, seed=0)
train_loader, val_loader, _ = prepare_dataset(
    data, labels, 1.0, 0.2, batch, 128, 128, embed=False, seed=1
)

x_cal, _ = next(train_loader.batches())
mps = mps_init(
    jax.random.PRNGKey(0),
    N=64, M=10, L=2,
    normalize=True,
    calibration_phi=psi_embed(jnp.asarray(x_cal[:16], dtype=jnp.float32)),
    act_fn="softmax", loss_fn="full_cross_ent",
)

mps, val_acc, var_hist = train_model(
    mps, train_loader, val_loader, lr=0.01, n_epochs=n_epochs, weight_dec=1.0
)
print("validation accuracy per epoch:", [round(v, 4) for v in val_acc])
