"""Minimal functional-API training on the noisy-diagonals task.

Run: python examples/01_train_diagonals_functional.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.mps import mps_init
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.trainer import train_model

data, labels = create_dataset(4000, linear_dim=8, sigma=0.7, seed=0)
train_loader, val_loader, _ = prepare_dataset(
    data, labels, 1.0, 0.2, 3200, 128, 128, embed=False, seed=1
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
    mps, train_loader, val_loader, lr=0.01, n_epochs=5, weight_dec=1.0
)
print("validation accuracy per epoch:", [round(v, 4) for v in val_acc])
