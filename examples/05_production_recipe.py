"""The production training recipe (round 2): rangefinder split +
half-batch warmup + bond growth, on the pooled 10-class task.

Every ingredient is measured (BENCH_NOTES.md / docs/TRAINING_GUIDE.md):
  * svd_method="rangefinder": the TPU-fast subspace split (2.9x faster
    sweeps at M=32; auto-dispatches to the fused Pallas kernel for
    M*D >= 128 on a single TPU chip);
  * warmup_epochs=1: one half-batch epoch escapes the init-dependent
    attractors that large clean batches settle into (B=256 five-seed
    spread 0.20 -> 0.008);
  * bond_schedule: start small, grow M mid-training -- grow-16->32
    reaches val 1.0 in 8 s where fixed M=32 sits at 0.92 in 22 s.

Run: python examples/05_production_recipe.py
"""

import jax
import numpy as np

from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.data.mnist import max_pool_2x2, synthetic_mnist
from tensornetworkforml_tpu.models.mps import product_init
from tensornetworkforml_tpu.train.trainer import evaluate_accuracy, train_model

tr_x, tr_y, te_x, te_y = synthetic_mnist()
data = max_pool_2x2(np.concatenate([tr_x, te_x]) / 255.0)
labels = np.concatenate([tr_y, te_y])
train_perc = len(tr_x) / len(data)

train_loader, val_loader, test_loader = prepare_dataset(
    data, labels, train_perc, 0.1, train_batch_size=256,
    val_batch_size=256, test_batch_size=256, embed=False, seed=0,
    even_train_batches=True,   # keep every epoch on the fused path
)
x_cal, _ = next(train_loader.batches())

mps = product_init(jax.random.PRNGKey(0), N=data[0].size, M=16, L=10,
                   act_fn="linear", loss_fn="MSE",
                   calibration_x=x_cal[:256])

mps, val_acc, _ = train_model(
    mps, train_loader, val_loader,
    lr=0.2, n_epochs=4, weight_dec=1e-5,
    L2_flag=False, split_mode="canonical",
    svd_method="rangefinder",
    warmup_epochs=1,            # half-batch first epoch
    bond_schedule={2: 32},      # grow M 16 -> 32 at epoch 2
    verbose=True,
)
print("val per epoch:", [f"{v:.4f}" for v in val_acc])
print(f"test accuracy: {evaluate_accuracy(mps, test_loader):.4f}  "
      f"(final M = {mps.M})")
