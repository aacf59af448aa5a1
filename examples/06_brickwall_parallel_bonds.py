"""Brick-wall parallel-bond training: the TPU-first answer to DMRG's
sequential sweep (train/brickwall.py).

A sweep-equivalent update of every bond runs as TWO batched layers (even
pairs, then odd pairs) instead of N-1 dependent steps: merges, gradients,
clips, and truncated splits for all K = N/2 pairs execute as batched
matmul/Cholesky problems on the MXU (ops/svd.py::batched_cholqr_split).
The measured stability law: the K simultaneous clipped lr-relative pair
updates are block-Jacobi (no Gauss-Seidel self-correction), so keep
lr*K <~ 0.25 -- lr ~ 0.5/N (at N=196: lr=0.002 holds val/test 1.0 on the
pooled 10-class task on TPU; lr=0.01 diverges).

Run: python examples/06_brickwall_parallel_bonds.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.data.mnist import max_pool_2x2, synthetic_mnist
from tensornetworkforml_tpu.models.boundary import (
    boundary_forward,
    boundary_product_init,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.brickwall import train_brickwall

tr_x, tr_y, te_x, te_y = synthetic_mnist()
data = max_pool_2x2(np.concatenate([tr_x, te_x]) / 255.0)
labels = np.concatenate([tr_y, te_y])
train_perc = len(tr_x) / len(data)

train_loader, val_loader, test_loader = prepare_dataset(
    data, labels, train_perc, 0.1, train_batch_size=128,
    val_batch_size=256, test_batch_size=256, embed=False, seed=0,
    even_train_batches=True,
)

N = data[0].size
x_cal, _ = next(train_loader.batches())
model = boundary_product_init(
    jax.random.PRNGKey(0), N=N, M=16, L=10, act_fn="linear", loss_fn="MSE",
    dtype=jnp.float32, calibration_x=x_cal[:256],
)

# lr*K <~ 0.25: N=196 -> K=98 pairs -> lr ~ 0.5/N
model, val_acc = train_brickwall(
    model, train_loader, val_loader, lr=min(0.02, 0.5 / N), n_epochs=2,
    weight_dec=1e-5, verbose=True,
)

accs = []
for x_t, y_t in test_loader.batches():
    scores = boundary_forward(model, psi_embed(jnp.asarray(x_t, jnp.float32)))
    accs.append(float(jnp.mean(jnp.argmax(scores, 0) == jnp.asarray(y_t))))
print(f"test accuracy: {float(np.mean(accs)):.4f}")
assert val_acc[-1] > 0.9
