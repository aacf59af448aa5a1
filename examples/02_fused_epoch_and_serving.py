"""Whole-epoch fused training (one device program per epoch) + serving.

Run: python examples/02_fused_epoch_and_serving.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.models.mps import product_init
from tensornetworkforml_tpu.models.serving import Predictor
from tensornetworkforml_tpu.train.epoch import fused_epoch
from tensornetworkforml_tpu.train.sweep import SweepConfig

N_SAMPLES, DIM, BATCH = 4096, 6, 256
data, labels = create_dataset(N_SAMPLES, DIM, sigma=0.6, seed=0)
nb = N_SAMPLES // BATCH
x = data.reshape(N_SAMPLES, -1).astype(np.float32).reshape(nb, BATCH, DIM * DIM)
y = labels.astype(np.int32).reshape(nb, BATCH)

mps = product_init(
    jax.random.PRNGKey(0), N=DIM * DIM, M=8, L=2,
    act_fn="linear", loss_fn="MSE", calibration_x=x[0],
)
cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                  split_mode="canonical")
for epoch in range(3):
    mps, accs, _ = fused_epoch(mps, x, y, lr=0.05, weight_dec=1e-5, cfg=cfg)
    print(f"epoch {epoch}: batch accuracies {np.asarray(accs).round(3)}")

pred = Predictor(mps, batch_size=BATCH)
pred.warmup()
test_x, test_y = create_dataset(1000, DIM, sigma=0.6, seed=7)
acc = (pred.predict(test_x.reshape(1000, -1)) == test_y).mean()
print("test accuracy:", acc)
