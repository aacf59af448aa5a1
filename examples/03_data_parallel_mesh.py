"""Data-parallel training over a device mesh (run with several devices,
e.g. XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).

Run: python examples/03_data_parallel_mesh.py
"""

import jax
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.models.mps import product_init
from tensornetworkforml_tpu.parallel.dp import ShardedTrainer
from tensornetworkforml_tpu.parallel.mesh import make_mesh

mesh = make_mesh()  # all devices on the 'data' axis
print("mesh:", mesh)

data, labels = create_dataset(4096, 6, sigma=0.6, seed=0)
x = data.reshape(4096, -1).astype(np.float32)
mps = product_init(jax.random.PRNGKey(0), N=36, M=8, L=2,
                   act_fn="linear", loss_fn="MSE", calibration_x=x[:256])

trainer = ShardedTrainer(mesh, mps, lr=0.05, weight_dec=1e-5, L2_flag=False)
for step in range(8):
    lo = (step * 512) % 4096
    acc = trainer.step(x[lo : lo + 512], labels[lo : lo + 512])
    print(f"step {step}: pre-sweep accuracy {acc:.3f}")
