import jax, jax.numpy as jnp
import numpy as np
x = jnp.ones((8, 8))
print("backend:", jax.default_backend())
print("result:", float(jnp.sum(x @ x)))
