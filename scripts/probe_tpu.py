"""Tiny TPU reachability probe (CLAUDE.md discipline: probe with a
short-timeout op before any long TPU run; the tunnel can drop and then
backend init hangs 10+ minutes). Usage:

    timeout 90 python scripts/probe_tpu.py
"""
import jax, jax.numpy as jnp, numpy as np, time
t0 = time.time()
x = jnp.ones((8, 8))
v = float(np.asarray(x @ x)[0, 0])
print("TPU OK", jax.devices(), v, f"{time.time()-t0:.1f}s")
